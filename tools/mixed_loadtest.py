"""Mixed-workload serving load test -> SERVE_MIX_r05.json.

VERDICT r4 item 4: the r4 load story was single-bucket, single-workload.
This drives ONE device the way a real deployment runs it — three traffic
classes at once through the full TCP stack:

  1. short token requests across >= 3 length buckets (exercises per-bucket
     gather limits, bucket fairness, compile surface under mixed lengths);
  2. long-form streams via LongFormScheduler (request_longform), claiming
     the same device as the micro-batched token path;
  3. an overload burst against an SLO bound (max_queue_delay_ms) — sheds
     are counted and clients retry after backoff.

Reported per class: p50/p95/p99 latency, throughput, per-bucket batch/row
occupancy (MicroBatcher.stats()["per_bucket"]), scheduler occupancy, shed
counts, and a starvation check (every bucket's p99 within a bounded ratio
of the fastest bucket's).

Usage:  python tools/mixed_loadtest.py [--smoke] [--artifact SERVE_MIX_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pct(xs, q):
    if not xs:
        return float("nan")
    return float(np.percentile(np.asarray(xs, np.float64), q))


def lat_summary(xs):
    return {
        "n": len(xs),
        "p50": round(pct(xs, 50), 1),
        "p95": round(pct(xs, 95), 1),
        "p99": round(pct(xs, 99), 1),
        "max": round(max(xs), 1) if xs else float("nan"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-safe run")
    ap.add_argument("--artifact", default="SERVE_MIX_r05.json")
    ap.add_argument("--slo", type=float, default=400.0,
                    help="max_queue_delay_ms for the overload phase")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import HubertConfig
    from edge_diffusion_tts_tpu.serving import (
        Overloaded,
        request_longform,
        request_tts,
        run_server,
    )
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model
    from edge_diffusion_tts_tpu.training.train import init_models

    if args.smoke:
        cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=16,
                  segment_secs=0.5, use_fsq=True,
                  out_dir=tempfile.mkdtemp(prefix="edt_mix_"))
        buckets, max_batch, steps = (8, 16, 32), 4, 2
        short_clients, reqs_per_client = 3, 4
        lf_secs, lf_streams, lf_rounds = 0.9, 2, 1
        chunk_s, overlap_s = 0.4, 0.1
        burst_clients = 4
        len_rng = (4, 30)
    else:
        cfg = CFG(use_fsq=True, out_dir=tempfile.mkdtemp(prefix="edt_mix_"))
        buckets, max_batch, steps = (64, 128, 256), 8, 4
        short_clients, reqs_per_client = 6, 16
        lf_secs, lf_streams, lf_rounds = 8.0, 4, 2
        chunk_s, overlap_s = 2.0, 0.5
        burst_clients = 16
        len_rng = (40, 250)

    hc = HubertConfig.tiny320() if not args.smoke else HubertConfig.tiny()
    key = jax.random.PRNGKey(0)
    _, _, params, vq_state = init_models(cfg, key, hc)
    ckpt = tempfile.mkdtemp(prefix="edt_mix_ckpt_") + "/final"
    save_final_model(ckpt, params, cfg, vq_state=vq_state or None,
                     hubert_cfg=hc)

    server, batcher = run_server(
        ckpt, port=0, steps=steps, buckets=buckets, max_batch=max_batch,
        max_wait_ms=5.0, max_queue_delay_ms=None, verbose=False,
        warmup=not args.smoke, longform=True, longform_streams=lf_streams,
        chunk_seconds=chunk_s, overlap_seconds=overlap_s,
        # One prep bucket matching the stream length: bounded compiles.
        longform_prep_buckets=(lf_secs,),
    )
    host, port = server.server_address
    sched = server.longform_fn.scheduler
    if not args.smoke:
        sched.warmup(steps=steps, strength=0.6, cfg_scale=2.0)

    meta = {
        "meta": "mixed-workload serving load test (tools/mixed_loadtest.py):"
                " short token requests across 3 buckets + concurrent "
                "long-form streams + SLO-shed overload burst, one device",
        "device": jax.devices()[0].device_kind,
        "decoder": f"{cfg.hidden}H/{cfg.layers}L/{cfg.heads}h",
        "steps": steps, "buckets": list(buckets), "max_batch": max_batch,
        "short": {"clients": short_clients, "reqs": reqs_per_client,
                  "token_lens": list(len_rng)},
        "longform": {"streams": lf_streams, "seconds": lf_secs,
                     "rounds": lf_rounds, "chunk_s": chunk_s},
        "overload": {"clients": burst_clients, "slo_ms": args.slo},
    }
    print(json.dumps(meta), flush=True)

    t_wav = np.arange(int(lf_secs * cfg.sample_rate)) / cfg.sample_rate
    lock = threading.Lock()
    errors = []
    phase_no = [0]

    def run_phase(n_short, with_longform, record_bucket_of):
        """One traffic phase; returns (short_lats_by_bucket, lf_metrics)."""
        short_lats: dict = {b: [] for b in buckets}
        lf_ttfi, lf_done = [], []
        shed_retries = [0]
        phase_no[0] += 1

        def short_client(ci):
            # Per-client generator: a shared RandomState mutated from many
            # threads is scheduler-dependent, which would defeat --seed.
            rs = np.random.RandomState(
                args.seed + 1000 * phase_no[0] + ci
            )
            lens = rs.randint(len_rng[0], len_rng[1] + 1, reqs_per_client)
            for L in lens:
                tokens = list(rs.randint(
                    0, cfg.effective_codebook_size(), int(L)
                ))
                t0 = time.monotonic()
                while True:
                    try:
                        mel = request_tts(tokens, host=host, port=port)
                        break
                    except RuntimeError as e:
                        if "Overloaded" not in str(e) and not isinstance(
                            e, Overloaded
                        ):
                            raise
                        with lock:
                            shed_retries[0] += 1
                        time.sleep(0.05)
                dt = (time.monotonic() - t0) * 1e3
                b = record_bucket_of(len(tokens))
                with lock:
                    short_lats[b].append(dt)
                assert mel.shape[0] == 2 * len(tokens), mel.shape

        def lf_client(si):
            wav = (0.2 * np.sin(
                2 * np.pi * (180 + 30 * si) * t_wav
            )).astype(np.float32)
            for r in range(lf_rounds):
                t0 = time.monotonic()
                first = None
                for seg, _ in request_longform(
                    wav, host=host, port=port, steps=steps,
                    strength=0.6, cfg_scale=2.0, seed=si * 10 + r,
                ):
                    if first is None:
                        first = (time.monotonic() - t0) * 1e3
                with lock:
                    lf_ttfi.append(first)
                    lf_done.append((time.monotonic() - t0) * 1e3)

        def guard(fn, *a):
            try:
                fn(*a)
            except Exception as e:
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

        threads = [
            threading.Thread(target=guard, args=(short_client, i))
            for i in range(n_short)
        ]
        if with_longform:
            threads += [
                threading.Thread(target=guard, args=(lf_client, i))
                for i in range(lf_streams)
            ]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.monotonic() - t0
        return short_lats, lf_ttfi, lf_done, wall, shed_retries[0]

    from edge_diffusion_tts_tpu.serving import pick_bucket

    def bucket_of(n):
        return pick_bucket(n, buckets)

    report = {"meta": meta}

    # ---- phase A: steady mixed traffic (short x 3 buckets + long-form) ----
    batcher.reset_stats()
    s0 = (sched.batches_run, sched.chunks_run, sched.rows_padded)
    short_lats, lf_ttfi, lf_done, wall, _ = run_phase(
        short_clients, with_longform=True, record_bucket_of=bucket_of
    )
    bstats = batcher.stats()
    n_short_total = sum(len(v) for v in short_lats.values())
    per_bucket_lat = {
        str(b): lat_summary(v) for b, v in short_lats.items() if v
    }
    p99s = [v["p99"] for v in per_bucket_lat.values()]
    report["mixed_steady"] = {
        "wall_s": round(wall, 2),
        "short_requests": n_short_total,
        "short_throughput_req_s": round(n_short_total / wall, 1),
        "short_latency_ms_by_bucket": per_bucket_lat,
        "short_latency_ms_all": lat_summary(
            [x for v in short_lats.values() for x in v]
        ),
        "bucket_p99_spread": round(max(p99s) / max(min(p99s), 1e-9), 2),
        "per_bucket_batches": bstats["per_bucket"],
        "mean_batch_occupancy": bstats["mean_batch_occupancy"],
        "longform_ttfi_ms": lat_summary(lf_ttfi),
        "longform_done_ms": lat_summary(lf_done),
        "longform_chunks": sched.chunks_run - s0[1],
        "longform_row_occupancy": round(
            (sched.chunks_run - s0[1]) / max(sched.rows_padded - s0[2], 1), 3
        ),
        "queue_delay_ms": bstats.get("queue_delay_ms"),
    }
    print(json.dumps(report["mixed_steady"]), flush=True)

    # ---- phase B: overload burst with SLO shedding -------------------------
    batcher.max_queue_delay_ms = args.slo
    batcher.reset_stats()
    short_lats, _, _, wall, retries = run_phase(
        burst_clients, with_longform=True, record_bucket_of=bucket_of
    )
    bstats = batcher.stats()
    n_short_total = sum(len(v) for v in short_lats.values())
    report["overload_slo"] = {
        "wall_s": round(wall, 2),
        "slo_ms": args.slo,
        "short_requests_completed": n_short_total,
        "shed_count": bstats["shed_count"],
        "shed_retries": retries,
        "short_latency_ms_all": lat_summary(
            [x for v in short_lats.values() for x in v]
        ),
        "queue_delay_ms": bstats.get("queue_delay_ms"),
        "per_bucket_batches": bstats["per_bucket"],
    }
    print(json.dumps(report["overload_slo"]), flush=True)
    batcher.max_queue_delay_ms = None

    server.shutdown()
    batcher.close()

    if errors:
        print(json.dumps({"errors": errors[:5]}), flush=True)
        return 1

    # Starvation assertion: under steady mixed traffic every bucket got
    # service and no bucket's p99 ran away (>8x the fastest bucket's p99
    # would mean the gather/dispatch order starves a class).
    ok = (
        len(per_bucket_lat) == len(buckets)
        and report["mixed_steady"]["bucket_p99_spread"] <= 8.0
    )
    report["ok"] = bool(ok)
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.artifact}", flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
