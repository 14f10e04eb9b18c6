"""End-to-end serving load test: full TCP stack on live hardware.

bench_serving.py measures the DEVICE cost of the serving design; this tool
measures the SYSTEM: checkpoint restore -> run_server (warmup compile) ->
concurrent TCP clients -> per-request wall latency through the whole
MicroBatcher/transport stack.  Closed-loop load at several concurrency
levels, ragged request lengths (160-250 tokens, the 3.2-5 s shapes a real
queue carries).

Per level it reports throughput, latency percentiles, and the batcher's
occupancy counters.  Through the tunneled single-chip setup every device
batch pays the ~30 ms host->TPU dispatch round-trip, so absolute latency is
tunnel-dominated (locally attached chips pay sub-ms); the numbers to read
are throughput scaling and occupancy vs concurrency.

Usage: python tools/serve_loadtest.py [--smoke] > SERVE_LOAD_r03.json
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


def percentile(xs, q):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    i = min(len(xs) - 1, max(0, int(round(q / 100 * (len(xs) - 1)))))
    return xs[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-safe run")
    ap.add_argument("--levels", type=str, default="1,8,32",
                    help="closed-loop concurrency levels")
    ap.add_argument("--requests-per-client", type=int, default=12)
    ap.add_argument("--max-batch", type=int, default=8,
                    help="batcher max_batch (rows per device program); the "
                         "batch pads to exactly this row count, so raising "
                         "it costs one compile and amortizes the fixed "
                         "dispatch over more requests")
    ap.add_argument("--slo", type=float, default=None,
                    help="max_queue_delay_ms for the batcher: shed submits "
                         "whose predicted queueing delay exceeds this "
                         "(clients count the rejection and retry after a "
                         "short backoff)")
    args = ap.parse_args()
    if args.max_batch < 1:
        ap.error(f"--max-batch must be >= 1 (got {args.max_batch})")
    if args.smoke and args.max_batch != ap.get_default("max_batch"):
        print(f"warning: --smoke pins max_batch=4; ignoring "
              f"--max-batch {args.max_batch}", file=sys.stderr)

    import jax

    if args.smoke:
        # CPU plumbing check: must not touch (or contend for) the tunneled
        # single-client TPU; the env var alone is ignored once the axon
        # plugin registered, so force through jax.config (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent XLA compilation cache (works through the tunnel):
        # repeat runs skip the multi-minute warmup compiles.
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
    import numpy as np

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.serving import request_tts, run_server
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model

    if args.smoke:
        cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0,
                  out_dir=tempfile.mkdtemp(prefix="edt_load_"))
        buckets, max_batch, steps = (16,), 4, 2
        len_lo, len_hi = 8, 16
        levels = [1, 4]
        per_client = 4
    else:
        cfg = CFG(out_dir=tempfile.mkdtemp(prefix="edt_load_"))
        buckets, max_batch, steps = (256,), args.max_batch, 4
        len_lo, len_hi = 160, 250
        levels = [int(x) for x in args.levels.split(",")]
        per_client = args.requests_per_client

    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    ckpt = tempfile.mkdtemp(prefix="edt_load_ckpt_") + "/final"
    save_final_model(ckpt, {"decoder": params, "encoder": {"unused": 0}}, cfg)

    server, batcher = run_server(
        ckpt, port=0, steps=steps, buckets=buckets, max_batch=max_batch,
        max_wait_ms=5.0, max_queue_delay_ms=args.slo, verbose=False,
    )
    host, port = server.server_address
    meta = {
        "meta": "end-to-end serving load test (tools/serve_loadtest.py): "
                "TCP clients -> MicroBatcher -> device; closed-loop",
        "device": jax.devices()[0].device_kind,
        "steps": steps, "buckets": list(buckets), "max_batch": max_batch,
        "token_lens": [len_lo, len_hi],
        "max_queue_delay_ms": args.slo,
    }
    print(json.dumps(meta), flush=True)

    rng = np.random.default_rng(0)
    try:
        for level in levels:
            lat_ms: list = []
            lock = threading.Lock()
            errors: list = []
            shed = [0]

            def client(i):
                r = np.random.default_rng(1000 + i)
                mine = []
                try:
                    done = 0
                    while done < per_client:
                        n = int(r.integers(len_lo, len_hi + 1))
                        toks = r.integers(
                            0, cfg.effective_codebook_size(), n
                        ).tolist()
                        t0 = time.monotonic()
                        try:
                            mel = request_tts(toks, host=host, port=port,
                                              timeout=600.0)
                        except RuntimeError as e:
                            if "Overloaded" in str(e):
                                # SLO shed: clean rejection, client backs off
                                # and retries instead of joining the tail.
                                with lock:
                                    shed[0] += 1
                                time.sleep(0.05)
                                continue
                            raise
                        mine.append((time.monotonic() - t0) * 1e3)
                        assert mel.shape == (2 * n, cfg.n_mels)
                        done += 1
                except Exception as e:  # surface, don't hang the join
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")
                with lock:
                    lat_ms.extend(mine)

            batcher.reset_stats()
            # one untimed request to fault in any cold state at this level
            request_tts(rng.integers(0, 10, len_lo).tolist(),
                        host=host, port=port, timeout=600.0)
            batcher.reset_stats()

            t0 = time.monotonic()
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(level)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.monotonic() - t0
            if errors:
                print(json.dumps({"level": level, "errors": errors[:3]}),
                      flush=True)
                continue
            stats = batcher.stats()
            print(json.dumps({
                "metric": f"serve_load_c{level}",
                "requests": len(lat_ms),
                "throughput_req_s": round(len(lat_ms) / wall, 1),
                "latency_ms": {
                    "p50": round(percentile(lat_ms, 50), 1),
                    "p95": round(percentile(lat_ms, 95), 1),
                    "p99": round(percentile(lat_ms, 99), 1),
                },
                "mean_batch_occupancy": stats["mean_batch_occupancy"],
                "batches_run": stats["batches_run"],
                "mean_batch_ms": stats["mean_batch_ms"],
                "shed": shed[0],
                "queue_delay_ms": stats.get("queue_delay_ms"),
            }), flush=True)
    finally:
        server.shutdown()
        batcher.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
