"""Long-form serving load test: continuous batching on live hardware.

serve_loadtest.py covers the micro-batched token path; this tool measures
the OTHER serving mode — streaming long-form voice regeneration — through
the full TCP stack: checkpoint restore -> run_server(--longform) ->
concurrent request_longform clients -> LongFormScheduler's chunk-granular
continuous batching.

The comparison that matters: K concurrent streams with --longform-streams=K
(every scheduler tick refines one chunk from EVERY stream in one batched
program) vs --longform-streams=1 (streams round-robin one chunk per tick,
the device-lock behavior this replaced).  Through the tunneled single-chip
setup each device program pays the ~30 ms host->TPU dispatch round-trip, so
absolute numbers are tunnel-dominated; read the wall-clock RATIO and the
scheduler's row occupancy.

Round 5 adds the audio=True burst: waveform increments through
``pipe.stream_audio`` (per-increment Griffin-Lim in the caller's thread),
reporting time-to-first-AUDIO (ttfa_ms) against the mel TTFI.

Usage: python tools/longform_loadtest.py [--smoke] > SERVE_LF_r05.json
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
    args = ap.parse_args()

    import jax

    if args.smoke:
        # CPU plumbing check: must not touch the tunneled single-client TPU
        # (the env var alone is ignored once the axon plugin registered).
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
    from edge_diffusion_tts_tpu.models import HubertConfig
    from edge_diffusion_tts_tpu.serving import request_longform, run_server
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model
    from edge_diffusion_tts_tpu.training.train import init_models

    if args.smoke:
        cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=16,
                  segment_secs=0.5, use_fsq=True,
                  out_dir=tempfile.mkdtemp(prefix="edt_lf_"))
        steps, secs, streams = 2, 0.9, 2
        chunk_s, overlap_s = 0.4, 0.1
    else:
        # Flagship decoder (the shape every BENCH artifact measures), tiny
        # HuBERT: encode runs once per stream, refine dominates at steps=50.
        cfg = CFG(use_fsq=True, out_dir=tempfile.mkdtemp(prefix="edt_lf_"))
        steps, secs, streams = 50, 8.0, 4
        chunk_s, overlap_s = 2.0, 0.5

    # tiny320: cheap encode at the REAL 320-sample latent rate.  Plain
    # tiny() has total stride 20, which inflated every stream's prep fetch
    # 16x (3.3 MB of latents D2H through the ~25 MB/s tunnel, ~130 ms per
    # stream serializing at submit) AND sliced the wrong features —
    # SERVE_LF_r03's 616 ms TTFI was mostly this test artifact.
    hc = HubertConfig.tiny320()
    key = jax.random.PRNGKey(0)
    _, _, params, vq_state = init_models(cfg, key, hc)
    ckpt = tempfile.mkdtemp(prefix="edt_lf_ckpt_") + "/final"
    save_final_model(ckpt, params, cfg, vq_state=vq_state or None,
                     hubert_cfg=hc)

    meta = {
        "meta": "long-form serving load test (tools/longform_loadtest.py): "
                "TCP clients -> LongFormScheduler -> batched refine; "
                "K concurrent 8s streams, batched vs serialized ticks",
        "device": jax.devices()[0].device_kind,
        "decoder": f"{cfg.hidden}H/{cfg.layers}L/{cfg.heads}h",
        "steps": steps, "stream_seconds": secs, "streams": streams,
        "chunk_seconds": chunk_s, "overlap_seconds": overlap_s,
    }
    print(json.dumps(meta), flush=True)

    t = np.arange(int(secs * cfg.sample_rate)) / cfg.sample_rate

    def make_wav(seed):
        return (0.2 * np.sin(2 * np.pi * (200 + 40 * seed) * t)).astype(
            np.float32
        )

    results = {}
    for max_streams in (streams, 1):
        server, batcher = run_server(
            ckpt, port=0, steps=2, buckets=(8,), max_batch=2,
            max_wait_ms=5.0, verbose=False, warmup=False, longform=True,
            longform_streams=max_streams,
            chunk_seconds=chunk_s, overlap_seconds=overlap_s,
        )
        host, port = server.server_address
        sched = server.longform_fn.scheduler
        # Compile every reachable refine row count up front (what
        # run_server(warmup=True) does); the untimed burst below then warms
        # the per-length ChunkStream programs (encode/stats/key chain).
        sched.warmup(steps=steps, strength=0.6, cfg_scale=2.0)
        try:
            def burst(tag, record, audio=False):
                ttfi, done_ms, frames = [], [], []
                lock = threading.Lock()
                errors = []

                def client(i):
                    try:
                        t0 = time.monotonic()
                        first, total = None, 0
                        for seg, _ in request_longform(
                            make_wav(i), host=host, port=port, steps=steps,
                            strength=0.6, cfg_scale=2.0, seed=i, audio=audio,
                        ):
                            if first is None:
                                first = (time.monotonic() - t0) * 1e3
                            total += seg.shape[-1]  # frames (mel) / samples
                        with lock:
                            ttfi.append(first)
                            done_ms.append((time.monotonic() - t0) * 1e3)
                            frames.append(total)
                    except Exception as e:
                        with lock:
                            errors.append(f"{type(e).__name__}: {e}")

                s0 = (sched.batches_run, sched.chunks_run, sched.rows_padded,
                      sched.device_ms_total)
                t0 = time.monotonic()
                threads = [threading.Thread(target=client, args=(i,))
                           for i in range(streams)]
                for th in threads:
                    th.start()
                for th in threads:
                    th.join()
                wall = time.monotonic() - t0
                if errors:
                    print(json.dumps({"tag": tag, "errors": errors[:3]}),
                          flush=True)
                    return
                batches = sched.batches_run - s0[0]
                chunks = sched.chunks_run - s0[1]
                rows = sched.rows_padded - s0[2]
                if record:
                    first_key = "ttfa_ms" if audio else "ttfi_ms"
                    total_key = "samples_total" if audio else "mel_frames_total"
                    results[tag] = {
                        "metric": tag,
                        "streams": streams,
                        "wall_s": round(wall, 2),
                        first_key: {
                            "p50": round(percentile(ttfi, 50), 1),
                            "max": round(max(ttfi), 1),
                        },
                        "stream_done_ms": {
                            "p50": round(percentile(done_ms, 50), 1),
                            "max": round(max(done_ms), 1),
                        },
                        total_key: int(sum(frames)),
                        "batches_run": batches,
                        "chunks_run": chunks,
                        "row_occupancy": round(chunks / max(rows, 1), 3),
                        "mean_batch_ms": round(
                            (sched.device_ms_total - s0[3]) / max(batches, 1),
                            1,
                        ),
                    }
                    print(json.dumps(results[tag]), flush=True)

            tag = f"longform_c{streams}_sched{max_streams}"
            burst(tag + "_warmup", record=False)  # compile B=1..K programs
            burst(tag, record=True)
            if max_streams == streams:
                # audio=True: Griffin-Lim vocoding per increment (caller
                # thread, overlapping other streams' refine ticks) —
                # time-to-first-AUDIO is what a playback client waits for.
                atag = f"longform_c{streams}_audio"
                burst(atag + "_warmup", record=False, audio=True)
                burst(atag, record=True, audio=True)
        finally:
            server.shutdown()
            batcher.close()

    a = results.get(f"longform_c{streams}_sched{streams}")
    b = results.get(f"longform_c{streams}_sched1")
    if a and b:
        print(json.dumps({
            "metric": "longform_batching_speedup",
            "value": round(b["wall_s"] / a["wall_s"], 2),
            "unit": "x wall-clock, batched vs serialized ticks",
        }), flush=True)
    au = results.get(f"longform_c{streams}_audio")
    if a and au:
        print(json.dumps({
            "metric": "longform_ttfa_over_ttfi",
            "value": round(au["ttfa_ms"]["p50"] / a["ttfi_ms"]["p50"], 2),
            "unit": "x (first-audio p50 vs first-mel p50, target <= 1.5)",
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
