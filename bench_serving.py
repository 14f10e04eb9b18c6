"""Serving-path benchmark: masked variable-length batches vs single requests.

Measures the device cost of the serving design (serving.py):

  1. serve_b8_bucket256: one masked batch of 8 ragged requests (160-250
     tokens) padded to bucket 256 — per-request device latency + utt/s.
  2. mask_overhead: the SAME batch/bucket shape run through the unmasked
     program — isolates what the sem_mask/mel_mask plumbing costs.
  3. single_request: the unbatched masked program at the flagship 250-token
     shape — what a max_batch=1 server would pay per request.

Prints one JSON line per metric (artifact: SERVE_r03.json).  Device time via
the two-point amortization fit (utils/speed.py::fit_device_ms) with chained
carry-dependent iterations, same methodology as bench.py/bench_all.py.

Usage: python bench_serving.py [--smoke]   (--smoke: tiny shapes, CPU-safe)
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(smoke: bool = False):
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    if smoke:
        cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0,
                  out_dir="/tmp/edt_bench_serving")
        B, BUCKET, steps = 2, 16, 2
        lens = [12, 16]
        reps, runs = (2, 4), 2
    else:
        cfg = CFG()
        B, BUCKET, steps = 8, 256, 4
        # ragged 3.2-5.0 s requests, the shapes a real queue would carry
        lens = [160, 173, 189, 201, 215, 230, 244, 250]
        reps, runs = (5, 40), 4

    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    rng = np.random.default_rng(0)
    sem_idx = np.zeros((B, BUCKET), np.int32)
    sem_mask = np.zeros((B, BUCKET), bool)
    for i, n in enumerate(lens):
        sem_idx[i, :n] = rng.integers(0, cfg.effective_codebook_size(), n)
        sem_mask[i, :n] = True
    sem_idx = jnp.asarray(sem_idx)
    sem_mask_j = jnp.asarray(sem_mask)
    mel_mask_j = jnp.repeat(sem_mask_j, 2, axis=1)

    def batch_chain(masked: bool, b: int, bucket: int, idx, smask, mmask):
        def body(key, params):
            x_T = jax.random.normal(key, (b, bucket * 2, cfg.n_mels))

            def model_fn(x, t, si):
                kw = dict(sem_idx=idx, step_idx=si)
                if masked:
                    kw.update(sem_mask=smask, mel_mask=mmask)
                return decoder.apply({"params": params}, x, t, **kw)

            x0 = ddim_sample(schedule, model_fn, x_T, steps)
            return x0[0, 0, 0]

        return scan_chain_builder(body, (params,))

    def emit(r):
        print(json.dumps(r), flush=True)

    ms_masked = fit_device_ms(
        batch_chain(True, B, BUCKET, sem_idx, sem_mask_j, mel_mask_j),
        reps=reps, runs=runs,
    )["device_ms"]
    emit({
        "metric": f"serve_b{B}_bucket{BUCKET}_masked",
        "value": round(ms_masked, 3), "unit": "ms/batch",
        "per_request_ms": round(ms_masked / B, 3),
        "utt_per_s": round(1e3 * B / ms_masked, 1),
        "num_steps": steps,
    })

    ms_unmasked = fit_device_ms(
        batch_chain(False, B, BUCKET, sem_idx, None, None),
        reps=reps, runs=runs,
    )["device_ms"]
    emit({
        "metric": f"serve_b{B}_bucket{BUCKET}_unmasked",
        "value": round(ms_unmasked, 3), "unit": "ms/batch",
        "mask_overhead": round(ms_masked / ms_unmasked, 3),
    })

    # single-request serving (max_batch=1): flagship-length masked program
    n1 = lens[-1]
    idx1 = sem_idx[-1:, :n1]
    m1 = sem_mask_j[-1:, :n1]
    ms_single = fit_device_ms(
        batch_chain(True, 1, n1, idx1, m1, jnp.repeat(m1, 2, axis=1)),
        reps=reps, runs=runs,
    )["device_ms"]
    emit({
        "metric": f"serve_single_{n1}tok_masked",
        "value": round(ms_single, 3), "unit": "ms",
        "batch_speedup_per_request": round(ms_single / (ms_masked / B), 2),
    })

    # bf16 module compute on the masked batch program (params stay f32) —
    # the fastest flagship decode path in BENCH_all; measures whether that
    # carries over to the padded/masked serving batch.
    dec16 = EdgeDiffusionDecoder(cfg, dtype=jnp.bfloat16)

    def batch_chain16(b, bucket, idx, smask, mmask):
        def body(key, params):
            x_T = jax.random.normal(key, (b, bucket * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return dec16.apply(
                    {"params": params}, x, t, sem_idx=idx, step_idx=si,
                    sem_mask=smask, mel_mask=mmask,
                )

            x0 = ddim_sample(schedule, model_fn, x_T, steps)
            return x0[0, 0, 0]

        return scan_chain_builder(body, (params,))

    ms16 = fit_device_ms(
        batch_chain16(B, BUCKET, sem_idx, sem_mask_j, mel_mask_j),
        reps=reps, runs=runs,
    )["device_ms"]
    emit({
        "metric": f"serve_b{B}_bucket{BUCKET}_masked_bf16",
        "value": round(ms16, 3), "unit": "ms/batch",
        "per_request_ms": round(ms16 / B, 3),
        "utt_per_s": round(1e3 * B / ms16, 1),
        "speedup_vs_f32": round(ms_masked / ms16, 2),
    })


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
