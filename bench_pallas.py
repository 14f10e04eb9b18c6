"""Pallas-vs-XLA crossover study (VERDICT r1 item 6).

Measures, on the real TPU chip:

  1. banded (sliding-window) attention: Pallas kernel vs XLA masked SDPA,
     flagship head geometry (B=1, H=4, d=40, window=64), T in
     {500, 1000, 2000, 3000, 4000, 8000};
  2. the fused whole-loop denoise kernel vs the XLA lax.scan program at the
     flagship decoder shape for T in {500, 1000} (the decoder positional
     table caps T at 1000).

Prints one JSON line per measurement plus a final crossover summary.  The
committed results drive cfg.pallas_min_seq_len (the auto-selection threshold
in EdgeDiffusionDecoder).

Methodology: per-iteration DEVICE time via the two-point amortization fit
(utils/speed.py::fit_device_ms) — chains of two lengths inside single jitted
programs separate device time from the tunnel's fixed ~30 ms dispatch cost;
the scalar result is fetched (block_until_ready is not a reliable barrier
through the tunnel).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

HEADS, HEAD_DIM, WINDOW = 4, 40, 64


def bench_banded(T: int):
    from edge_diffusion_tts_tpu.layers.attention import (
        local_attention_mask,
        sdpa,
    )
    from edge_diffusion_tts_tpu.ops.window_attention import banded_attention
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    shape = (1, HEADS, T, HEAD_DIM)
    q = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), shape)
    v = jax.random.normal(jax.random.PRNGKey(2), shape)

    def builder(attn_fn):
        # Data-carry chain: the attention output feeds the next iteration's
        # queries (the body draws no randomness, so a key alone would let
        # XLA hoist the work as loop-invariant).
        def body(carry, key, k, v):
            out = attn_fn(carry, k, v)
            return out, out[0, 0, 0, 0]

        return scan_chain_builder(body, (k, v), carry=q)

    xla = builder(
        lambda q, k, v: sdpa(q, k, v, local_attention_mask(T, WINDOW)[None, None])
    )
    pal = builder(
        lambda q, k, v: banded_attention(q, k, v, WINDOW, interpret=False)
    )
    ms_x = fit_device_ms(xla, reps=(100, 600))["device_ms"]
    ms_p = fit_device_ms(pal, reps=(100, 600))["device_ms"]
    return ms_x, ms_p


def bench_fused(T_mel: int, num_steps: int = 4):
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_generate_mel
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg, use_pallas=False)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    S = T_mel // 2
    sem_idx = jnp.zeros((1, S), jnp.int32)

    def xla_body(key, params):
        x_T = jax.random.normal(key, (1, T_mel, cfg.n_mels))

        def model_fn(x, t, si):
            return decoder.apply(
                {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
            )

        return ddim_sample(
            schedule, model_fn, x_T, num_steps, prediction="eps"
        )[0, 0, 0]

    def fused_body(key, params):
        x_T = jax.random.normal(key, (1, T_mel, cfg.n_mels))
        return fused_generate_mel(
            cfg, schedule, params, sem_idx, x_T, num_steps, "eps"
        )[0, 0, 0]

    ms_x = fit_device_ms(
        scan_chain_builder(xla_body, (params,)), reps=(10, 80), runs=4
    )["device_ms"]
    ms_f = fit_device_ms(
        scan_chain_builder(fused_body, (params,)), reps=(10, 80), runs=4
    )["device_ms"]
    return ms_x, ms_f


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr, flush=True)

    crossover = None
    for T in (500, 1000, 2000, 3000, 4000, 8000):
        ms_x, ms_p = bench_banded(T)
        rec = {
            "metric": "banded_attention", "T": T, "window": WINDOW,
            "xla_ms": round(ms_x, 4), "pallas_ms": round(ms_p, 4),
            "speedup": round(ms_x / ms_p, 3) if ms_p else None,
        }
        print(json.dumps(rec), flush=True)
        if crossover is None and ms_p < ms_x:
            crossover = T

    print(json.dumps(
        {"metric": "banded_attention_crossover", "T": crossover}
    ), flush=True)

    for T in (500, 1000):
        ms_x, ms_f = bench_fused(T)
        print(json.dumps({
            "metric": "fused_denoise_4step", "T_mel": T,
            "xla_ms": round(ms_x, 4), "fused_ms": round(ms_f, 4),
            "speedup": round(ms_x / ms_f, 3) if ms_f else None,
        }), flush=True)


if __name__ == "__main__":
    main()
