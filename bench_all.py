"""Extended benchmark suite: the five BASELINE.md measured configs.

  1. 4-step DDIM generation, 5 s utterance        (headline; also bench.py)
  2. 1-step consistency-style generation
  3. 1000-step DDPM ancestral sampling
  4. batched 32-utterance encode (HuBERT+FSQ) + 4-step decode
  5. training step throughput (diffusion phase, batch 32)

Plus two headline variants (pass --variants): bf16 module compute and the
fused-Pallas single-launch backend (ops/fused_denoise.py).

Prints one JSON line per config.  Device time is measured amortized (chained
dependent iterations inside one program) where dispatch overhead would
otherwise dominate — see bench.py's docstring for why.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

AUDIO_SECS = 5.0


def _amortized_ms(fn, reps, runs=6, *args):
    jax.block_until_ready(fn(jax.random.PRNGKey(0), *args))
    ts = []
    for i in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jax.random.PRNGKey(1 + i), *args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2] / reps


def main():
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import (
        EdgeDiffusionDecoder,
        HubertConfig,
        SemanticEncoder,
    )
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.schedule import (
        DiffusionSchedule,
        ddim_sample,
        ddpm_sample,
    )

    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    S = int(AUDIO_SECS * 50)
    results = []

    def decode_chain(num_steps, sampler, B=1, reps=10):
        sem_idx = jnp.zeros((B, S), jnp.int32)

        @jax.jit
        def run(rng):
            def body(key, _):
                k_next, k_noise = jax.random.split(key)
                x_T = jax.random.normal(k_noise, (B, S * 2, cfg.n_mels))

                def model_fn(x, t, si):
                    return decoder.apply(
                        {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                    )

                if sampler == "ddim":
                    x0 = ddim_sample(schedule, model_fn, x_T, num_steps)
                else:
                    x0 = ddpm_sample(schedule, model_fn, x_T, k_noise)
                return k_next, x0[0, 0, 0]

            _, outs = jax.lax.scan(body, rng, None, length=reps)
            return outs.sum()

        return run

    # 1. 4-step DDIM
    ms = _amortized_ms(decode_chain(4, "ddim", reps=10), 10)
    def emit(r):
        results.append(r)
        print(json.dumps(r), flush=True)

    emit(
        {"metric": "4step_ddim_5s", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 2. 1-step
    ms = _amortized_ms(decode_chain(1, "ddim", reps=10), 10)
    emit(
        {"metric": "1step_5s", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 3. 1000-step DDPM (one pass is long; no chaining needed)
    run1000 = decode_chain(1000, "ddpm", reps=1)
    ms = _amortized_ms(run1000, 1, runs=3)
    emit(
        {"metric": "1000step_ddpm_5s", "value": round(ms, 1), "unit": "ms",
         "vs_baseline": None}
    )

    # 4. batched 32-utterance encode + 4-step decode (full pipeline)
    encoder = SemanticEncoder(cfg, HubertConfig())
    wav = jnp.zeros((1, cfg.segment_len), jnp.float32)
    enc_vars = encoder.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
         "vq": jax.random.PRNGKey(3)},
        wav, train=False,
    )
    B = 32
    wavs = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.segment_len)) * 0.1

    @jax.jit
    def batch_pipeline(rng, enc_vars, params, wavs):
        # NOTE: large param trees must be ARGUMENTS, not closure captures —
        # captured trees become HLO constants and blow up the program size.
        sem = encoder.apply(enc_vars, wavs, method=encoder.encode)
        x_T = jax.random.normal(rng, (B, sem.shape[1] * 2, cfg.n_mels))

        def model_fn(x, t, si):
            return decoder.apply(
                {"params": params}, x, t, sem_idx=sem, step_idx=si
            )

        return ddim_sample(schedule, model_fn, x_T, 4)[:, 0, 0].sum()

    ms = _amortized_ms(batch_pipeline, 1, 6, enc_vars, params, wavs)
    emit(
        {"metric": "batch32_encode_decode_2s", "value": round(ms, 2),
         "unit": "ms", "vs_baseline": None,
         "per_utt_ms": round(ms / B, 3)}
    )

    # 5. training-step throughput (diffusion phase, batch 32, incl. on-device
    #    mel + HuBERT forward)
    from edge_diffusion_tts_tpu.training import (
        Trainer, create_train_state, make_optimizer,
    )
    from edge_diffusion_tts_tpu.training.train import init_models

    tcfg = CFG(batch_size=32, grad_accumulation=1)
    enc2, dec2, p2, vq2 = init_models(tcfg, jax.random.PRNGKey(0))
    tx = make_optimizer(tcfg, total_steps=1000)
    trainer = Trainer(tcfg, enc2, dec2, schedule, tx)
    state = create_train_state(tcfg, p2, vq2, tx)
    step = trainer.make_diffusion_step()
    batch = {"wav": jax.random.normal(
        jax.random.PRNGKey(5), (32, tcfg.segment_len)) * 0.1}

    state, m = step(state, batch, jax.random.PRNGKey(6))
    jax.block_until_ready(m["loss"])
    # Pipelined (async dispatch, sync once at the end) — how the real epoch
    # loop runs; per-step sync would measure tunnel latency, not the device.
    N = 32
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step(state, batch, jax.random.PRNGKey(7 + i))
    jax.block_until_ready(m["loss"])
    ms = (time.perf_counter() - t0) * 1e3 / N
    emit(
        {"metric": "train_step_b32", "value": round(ms, 2), "unit": "ms",
         "vs_baseline": None,
         "utt_per_sec": round(32 / (ms / 1e3), 1)}
    )

    if "--variants" not in sys.argv:
        return

    # 6. headline in bf16 module compute (params f32, matmuls bf16)
    cfg16 = CFG(compute_dtype="bfloat16")
    dec16 = EdgeDiffusionDecoder(cfg16, dtype=jnp.bfloat16)

    def decode_chain_with(dec, num_steps, B=1, reps=10):
        sem_idx = jnp.zeros((B, S), jnp.int32)

        @jax.jit
        def run(rng, params):
            def body(key, _):
                k_next, k_noise = jax.random.split(key)
                x_T = jax.random.normal(k_noise, (B, S * 2, cfg.n_mels))

                def model_fn(x, t, si):
                    return dec.apply(
                        {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                    )

                x0 = ddim_sample(schedule, model_fn, x_T, num_steps)
                return k_next, x0[0, 0, 0]

            _, outs = jax.lax.scan(body, rng, None, length=reps)
            return outs.sum()

        return run

    ms = _amortized_ms(decode_chain_with(dec16, 4), 10, 6, params)
    emit(
        {"metric": "4step_ddim_5s_bf16", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 7. headline through the fused-Pallas single-launch backend
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_generate_mel

    sem_idx = jnp.zeros((1, S), jnp.int32)

    @jax.jit
    def fused_chain(rng, params):
        def body(key, _):
            k_next, k_noise = jax.random.split(key)
            x_T = jax.random.normal(k_noise, (1, S * 2, cfg.n_mels))
            x0 = fused_generate_mel(
                cfg, schedule, params, sem_idx, x_T, 4, "eps"
            )
            return k_next, x0[0, 0, 0]

        _, outs = jax.lax.scan(body, rng, None, length=10)
        return outs.sum()

    ms = _amortized_ms(fused_chain, 10, 4, params)
    emit(
        {"metric": "4step_ddim_5s_fused_pallas", "value": round(ms, 3),
         "unit": "ms", "vs_baseline": round(50.0 / ms, 2)}
    )


if __name__ == "__main__":
    main()
