"""Extended benchmark suite: the five BASELINE.md measured configs.

  1. 4-step DDIM generation, 5 s utterance        (headline; also bench.py)
  2. 1-step consistency-style generation
  3. 1000-step DDPM ancestral sampling
  4. batched 32-utterance encode (HuBERT+FSQ) + 4-step decode
  5. training step throughput (diffusion phase, batch 32)
  6. 4-step DPM-Solver++ order-2 generation (the validation / v2-serving
     sampler; reference train_v2.py:166-206)
  7. long-form 40 s single-chunk generation (configs/longform.json):
     mel T=4000 engages the banded Pallas attention kernel via the
     cfg.pallas_min_seq_len routing; reported against the same program
     with the kernel forced off (XLA masked SDPA)

Plus two headline variants (pass --variants): bf16 module compute and the
fused-Pallas single-launch backend (ops/fused_denoise.py).

Prints one JSON line per config.  DEVICE time is reported via the two-point
amortization fit (utils/speed.py::fit_device_ms): chains of two lengths
inside single jitted programs separate per-iteration device time from the
tunnel's fixed ~30 ms dispatch/poll cost.  Chain bodies are made
carry-dependent (and the encode input carry-perturbed) so XLA cannot hoist
loop-invariant work out of the measured scan.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

AUDIO_SECS = 5.0


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
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    S = int(AUDIO_SECS * 50)

    def emit(r):
        print(json.dumps(r), flush=True)

    def decode_chain_builder(dec, num_steps, sampler="ddim", B=1):
        sem_idx = jnp.zeros((B, S), jnp.int32)

        def body(key, params):
            k_x, k_samp = jax.random.split(key)
            x_T = jax.random.normal(k_x, (B, S * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return dec.apply(
                    {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                )

            if sampler == "ddim":
                x0 = ddim_sample(schedule, model_fn, x_T, num_steps)
            else:
                x0 = ddpm_sample(schedule, model_fn, x_T, k_samp)
            return x0[0, 0, 0]

        return scan_chain_builder(body, (params,))

    # 1. 4-step DDIM
    fit = fit_device_ms(decode_chain_builder(decoder, 4), reps=(10, 80))
    ms = fit["device_ms"]
    emit(
        {"metric": "4step_ddim_5s", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 2. 1-step
    ms = fit_device_ms(decode_chain_builder(decoder, 1), reps=(10, 80))[
        "device_ms"
    ]
    emit(
        {"metric": "1step_5s", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 3. 1000-step DDPM (long program; short chains suffice)
    ms = fit_device_ms(
        decode_chain_builder(decoder, 1000, sampler="ddpm"),
        reps=(1, 4), runs=3,
    )["device_ms"]
    emit(
        {"metric": "1000step_ddpm_5s", "value": round(ms, 1), "unit": "ms",
         "vs_baseline": None}
    )

    # 4. batched 32-utterance encode (HuBERT+FSQ) + 4-step decode
    encoder = SemanticEncoder(cfg, HubertConfig())
    wav = jnp.zeros((1, cfg.segment_len), jnp.float32)
    enc_vars = encoder.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
         "vq": jax.random.PRNGKey(3)},
        wav, train=False,
    )
    B = 32
    wavs = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.segment_len)) * 0.1

    def pipeline_body(enc, dec):
        def body(key, enc_vars, params, wavs):
            k_eps, k_x = jax.random.split(key)
            # Key-dependent perturbation so the encode cannot be hoisted
            # out of the scan as loop-invariant.
            w = wavs + 1e-6 * jax.random.normal(k_eps, wavs.shape)
            sem = enc.apply(enc_vars, w, method=enc.encode)
            x_T = jax.random.normal(k_x, (B, sem.shape[1] * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return dec.apply(
                    {"params": params}, x, t, sem_idx=sem, step_idx=si
                )

            return ddim_sample(schedule, model_fn, x_T, 4)[:, 0, 0].sum()

        return body

    ms = fit_device_ms(
        scan_chain_builder(
            pipeline_body(encoder, decoder), (enc_vars, params, wavs)
        ),
        reps=(2, 8), runs=4,
    )["device_ms"]
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
    float(m["loss"])
    # Pipelined (async dispatch, sync once at the end) — how the real epoch
    # loop runs; the fixed dispatch cost amortizes over N steps.
    N = 32
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step(state, batch, jax.random.PRNGKey(7 + i))
    float(m["loss"])  # fetch = completion barrier
    ms = (time.perf_counter() - t0) * 1e3 / N
    emit(
        {"metric": "train_step_b32", "value": round(ms, 2), "unit": "ms",
         "vs_baseline": None,
         "utt_per_sec": round(32 / (ms / 1e3), 1)}
    )

    # 5b. training step with precomputed HuBERT features — the reference's
    #     dataset_precomputed.py path ("~10-20x faster training" claim),
    #     here data/precomputed.py: the batch carries cached [B, S, 768]
    #     features and _encode skips the frozen 95M forward, which
    #     PROFILE_r03.json shows is ~10 ms of the ~17 ms step.
    from edge_diffusion_tts_tpu.config import hubert_num_frames

    nf = hubert_num_frames(tcfg.segment_len)
    pre_batch = dict(batch)
    pre_batch["hubert_features"] = jax.random.normal(
        jax.random.PRNGKey(8), (32, nf, 768)) * 0.1
    # Continue from the live state (section 5's steps donated the original
    # buffers); the new batch structure retraces the step onto the
    # from_features path.
    state, m = step(state, pre_batch, jax.random.PRNGKey(9))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step(state, pre_batch, jax.random.PRNGKey(10 + i))
    float(m["loss"])  # fetch = completion barrier
    ms = (time.perf_counter() - t0) * 1e3 / N
    emit(
        {"metric": "train_step_b32_precomputed", "value": round(ms, 2),
         "unit": "ms", "vs_baseline": None,
         "utt_per_sec": round(32 / (ms / 1e3), 1)}
    )

    # 6. 4-step DPM-Solver++ order-2 — the sampler validation uses and the
    #    v2 recipe serves (reference train_v2.py:166-206).  Same utterance
    #    and fit methodology as the headline so the lines are comparable.
    from edge_diffusion_tts_tpu.schedule import DPMSolverPP

    solver = DPMSolverPP(schedule, order=2)
    sem_idx_d = jnp.zeros((1, S), jnp.int32)

    def dpmpp_body(key, params):
        x_T = jax.random.normal(key, (1, S * 2, cfg.n_mels))

        def model_fn(x, t, si):
            return decoder.apply(
                {"params": params}, x, t, sem_idx=sem_idx_d, step_idx=si
            )

        return solver.sample(model_fn, x_T, num_steps=4,
                             max_t=cfg.max_timestep)[0, 0, 0]

    ms = fit_device_ms(
        scan_chain_builder(dpmpp_body, (params,)), reps=(10, 80)
    )["device_ms"]
    emit(
        {"metric": "4step_dpmpp2_5s", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 7. long-form 40 s utterance in ONE program (configs/longform.json:
    #    max_mel_positions=4096).  At mel T=4000 the decoder's cfg routing
    #    engages the banded Pallas kernel (pallas_min_seq_len=3000,
    #    PALLAS_CROSSOVER_r02.jsonl); `speedup_vs_xla` re-times the identical
    #    program with the kernel forced off.  Positional tables are fixed
    #    sinusoids, so the flagship params apply unchanged.
    import os

    with open(os.path.join(os.path.dirname(__file__) or ".",
                           "configs", "longform.json")) as f:
        lf_cfg = CFG.from_json(f.read())
    S_LONG = int(40.0 * 50)  # 40 s -> 2000 semantic tokens -> mel T=4000
    dec_lf = EdgeDiffusionDecoder(lf_cfg)                    # cfg routing
    dec_lf_xla = EdgeDiffusionDecoder(lf_cfg, use_pallas=False)
    sem_idx_lf = jnp.zeros((1, S_LONG), jnp.int32)

    def longform_body(dec):
        def body(key, params):
            x_T = jax.random.normal(key, (1, S_LONG * 2, lf_cfg.n_mels))

            def model_fn(x, t, si):
                return dec.apply(
                    {"params": params}, x, t, sem_idx=sem_idx_lf, step_idx=si
                )

            x0 = ddim_sample(schedule, model_fn, x_T, 4)
            return x0[0, 0, 0]

        return scan_chain_builder(body, (params,))

    ms_pl = fit_device_ms(longform_body(dec_lf), reps=(2, 8), runs=4)[
        "device_ms"
    ]
    ms_xla = fit_device_ms(longform_body(dec_lf_xla), reps=(2, 8), runs=4)[
        "device_ms"
    ]
    # Third variant: banded Pallas self-attention but DENSE cross-attention
    # (cross_q_chunk=0) — isolates the q-chunked cross-attention win
    # (layers/attention.py::q_chunked_sdpa) at the 40 s shape, where the
    # dense path writes a 128 MB fp32 [T=4000, S=2000] score matrix per
    # layer-call to HBM.
    import dataclasses

    dec_lf_dense = EdgeDiffusionDecoder(
        dataclasses.replace(lf_cfg, cross_q_chunk=0)
    )
    ms_dense = fit_device_ms(
        longform_body(dec_lf_dense), reps=(2, 8), runs=4
    )["device_ms"]
    emit(
        {"metric": "4step_ddim_40s_longform", "value": round(ms_pl, 2),
         "unit": "ms", "vs_baseline": None,
         "xla_ms": round(ms_xla, 2),
         "speedup_vs_xla": round(ms_xla / ms_pl, 2),
         "dense_cross_ms": round(ms_dense, 2),
         "speedup_vs_dense_cross": round(ms_dense / ms_pl, 2)}
    )

    if "--variants" not in sys.argv:
        return

    # 6. headline in bf16 module compute (params f32, matmuls bf16)
    dec16 = EdgeDiffusionDecoder(cfg, dtype=jnp.bfloat16)
    ms = fit_device_ms(decode_chain_builder(dec16, 4), reps=(10, 80))[
        "device_ms"
    ]
    emit(
        {"metric": "4step_ddim_5s_bf16", "value": round(ms, 3), "unit": "ms",
         "vs_baseline": round(50.0 / ms, 2)}
    )

    # 7. headline through the fused-Pallas single-launch backend
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_generate_mel

    sem_idx = jnp.zeros((1, S), jnp.int32)

    def fused_body(key, params):
        x_T = jax.random.normal(key, (1, S * 2, cfg.n_mels))
        return fused_generate_mel(
            cfg, schedule, params, sem_idx, x_T, 4, "eps"
        )[0, 0, 0]

    ms = fit_device_ms(
        scan_chain_builder(fused_body, (params,)), reps=(10, 80), runs=4
    )["device_ms"]
    emit(
        {"metric": "4step_ddim_5s_fused_pallas", "value": round(ms, 3),
         "unit": "ms", "vs_baseline": round(50.0 / ms, 2)}
    )

    # 8. batched 32-utterance pipeline with bf16 module compute (params stay
    # f32; matmuls run bf16 on the MXU — the 95M-param HuBERT encode is
    # MXU-bound at batch 32, unlike the latency-bound flagship decode).
    enc16 = SemanticEncoder(cfg, HubertConfig(), dtype=jnp.bfloat16)

    ms = fit_device_ms(
        scan_chain_builder(
            pipeline_body(enc16, dec16), (enc_vars, params, wavs)
        ),
        reps=(2, 8), runs=4,
    )["device_ms"]
    emit(
        {"metric": "batch32_encode_decode_2s_bf16", "value": round(ms, 2),
         "unit": "ms", "vs_baseline": None,
         "per_utt_ms": round(ms / B, 3)}
    )

    # 9. training step with cfg.compute_dtype="bfloat16" (the reference's
    # AMP/fp16 capability mapped to TPU: params/optimizer f32, module
    # matmuls bf16 — no loss scaling needed on TPU).
    tcfg16 = CFG(batch_size=32, grad_accumulation=1,
                 compute_dtype="bfloat16")
    enc3, dec3, p3, vq3 = init_models(tcfg16, jax.random.PRNGKey(0))
    tx16 = make_optimizer(tcfg16, total_steps=1000)
    trainer16 = Trainer(tcfg16, enc3, dec3, schedule, tx16)
    state16 = create_train_state(tcfg16, p3, vq3, tx16)
    step16 = trainer16.make_diffusion_step()

    state16, m = step16(state16, batch, jax.random.PRNGKey(6))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(N):
        state16, m = step16(state16, batch, jax.random.PRNGKey(7 + i))
    float(m["loss"])  # fetch = completion barrier
    ms = (time.perf_counter() - t0) * 1e3 / N
    emit(
        {"metric": "train_step_b32_bf16", "value": round(ms, 2), "unit": "ms",
         "vs_baseline": None,
         "utt_per_sec": round(32 / (ms / 1e3), 1)}
    )

    # 10. 1000-step DDPM through the fused single-launch kernel (whole
    # trajectory in one pallas_call, per-step noise from the on-chip PRNG).
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_ddpm_sample

    sem_idx_f = jnp.zeros((1, S), jnp.int32)

    def fused_ddpm_body(key, params):
        k_x, k_seed = jax.random.split(key)
        x_T = jax.random.normal(k_x, (1, S * 2, cfg.n_mels))
        return fused_ddpm_sample(
            cfg, schedule, params, sem_idx_f, x_T, rng=k_seed
        )[0, 0, 0]

    ms = fit_device_ms(
        scan_chain_builder(fused_ddpm_body, (params,)), reps=(1, 4), runs=3
    )["device_ms"]
    emit(
        {"metric": "1000step_ddpm_5s_fused_pallas", "value": round(ms, 1),
         "unit": "ms", "vs_baseline": None}
    )


if __name__ == "__main__":
    main()
