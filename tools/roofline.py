"""Speed-of-light (roofline) analysis of the headline benchmark programs.

For each BENCH_all config this builds the SAME single-iteration program
bench_all.py times, compiles it, and derives TWO memory floors against the
v5e peaks (MXU 197 TFLOP/s bf16, HBM 819 GB/s):

  - ``mbytes_min`` — a hand byte model: every program input (params,
    optimizer state, data) read from HBM ONCE and every output written
    ONCE.  This is a physical lower bound — no execution can touch less —
    and it is attainable in the perfect-fusion limit (the fused-Pallas
    denoise kernel literally does it: params VMEM-resident, state never
    spilled).  ``sol_ms`` and ``bound`` use THIS floor, so ``pct_of_sol``
    can never exceed 100 on an honest measurement.
  - ``mbytes_xla`` — XLA post-optimization cost analysis "bytes accessed".
    This counts traffic between fusions, including intermediates that in
    practice stay VMEM-resident, so it is an ESTIMATE of the scheduled
    traffic, not a floor (ROOFLINE_r04 had three rows "beating" it by
    2.5x).  Reported for diagnosis only.

    sol_ms = max(flops / 197e12, bytes_min / 819e9) * 1e3

When a measurement is joined, ``limiter`` classifies what actually gates
the config: "compute"/"memory" when the measurement sits within 5x of the
matching floor, else "launch/overhead" — the regime where the program is a
chain of kernels too small to fill the MXU or the HBM bus (the flagship
4-step decode: ~2 GFLOP and ~9 MB per utterance put both floors in the tens
of microseconds; the measured ~0.2 ms is launch/serialization).  Programs
measured in f32 have a LOWER effective MXU peak than 197 TFLOP/s, so their
compute floor is optimistic (flagged per line).

Usage:  python tools/roofline.py [--platform cpu|tpu] [--out ROOFLINE.json]

Reference: BASELINE.md targets; measured values joined from the newest
BENCH_all_r*.json when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

V5E_MXU_FLOPS = 197e12  # bf16->f32 peak
V5E_HBM_BPS = 819e9

AUDIO_SECS = 5.0


def _io_bytes_min(fn, args):
    """Physical HBM-traffic lower bound for one execution of ``fn(*args)``:
    every input array read once + every output array written once.  Scalars
    and non-arrays are ignored (they ride in the program).  Attainable in
    the perfect-fusion limit; nothing can move less."""
    import jax
    import numpy as np

    def nbytes(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            shape = getattr(leaf, "shape", None)
            dtype = getattr(leaf, "dtype", None)
            if shape is None or dtype is None:
                continue
            total += int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
        return total

    out_shapes = jax.eval_shape(fn, *args)
    return nbytes(args) + nbytes(out_shapes)


def analyze(name, fn, args, measured_ms=None, dtype_note="f32", scale=1.0,
            prejitted=False):
    """``scale`` multiplies flops/xla-bytes: XLA's cost analysis counts a
    while/scan body ONCE regardless of trip count, so rolled loops (the
    1000-step DDPM scan) pass scale=trip_count; unrolled programs pass 1.
    The min-byte model is NOT scaled: a rolled loop's carry can stay
    on-chip, so its floor is still inputs-once + outputs-once (the fused
    1000-step DDPM Pallas kernel demonstrates this is attainable).
    ``prejitted`` lowers ``fn`` directly (preserving e.g. donate_argnums)
    instead of wrapping it in a fresh jax.jit."""
    import jax

    jfn = fn if prejitted else jax.jit(fn)
    compiled = jfn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) * scale
    bytes_xla = float(ca.get("bytes accessed", 0.0)) * scale
    bytes_min = _io_bytes_min(jfn, args)
    sol_compute_ms = flops / V5E_MXU_FLOPS * 1e3
    sol_hbm_ms = bytes_min / V5E_HBM_BPS * 1e3
    sol_hbm_xla_ms = bytes_xla / V5E_HBM_BPS * 1e3
    sol_ms = max(sol_compute_ms, sol_hbm_ms)
    out = {
        "metric": name,
        "gflops": round(flops / 1e9, 3),
        "mbytes_min": round(bytes_min / 1e6, 2),
        "mbytes_xla": round(bytes_xla / 1e6, 2),
        "sol_compute_ms": round(sol_compute_ms, 4),
        "sol_hbm_ms": round(sol_hbm_ms, 4),
        "sol_hbm_xla_ms": round(sol_hbm_xla_ms, 4),
        "sol_ms": round(sol_ms, 4),
        "bound": "compute" if sol_compute_ms >= sol_hbm_ms else "memory",
        "dtype": dtype_note,
    }
    if measured_ms is not None:
        out["measured_ms"] = measured_ms
        out["x_over_sol"] = round(measured_ms / sol_ms, 1) if sol_ms else None
        out["pct_of_sol"] = (
            round(100.0 * sol_ms / measured_ms, 1) if measured_ms else None
        )
        out["limiter"] = (
            out["bound"] if sol_ms and measured_ms <= 5.0 * sol_ms
            else "launch/overhead"
        )
    print(json.dumps(out), flush=True)
    return out


def load_measured():
    import glob

    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_all_r*.json")))
    vals = {}
    if paths:
        for line in open(paths[-1]):
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "metric" in d:
                vals[d["metric"]] = d["value"]
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

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

    measured = load_measured()
    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    S = int(AUDIO_SECS * 50)
    results = []

    def decode_once(num_steps, sampler="ddim", B=1):
        sem_idx = jnp.zeros((B, S), jnp.int32)

        def fn(params, key):
            k_x, k_samp = jax.random.split(key)
            x_T = jax.random.normal(k_x, (B, S * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return decoder.apply(
                    {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                )

            if sampler == "ddim":
                return ddim_sample(schedule, model_fn, x_T, num_steps)
            return ddpm_sample(schedule, model_fn, x_T, k_samp)

        return fn

    key = jax.random.PRNGKey(0)
    results.append(
        analyze("4step_ddim_5s", decode_once(4), (params, key),
                measured.get("4step_ddim_5s"))
    )
    results.append(
        analyze("1step_5s", decode_once(1), (params, key),
                measured.get("1step_5s"))
    )
    # ddpm_sample is a rolled lax.scan: cost analysis sees the body once, so
    # scale by the 1000-step trip count (the out-of-loop x_T randn it also
    # multiplies is <0.1% of a body iteration).
    results.append(
        analyze("1000step_ddpm_5s", decode_once(1000, "ddpm"), (params, key),
                measured.get("1000step_ddpm_5s"), scale=1000.0)
    )

    # batch-32 encode (HuBERT+FSQ) + 4-step decode
    encoder = SemanticEncoder(cfg, HubertConfig())
    wav = jnp.zeros((1, cfg.segment_len), jnp.float32)
    enc_vars = encoder.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
         "vq": jax.random.PRNGKey(3)},
        wav, train=False,
    )
    B = 32
    wavs = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.segment_len)) * 0.1

    def pipeline_fn(enc_vars, params, wavs, key):
        sem = encoder.apply(enc_vars, wavs, method=encoder.encode)
        x_T = jax.random.normal(key, (B, sem.shape[1] * 2, cfg.n_mels))

        def model_fn(x, t, si):
            return decoder.apply(
                {"params": params}, x, t, sem_idx=sem, step_idx=si
            )

        return ddim_sample(schedule, model_fn, x_T, 4)

    results.append(
        analyze("batch32_encode_decode_2s", pipeline_fn,
                (enc_vars, params, wavs, key),
                measured.get("batch32_encode_decode_2s"))
    )

    # training step (diffusion phase, batch 32, on-device mel + HuBERT fwd)
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

    # make_diffusion_step returns a jitted fn (donate_argnums=0); lower it
    # directly so the analysis sees the program the epoch loop actually runs
    results.append(
        analyze("train_step_b32", step,
                (state, batch, jax.random.PRNGKey(6)),
                measured.get("train_step_b32"), prejitted=True)
    )

    # long-form 40 s single program, analyzed as the FULLY-DENSE route (XLA
    # masked self-attention + dense cross-attention, cross_q_chunk=0): that
    # program has no rolled loops, so the counts are exact, and its traffic
    # (the [T,T]/[T,S] fp32 score matrices) is precisely what the shipped
    # banded-Pallas + q-chunked routes avoid.  No measured join: the shipped
    # route (12.84 ms in BENCH_all_r03) runs a strictly smaller program.
    import dataclasses

    with open(os.path.join(ROOT, "configs", "longform.json")) as f:
        lf_cfg = CFG.from_json(f.read())
    lf_cfg = dataclasses.replace(lf_cfg, cross_q_chunk=0, band_q_chunk=0)
    S_LONG = int(40.0 * 50)
    dec_lf = EdgeDiffusionDecoder(lf_cfg, use_pallas=False)
    sem_idx_lf = jnp.zeros((1, S_LONG), jnp.int32)

    def longform_fn(params, key):
        x_T = jax.random.normal(key, (1, S_LONG * 2, lf_cfg.n_mels))

        def model_fn(x, t, si):
            return dec_lf.apply(
                {"params": params}, x, t, sem_idx=sem_idx_lf, step_idx=si
            )

        return ddim_sample(schedule, model_fn, x_T, 4)

    results.append(
        analyze("4step_ddim_40s_longform_dense", longform_fn, (params, key),
                dtype_note="f32 fully-dense route (shipped route is smaller)")
    )

    if args.out:
        with open(args.out, "w") as f:
            meta = {
                "meta": "roofline vs v5e peaks (197 TFLOP/s bf16, 819 GB/s)",
                "platform": args.platform,
                "note": ("flops + mbytes_xla from XLA post-optimization "
                         "cost_analysis; mbytes_min is the inputs-once + "
                         "outputs-once physical floor that sol_ms/bound "
                         "use; 'limiter' marks rows gated by launch/"
                         "serialization overhead rather than either floor"),
            }
            f.write(json.dumps(meta) + "\n")
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
