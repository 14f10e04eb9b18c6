"""Device-time breakdown of the two remaining >1 ms costs -> PROFILE_r03.json.

VERDICT r2 #8: before attempting any new fusion kernel, profile the batch-32
encode (the 5.4 ms 9-layer HuBERT transformer) and the 18.9 ms train step.

Two instruments:

  1. component fits — every sub-program timed with the tunnel-proof two-point
     amortization fit (utils/speed.py::fit_device_ms), params as jit args,
     scalar D2H fetch as the completion barrier.  Sub-programs: conv
     frontend, full 9-layer transformer (conv bypassed), positional conv,
     one encoder layer, attention-only and FFN-only halves of a layer
     (pure-jnp replicas on the same weights), each in f32 AND bf16 — this
     pins down where the batch-32 encode's bf16 non-win comes from.
     Train step: loss forward, forward+backward, full step (adds optimizer).

  2. a jax.profiler trace attempt (op-level device breakdown).  Through the
     axon tunnel this may be unsupported — the attempt's status is recorded
     either way.

Usage: python tools/profile_breakdown.py [--out PROFILE_r03.json]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 32
EPS = 1e-5


class _SkipTrace(Exception):
    """Internal: --sections excludes the trace."""


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _ln(x, scale, bias, eps=EPS):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def attn_half(lp, x, nh):
    """MHA -> +res -> LN, exactly _EncoderLayer's first half
    (models/hubert.py:134-154) on the same weights."""
    Bx, T, H = x.shape
    hd = H // nh
    q = _dense(x, lp["q_proj"]).reshape(Bx, T, nh, hd).transpose(0, 2, 1, 3)
    k = _dense(x, lp["k_proj"]).reshape(Bx, T, nh, hd).transpose(0, 2, 1, 3)
    v = _dense(x, lp["v_proj"]).reshape(Bx, T, nh, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(Bx, T, H)
    attn = _dense(attn, lp["out_proj"])
    x = x + attn
    return _ln(x, lp["layer_norm"]["scale"], lp["layer_norm"]["bias"])


def ffn_half(lp, x):
    """FFN -> +res -> LN, _EncoderLayer's second half (hubert.py:156-164)."""
    import flax.linen as nn

    h = _dense(x, lp["intermediate_dense"])
    h = nn.gelu(h, approximate=False)
    h = _dense(h, lp["output_dense"])
    x = x + h
    return _ln(x, lp["final_layer_norm"]["scale"],
               lp["final_layer_norm"]["bias"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_r03.json")
    ap.add_argument("--trace-dir", default="/tmp/jaxprof_r03")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU plumbing check (not a measurement)")
    ap.add_argument("--sections", default="encode,train,trace",
                    help="comma subset of encode,train,trace; results merge "
                         "into an existing --out artifact")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    global B
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        B = 2

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import HubertConfig, SemanticEncoder
    from edge_diffusion_tts_tpu.models.hubert import (
        HubertEncoder,
        _EncoderLayer,
        _FeatureExtractor,
        _PositionalConvEmbedding,
    )
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    cfg = CFG()
    hcfg = HubertConfig()
    if args.smoke:
        cfg = CFG(segment_secs=0.2, segment_len=3200, hidden=16, layers=1,
                  heads=2)
        hcfg = HubertConfig.tiny()
    results = {}

    def measure(name, body, bargs, reps=(10, 80), runs=4, carry=None):
        if args.smoke:
            reps, runs = (1, 2), 1
        r = fit_device_ms(
            scan_chain_builder(body, bargs, carry=carry), reps=reps, runs=runs,
            min_spread_ms=0.0 if args.smoke else 300.0,
        )
        results[name] = round(r["device_ms"], 3)
        print(f"{name}: {r['device_ms']:.3f} ms", flush=True)
        return r["device_ms"]

    encoder = SemanticEncoder(cfg, hcfg)
    wav0 = jnp.zeros((1, cfg.segment_len), jnp.float32)
    enc_vars = encoder.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
         "vq": jax.random.PRNGKey(3)},
        wav0, train=False,
    )
    hub_params = enc_vars["params"]["hubert"]
    wavs = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.segment_len)) * 0.1

    # ---- A. encode pipeline components, f32 and bf16 -----------------------
    for tag, dt in (
        ("f32", jnp.float32), ("bf16", jnp.bfloat16)
    ) if "encode" in sections else ():
        fe = _FeatureExtractor(hcfg, dtype=dt)
        hub = HubertEncoder(hcfg, dtype=dt)
        enc_t = SemanticEncoder(cfg, hcfg, dtype=dt)

        def encode_body(key, ev, w):
            wp = w + 1e-6 * jax.random.normal(key, w.shape)
            sem = enc_t.apply(ev, wp, method=enc_t.encode)
            return sem[0, 0].astype(jnp.float32)

        measure(f"encode_total_{tag}", encode_body, (enc_vars, wavs))

        def frontend_body(key, p, w):
            wp = w + 1e-6 * jax.random.normal(key, w.shape)
            return fe.apply(
                {"params": p["feature_extractor"]}, wp
            )[0, 0, 0].astype(jnp.float32)

        measure(f"conv_frontend_{tag}", frontend_body, (hub_params, wavs))

        feats = _FeatureExtractor(hcfg).apply(
            {"params": hub_params["feature_extractor"]}, wavs
        )  # [B, T, 512]

        hub_layer = min(cfg.hubert_layer, hcfg.num_layers)

        def transformer_body(key, p, f):
            fp = f + 1e-6 * jax.random.normal(key, f.shape)
            h = hub.apply(
                {"params": p}, wav0, hub_layer, conv_feats=fp,
                method=hub.extract_layer,
            )
            return h[0, 0, 0].astype(jnp.float32)

        measure(f"transformer_9l_{tag}", transformer_body, (hub_params, feats))

        T_h = feats.shape[1]
        h0 = jax.random.normal(
            jax.random.PRNGKey(5), (B, T_h, hcfg.hidden_size)
        )
        layer = _EncoderLayer(hcfg, dtype=dt)
        lp = hub_params["layer_0"]

        def layer_body(key, p, h):
            hp = h + 1e-6 * jax.random.normal(key, h.shape)
            return layer.apply({"params": p}, hp)[0, 0, 0].astype(jnp.float32)

        measure(f"encoder_layer_{tag}", layer_body, (lp, h0))

        def attn_body(key, p, h):
            hp = (h + 1e-6 * jax.random.normal(key, h.shape)).astype(dt)
            return attn_half(p, hp, hcfg.num_heads)[0, 0, 0].astype(
                jnp.float32
            )

        def ffn_body(key, p, h):
            hp = (h + 1e-6 * jax.random.normal(key, h.shape)).astype(dt)
            return ffn_half(p, hp)[0, 0, 0].astype(jnp.float32)

        lp_dt = jax.tree.map(lambda a: a.astype(dt), lp)
        measure(f"attn_half_{tag}", attn_body, (lp_dt, h0))
        measure(f"ffn_half_{tag}", ffn_body, (lp_dt, h0))

        pos = _PositionalConvEmbedding(hcfg, dtype=dt)
        h768 = jax.random.normal(
            jax.random.PRNGKey(6), (B, T_h, hcfg.hidden_size)
        )

        def pos_body(key, p, h):
            hp = h + 1e-6 * jax.random.normal(key, h.shape)
            return pos.apply(
                {"params": p["pos_conv_embed"]}, hp
            )[0, 0, 0].astype(jnp.float32)

        measure(f"pos_conv_{tag}", pos_body, (hub_params, h768))

    # ---- B. train step decomposition (b32, diffusion phase) ----------------
    # Every body perturbs the batch wav with key-dependent noise: with a
    # constant batch, XLA hoists the whole (frozen-param) HuBERT encode out
    # of the timing chain as loop-invariant and the fit measures only the
    # key-dependent remainder (first run of this script: "full step" 5.98 ms
    # vs the honest 18.6 ms in BENCH_all — a 3x underestimate).
    if "train" in sections:
        from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
        from edge_diffusion_tts_tpu.training import (
            Trainer, create_train_state, make_optimizer,
        )
        from edge_diffusion_tts_tpu.training.train import init_models

        tcfg = CFG(batch_size=B, grad_accumulation=1)
        enc2, dec2, p2, vq2 = init_models(tcfg, jax.random.PRNGKey(0))
        schedule = DiffusionSchedule.create(tcfg.diff_steps)
        tx = make_optimizer(tcfg, total_steps=1000)
        trainer = Trainer(tcfg, enc2, dec2, schedule, tx)
        state = create_train_state(tcfg, p2, vq2, tx)
        loss_fn = trainer.make_diffusion_loss()
        batch = {"wav": wavs}

        def _perturbed(key, b):
            return {"wav": b["wav"] + 1e-6 * jax.random.normal(
                key, b["wav"].shape)}

        def fwd_body(key, params, vq_state, b):
            loss, _ = loss_fn(params, vq_state, _perturbed(key, b), key)
            return loss

        measure("train_loss_forward", fwd_body,
                (state.params, state.vq_state, batch), reps=(5, 40))

        def fwd_bwd_body(key, params, vq_state, b):
            grads, _ = jax.grad(loss_fn, has_aux=True)(
                params, vq_state, _perturbed(key, b), key
            )
            return grads["decoder"]["in_proj"]["bias"][0]

        measure("train_fwd_bwd", fwd_bwd_body,
                (state.params, state.vq_state, batch), reps=(5, 40))

        # Full step via the actual step math inlined (no donation inside
        # scan); carry = the TrainState so iterations are truly dependent.
        def _full_step(st, key, b):
            grads, (nvq, metrics) = jax.grad(loss_fn, has_aux=True)(
                st.params, st.vq_state, _perturbed(key, b), key
            )
            updates, nopt = trainer.tx.update(grads, st.opt_state, st.params)
            nparams = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype), st.params, updates
            )
            st = st.replace(step=st.step + 1, params=nparams, vq_state=nvq,
                            opt_state=nopt)
            return st, metrics["loss"]

        measure("train_full_step", _full_step, (batch,), reps=(5, 40),
                carry=state)

    # ---- C. jax.profiler trace attempt -------------------------------------
    trace = {"status": "skipped" if "trace" not in sections
             else "not_attempted"}
    try:
        if "trace" not in sections:
            raise _SkipTrace()
        enc_fn = jax.jit(
            lambda ev, w: SemanticEncoder(cfg, hcfg).apply(
                ev, w, method=SemanticEncoder.encode
            )
        )
        sem = enc_fn(enc_vars, wavs)
        float(sem[0, 0])
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(3):
            sem = enc_fn(enc_vars, wavs)
        float(sem[0, 0])
        jax.profiler.stop_trace()
        ops = {}
        device_total = 0.0
        for path in glob.glob(
            os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        ):
            with gzip.open(path, "rt") as f:
                data = json.load(f)
            pid_names = {
                e["pid"]: e["args"].get("name", "")
                for e in data.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"
            }
            for e in data.get("traceEvents", []):
                if e.get("ph") != "X":
                    continue
                pname = pid_names.get(e.get("pid"), "")
                if "TPU" not in pname and "tpu" not in pname:
                    continue
                ops[e["name"]] = ops.get(e["name"], 0.0) + e.get("dur", 0)
                device_total += e.get("dur", 0)
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
        trace = {
            "status": "ok" if ops else "no_device_events",
            "device_total_us": round(device_total, 1),
            "top_ops_us": {k: round(v, 1) for k, v in top},
        }
    except _SkipTrace:
        pass
    except Exception as e:  # tunnel may not support profiling
        trace = {"status": f"unsupported: {type(e).__name__}: {e}"[:300]}
    print("trace:", trace.get("status"), flush=True)

    # Partial runs (--sections) merge into an existing artifact.
    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
    merged = dict(prior.get("components_ms", {}))
    merged.update(results)
    results = merged
    if trace["status"] == "skipped" and "profiler_trace" in prior:
        trace = prior["profiler_trace"]

    artifact = {
        "meta": {
            "what": "device-time breakdown, batch-32 encode + train step "
                    "(tools/profile_breakdown.py; VERDICT r2 item 8)",
            "device": jax.devices()[0].device_kind,
            "date": time.strftime("%Y-%m-%d"),
            "shapes": {"batch": B, "segment_s": cfg.segment_secs,
                       "hubert": "full-size base (95M)"},
            "method": "two-point amortization fit per component "
                      "(utils/speed.py); bf16 column = module dtype only "
                      "(params stay f32)",
        },
        "components_ms": results,
        "profiler_trace": trace,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
