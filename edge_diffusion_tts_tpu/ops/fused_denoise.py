"""Pallas TPU mega-kernel: the ENTIRE few-step denoise loop in one launch.

This is the framework's flagship kernel (SURVEY §2.2 north-star deliverable):
noise -> [decoder forward -> DDIM update] x num_steps -> x0, fused into a
single ``pallas_call``.  The XLA path dispatches ~150 kernels per step with
activations bouncing through HBM; here the decoder's full 2.27M params
(~7.5 MB f32), the per-layer cross-attention K/V, and all activations stay
resident in VMEM (~16 MB/core) for the whole loop — zero launch gaps, zero
HBM re-reads of weights between steps.

Everything that does not depend on x is precomputed OUTSIDE the kernel in
plain XLA (once per call, not per step):
  - context token embeddings + positional table;
  - per-layer MLA cross-attention K, V (context is step-invariant);
  - per-(step, layer) AdaLN modulation vectors folded with the RMSNorm
    weights: hn = rms(h) * pre_scale + pre_shift;
  - DDIM/schedule coefficients baked as compile-time float constants.

All tensor slicing inside the kernel happens on leading (sublane-free)
dimensions: per-head weight matrices are pre-split host-side so the kernel
never slices or concatenates along the 40-wide head lanes (Mosaic-hostile);
per-head outputs merge through per-head output projections summed into the
residual.

Reference semantics reproduced exactly: EdgeDiffusionDecoder.forward
(reference: edge_diffusion_tts/models/decoder.py:66-109, transformer blocks
transformer.py:129-160) driven by EdgeInference.generate_mel's raw-DDIM loop
(inference.py:24-53), eta=0, x0 clamp +-3.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CFG
from ..layers.embeddings import sinusoidal_position_table, sinusoidal_time_embedding
from ..schedule import DiffusionSchedule

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rms(h):
    return h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + 1e-6)


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _denoise_kernel(
    x_ref,        # [1, Tp, M]   initial noise (blocked on B)
    pos_ref,      # [Tp, H]      positional table (padded)
    in_w_ref,     # [M, H]
    in_b_ref,     # [1, H]
    mods_ref,     # [steps, L, 4, H]  AdaLN pre_scale/shift (n1s, n1b, n3s, n3b)
    n2w_ref,      # [L, H]       cross-attn RMSNorm weight
    qh_ref,       # [L, heads, 3, H, dh]  per-head self-attn q/k/v weights
    ap_ref,       # [L, heads, dh, H]     per-head attn out-proj
    ab_ref,       # [L, H]                attn out-proj bias
    cqh_ref,      # [L, heads, H, dh]     per-head cross-q weights
    ck_ref,       # [1, L, heads, Sp, dh] per-head cross K (blocked on B)
    cv_ref,       # [1, L, heads, Sp, dh] per-head cross V (blocked on B)
    co_ref,       # [L, heads, dh, H]     per-head cross out-proj
    f1v_w_ref,    # [L, H, F]   SwiGLU value branch
    f1v_b_ref,    # [L, F]
    f1g_w_ref,    # [L, H, F]   SwiGLU gate branch
    f1g_b_ref,    # [L, F]
    f2_w_ref,     # [L, F, H]
    f2_b_ref,     # [L, H]
    fn_s_ref,     # [1, H] final LayerNorm scale
    fn_b_ref,     # [1, H]
    out_w_ref,    # [H, M]
    out_b_ref,    # [1, M]
    coef_ref,     # [steps, 4] schedule coefficients (SMEM)
    o_ref,        # [1, Tp, M]  output x0
    *,
    layers: int,
    heads: int,
    hidden: int,
    head_dim: int,
    t_real: int,
    s_real: int,
    window: int,
    num_steps: int,
    prediction: str,
    x0_clip: float,
    compute_dtype=jnp.float32,
):
    Tp = x_ref.shape[1]
    Sp = ck_ref.shape[3]
    scale = head_dim ** -0.5

    # Additive masks, computed once on the VPU.
    qi = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    band = jnp.where(
        (jnp.abs(qi - kj) <= window) & (kj < t_real), 0.0, NEG
    ).astype(jnp.float32)
    sj = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1)
    cmask = jnp.where(sj < s_real, 0.0, NEG).astype(jnp.float32)

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(compute_dtype),
            b.astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mm_t(a, b):  # a [Tq, d] @ b[Tk, d]^T
        return jax.lax.dot_general(
            a.astype(compute_dtype),
            b.astype(compute_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    pos = pos_ref[:]

    # fori_loop over steps and layers (weights dynamically indexed on their
    # leading dims) keeps the Mosaic graph small: unrolling 4 steps x 4
    # layers x 8 head-attentions compiled ~15x slower for identical speed.
    def step_body(i, carry):
        x, _ = carry
        h = mm(x, in_w_ref[:]) + in_b_ref[0][None, :] + pos

        def layer_body(l, h):
            # 1. AdaLN(t) + windowed self-attention
            hn = _rms(h) * mods_ref[i, l, 0][None, :] + mods_ref[i, l, 1][None, :]
            acc = ab_ref[l][None, :] + jnp.zeros_like(h)
            for hd in range(heads):
                q = mm(hn, qh_ref[l, hd, 0])
                k = mm(hn, qh_ref[l, hd, 1])
                v = mm(hn, qh_ref[l, hd, 2])
                p = jax.nn.softmax(mm_t(q, k) * scale + band, axis=-1)
                acc = acc + mm(mm(p, v), ap_ref[l, hd])
            h = h + acc

            # 2. RMSNorm + MLA cross-attention (K/V precomputed per head)
            hn = _rms(h) * n2w_ref[l][None, :]
            acc = jnp.zeros_like(h)
            for hd in range(heads):
                q = mm(hn, cqh_ref[l, hd])
                p = jax.nn.softmax(
                    mm_t(q, ck_ref[0, l, hd]) * scale + cmask, axis=-1
                )
                acc = acc + mm(mm(p, cv_ref[0, l, hd]), co_ref[l, hd])
            h = h + acc

            # 3. AdaLN(t) + SwiGLU FFN
            hn = _rms(h) * mods_ref[i, l, 2][None, :] + mods_ref[i, l, 3][None, :]
            fv = mm(hn, f1v_w_ref[l]) + f1v_b_ref[l][None, :]
            fg = mm(hn, f1g_w_ref[l]) + f1g_b_ref[l][None, :]
            f = fv * jax.nn.silu(fg)
            return h + mm(f, f2_w_ref[l]) + f2_b_ref[l][None, :]

        h = jax.lax.fori_loop(0, layers, layer_body, h)

        # Final LayerNorm + zero-init out head
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
        hn = (h - mu) * jax.lax.rsqrt(var + 1e-6)
        hn = hn * fn_s_ref[0][None, :] + fn_b_ref[0][None, :]
        pred = mm(hn, out_w_ref[:]) + out_b_ref[0][None, :]

        # DDIM update (eta = 0) with schedule constants from SMEM.
        c_sab, c_s1m = coef_ref[i, 0], coef_ref[i, 1]
        c_sabp, c_s1mp = coef_ref[i, 2], coef_ref[i, 3]
        if prediction == "v":
            eps = c_s1m * x + c_sab * pred
        else:
            eps = pred
        x0 = jnp.clip((x - c_s1m * eps) / c_sab, -x0_clip, x0_clip)
        x = c_sabp * x0 + c_s1mp * eps
        return (x, x0)

    x = x_ref[0]
    _, x0 = jax.lax.fori_loop(0, num_steps, step_body, (x, jnp.zeros_like(x)))
    o_ref[0] = x0


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


def _adaln_mods(block_params, t_cond, which: str):
    """Fold AdaLN (scale, shift) with its RMSNorm weight -> (pre_scale, pre_shift)."""
    p = block_params[which]
    w = p["norm"]["weight"]
    mod = t_cond @ p["proj"]["kernel"] + p["proj"]["bias"]
    s, sh = jnp.split(mod, 2, axis=-1)
    return w * (1.0 + s), sh


def _split_heads_in(w, heads, dh):
    """[H, out] weight -> per-head [heads, H, dh] (split the OUTPUT lanes)."""
    return jnp.stack([w[:, h * dh : (h + 1) * dh] for h in range(heads)])


def _split_heads_out(w, heads, dh):
    """[H_in, H] out-proj -> per-head [heads, dh, H] (split the INPUT rows)."""
    return jnp.stack([w[h * dh : (h + 1) * dh, :] for h in range(heads)])


def fused_generate_mel(
    cfg: CFG,
    schedule: DiffusionSchedule,
    decoder_params: dict,
    sem_idx: jnp.ndarray,
    x_T: jnp.ndarray,
    num_steps: int,
    prediction: str = "eps",
    interpret: Optional[bool] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """x_T [B, T, n_mels] + tokens [B, S] -> x0 via the fused kernel.

    ``compute_dtype=jnp.bfloat16`` runs MXU matmuls on bf16 operands with
    f32 accumulation (2x MXU rate, residual stream stays f32).
    """
    p = decoder_params
    H, L, M = cfg.hidden, cfg.layers, cfg.n_mels
    heads, dh = cfg.heads, cfg.hidden // cfg.heads
    B, T, _ = x_T.shape
    S = sem_idx.shape[1]
    Tp, Sp = _round_up(T, 128), _round_up(S, 128)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # ---- step grid + schedule constants (host, static) ----
    stride = max(schedule.T // num_steps, 1)
    ts = schedule.get_schedule_for_steps(num_steps)
    num_steps = len(ts)  # the strided grid may be shorter than requested
    ab = np.asarray(schedule.alpha_bar)
    coeffs = np.zeros((num_steps, 4), np.float32)
    for i, t in enumerate(ts):
        t_prev = max(t - stride, 0)
        coeffs[i] = (
            np.sqrt(ab[t]),
            np.sqrt(1.0 - ab[t]),
            np.sqrt(ab[t_prev]),
            np.sqrt(1.0 - ab[t_prev]),
        )
    coeffs = jnp.asarray(coeffs)

    # ---- step-invariant precompute (XLA, fused into the caller's jit) ----
    tok = jnp.take(p["token_emb"]["embedding"], sem_idx, axis=0)  # [B, S, H]
    ctx = tok + sinusoidal_position_table(512, H)[:S][None]
    ctx = jnp.pad(ctx, ((0, 0), (0, Sp - S), (0, 0)))

    t_arr = jnp.asarray(ts, jnp.float32)
    te = sinusoidal_time_embedding(t_arr, H)
    te = te @ p["time_fc1"]["kernel"] + p["time_fc1"]["bias"]
    te = jax.nn.gelu(te, approximate=False)
    te = te @ p["time_fc2"]["kernel"] + p["time_fc2"]["bias"]
    step_ids = jnp.clip(
        jnp.arange(num_steps, dtype=jnp.int32),
        0,
        p["step_emb"]["embedding"].shape[0] - 1,
    )
    te = te + jnp.take(p["step_emb"]["embedding"], step_ids, axis=0)

    mods, n2w, qh, ap, ab_b = [], [], [], [], []
    cqh, ck, cv, co = [], [], [], []
    f1v_w, f1v_b, f1g_w, f1g_b, f2_w, f2_b = [], [], [], [], [], []
    for l in range(L):
        bp = p[f"layers_{l}"]
        s1, b1 = _adaln_mods(bp, te, "norm1")
        s3, b3 = _adaln_mods(bp, te, "norm3")
        mods.append(jnp.stack([s1, b1, s3, b3], axis=1))  # [steps, 4, H]
        n2w.append(bp["norm2"]["weight"])

        qkv = bp["attn"]["qkv"]["kernel"]  # [H, 3H]
        wq, wk, wv = qkv[:, :H], qkv[:, H : 2 * H], qkv[:, 2 * H :]
        qh.append(
            jnp.stack(
                [
                    _split_heads_in(wq, heads, dh),
                    _split_heads_in(wk, heads, dh),
                    _split_heads_in(wv, heads, dh),
                ],
                axis=1,
            )  # [heads, 3, H, dh]
        )
        ap.append(_split_heads_out(bp["attn"]["proj"]["kernel"], heads, dh))
        ab_b.append(bp["attn"]["proj"]["bias"])

        ca = bp["cross_attn"]
        cqh.append(_split_heads_in(ca["q_proj"]["kernel"], heads, dh))
        # Cross K/V: kv_down -> RMSNorm -> kv_up (mla.py:101-153); context is
        # step-invariant so this runs once per call, not once per step.
        c_kv = ctx @ ca["kv_down_proj"]["kernel"]
        c_kv = _rms(c_kv) * ca["kv_norm"]["weight"]
        kv = c_kv @ ca["kv_up_proj"]["kernel"]  # [B, Sp, 2H]
        k_full, v_full = kv[..., :H], kv[..., H:]
        ck.append(
            jnp.stack(
                [k_full[..., h * dh : (h + 1) * dh] for h in range(heads)], axis=1
            )  # [B, heads, Sp, dh]
        )
        cv.append(
            jnp.stack(
                [v_full[..., h * dh : (h + 1) * dh] for h in range(heads)], axis=1
            )
        )
        co.append(_split_heads_out(ca["out_proj"]["kernel"], heads, dh))

        f1 = bp["ffn"]["fc1"]
        F2 = f1["kernel"].shape[1] // 2
        f1v_w.append(f1["kernel"][:, :F2])
        f1v_b.append(f1["bias"][:F2])
        f1g_w.append(f1["kernel"][:, F2:])
        f1g_b.append(f1["bias"][F2:])
        f2_w.append(bp["ffn"]["fc2"]["kernel"])
        f2_b.append(bp["ffn"]["fc2"]["bias"])

    mods = jnp.stack(mods, axis=1)            # [steps, L, 4, H]
    ck = jnp.stack(ck, axis=1)                # [B, L, heads, Sp, dh]
    cv = jnp.stack(cv, axis=1)

    pos = jnp.pad(sinusoidal_position_table(1000, H)[:T], ((0, Tp - T), (0, 0)))
    x_pad = jnp.pad(x_T, ((0, 0), (0, Tp - T), (0, 0)))

    kernel = functools.partial(
        _denoise_kernel,
        layers=L,
        heads=heads,
        hidden=H,
        head_dim=dh,
        t_real=T,
        s_real=S,
        window=cfg.attn_window_size,
        num_steps=num_steps,
        prediction=prediction,
        x0_clip=3.0,
        compute_dtype=compute_dtype,
    )

    stack = jnp.stack
    row = lambda v: v[None, :]

    in_arrays = [
        x_pad,                       # 0: blocked on B
        pos,
        p["in_proj"]["kernel"],
        row(p["in_proj"]["bias"]),
        mods,
        stack(n2w),
        stack(qh),                   # [L, heads, 3, H, dh]
        stack(ap),                   # [L, heads, dh, H]
        stack(ab_b),
        stack(cqh),
        ck,                          # 10: blocked on B
        cv,                          # 11: blocked on B
        stack(co),
        stack(f1v_w),
        stack(f1v_b),
        stack(f1g_w),
        stack(f1g_b),
        stack(f2_w),
        stack(f2_b),
        row(p["final_norm"]["scale"]),
        row(p["final_norm"]["bias"]),
        p["out_proj"]["kernel"],
        row(p["out_proj"]["bias"]),
        coeffs,                      # 23: SMEM scalars
    ]

    def whole(arr):
        n = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda b, n=n: (0,) * n, memory_space=pltpu.VMEM
        )

    in_specs = []
    for i, arr in enumerate(in_arrays):
        if i == 0:
            in_specs.append(
                pl.BlockSpec((1, Tp, M), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        elif i in (10, 11):
            in_specs.append(
                pl.BlockSpec(
                    (1, L, heads, Sp, dh),
                    lambda b: (b, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        elif i == len(in_arrays) - 1:  # schedule coefficients
            in_specs.append(
                pl.BlockSpec(arr.shape, lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        else:
            in_specs.append(whole(arr))

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Tp, M), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, M), jnp.float32),
        interpret=interpret,
    )(*in_arrays)

    return out[:, :T, :]


class FusedEdgeInference:
    """EdgeInference-compatible facade over the fused Pallas kernel.

    ``generate_mel(sem_idx, num_steps)`` runs the whole denoise loop in one
    kernel launch; jit-cached per (B, S, num_steps) signature.
    """

    def __init__(self, cfg: CFG, schedule: DiffusionSchedule, decoder_params):
        self.cfg = cfg
        self.schedule = schedule
        self.decoder_params = decoder_params
        self._jit = {}

    def _build(self, num_steps: int, prediction: str):
        @jax.jit
        def run(params, sem_idx, rng, temperature):
            B, S = sem_idx.shape
            x_T = (
                jax.random.normal(rng, (B, S * 2, self.cfg.n_mels), jnp.float32)
                * temperature
            )
            return fused_generate_mel(
                self.cfg, self.schedule, params, sem_idx, x_T, num_steps,
                prediction,
            )

        return run

    def generate_mel(
        self,
        sem_idx: jnp.ndarray,
        num_steps: Optional[int] = None,
        temperature: float = 1.0,
        rng: Optional[jax.Array] = None,
        prediction: str = "eps",
    ) -> jnp.ndarray:
        num_steps = num_steps or self.cfg.inference_steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        key = (num_steps, prediction)
        if key not in self._jit:
            self._jit[key] = self._build(num_steps, prediction)
        return self._jit[key](
            self.decoder_params, sem_idx, rng, jnp.float32(temperature)
        )
