"""Pallas TPU kernel: banded (sliding-window) flash attention.

TPU-native replacement for the reference's masked SDPA with a |i-j| <= w band
(reference: edge_diffusion_tts/layers/attention.py:94-119 builds a dense
[T, T] mask and calls F.scaled_dot_product_attention).  Materializing the
dense mask costs O(T^2) HBM traffic; here the band structure is exploited
directly: each 128-row query tile only ever touches a *static* set of
key tiles (ceil(w/BLK) on each side), so the kernel streams
q/k/v HBM->VMEM tile by tile and keeps flash-style online-softmax state
(running max / denominator / weighted accumulator) in VMEM scratch across the
inner key-tile grid dimension.  Compute is fp32 on the MXU
(`preferred_element_type`), outputs cast back to the input dtype.

Grid layout: (batch*heads, num_q_tiles, num_k_tiles_per_band) with the last
dimension innermost — TPU grids execute sequentially on a core, so scratch
carries state across k tiles of one q tile; state resets at k-tile 0 and the
normalized output is written at the last k tile.

Measured guidance (v5e, two-point device-time fit, B=1 H=4 d=40 window=64;
PALLAS_CROSSOVER_r02.jsonl):

    T        500     1000    2000    3000    4000    8000
    XLA ms   0.004   0.016   0.066   0.618   1.089   4.245
    Pallas   0.028   0.056   0.112   0.165   0.220   0.432
    speedup  0.16x   0.30x   0.59x   3.7x    4.9x    9.8x

Per-pallas_call overhead and MXU underutilization (40-wide contractions in
128x128 tiles) make the dense XLA path faster up to T=2000; the kernel's
O(T*window) score work wins from T=3000 and scales linearly while XLA's
O(T^2) explodes.  EdgeDiffusionDecoder auto-selects via
cfg.pallas_min_seq_len (default 3000).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _band_kernel(
    q_ref,  # [1, BLK_Q, d]
    k_ref,  # [1, BLK_K, d]
    v_ref,  # [1, BLK_K, d]
    out_ref,  # [1, BLK_Q, d]
    m_ref,  # VMEM scratch [BLK_Q, 1] running max
    l_ref,  # VMEM scratch [BLK_Q, 1] running denominator
    acc_ref,  # VMEM scratch [BLK_Q, d] weighted value accumulator
    *,
    blk_q: int,
    blk_k: int,
    window: int,
    seq_len: int,
    lo_tiles: int,
    scale: float,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Absolute positions of this (q tile, k tile) pair.  The k-tile index in
    # the *sequence* is (qi * blk_q // blk_k - lo_tiles + kj) — the q-tile
    # index must be rescaled into blk_k units or any blk_q != blk_k call
    # would silently truncate the band (blk_q % blk_k == 0 is enforced at
    # the call site, so the base is exact).  It may fall outside [0, T) —
    # the BlockSpec index map clamps the DMA, and the band/bounds mask below
    # zeroes every score of such a tile.
    k_tile = qi * (blk_q // blk_k) + kj - lo_tiles
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    k_pos = k_tile * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
    in_band = jnp.abs(q_pos - k_pos) <= window
    in_bounds = (k_pos >= 0) & (k_pos < seq_len)
    mask = in_band & in_bounds

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(mask, s, NEG_INF)

    # Online softmax update (flash attention).
    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kj == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:], 1e-20)  # padded rows stay finite
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("window", "blk_q", "blk_k", "interpret")
)
def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Sliding-window attention, attend iff |i - j| <= window.

    q, k, v: [B, H, T, d].  Returns [B, H, T, d] in q's dtype.  Numerics match
    dense masked softmax(q k^T / sqrt(d)) v to fp32 accuracy.
    """
    B, H, T, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if blk_q % blk_k:
        # The static band coverage (lo_tiles/hi_tiles) assumes every q tile
        # starts on a k-tile boundary; a non-multiple would need per-tile
        # variable coverage.
        raise ValueError(f"blk_q={blk_q} must be a multiple of blk_k={blk_k}")

    Tp = int(math.ceil(T / blk_q) * blk_q)
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(B * H, Tp, d)
    kf = k.reshape(B * H, Tp, d)
    vf = v.reshape(B * H, Tp, d)

    n_q_tiles = Tp // blk_q
    n_k_seq_tiles = Tp // blk_k
    # Static band coverage in k tiles: lo_tiles to the left of the q tile's
    # first k tile, hi_tiles to the right of its position.
    lo_tiles = (window + blk_k - 1) // blk_k
    hi_tiles = (blk_q - 1 + window) // blk_k
    nk = lo_tiles + hi_tiles + 1

    def k_index(bh, qi, kj):
        # q-tile index rescaled into blk_k units (see _band_kernel k_tile).
        kt = jnp.clip(
            qi * (blk_q // blk_k) + kj - lo_tiles, 0, n_k_seq_tiles - 1
        )
        return (bh, kt, 0)

    kernel = functools.partial(
        _band_kernel,
        blk_q=blk_q,
        blk_k=blk_k,
        window=window,
        seq_len=T,
        lo_tiles=lo_tiles,
        scale=d**-0.5,
    )

    out = pl.pallas_call(
        kernel,
        grid=(B * H, n_q_tiles, nk),
        in_specs=[
            pl.BlockSpec(
                (1, blk_q, d), lambda bh, qi, kj: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, blk_k, d), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), k_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, d), lambda bh, qi, kj: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(B, H, Tp, d)[:, :, :T, :]
