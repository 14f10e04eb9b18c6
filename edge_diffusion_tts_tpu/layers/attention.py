"""Attention layers: windowed self-attention, cross-attention, and MLA.

The band (sliding-window) mask is generated inline with broadcasted iota —
static under jit, no host-side mask cache needed (the reference caches torch
masks per dynamic seq-len: layers/attention.py:94-102).  Softmax statistics
run in float32.  The self-attention inner product can optionally route
through the Pallas banded-attention kernel (ops/window_attention.py).

Reference behavior: edge_diffusion_tts/layers/attention.py (EfficientAttention,
CrossAttention) and edge_diffusion_tts/layers/mla.py (MultiHeadLatentAttention).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embeddings import apply_rope
from .norms import RMSNorm


def local_attention_mask(seq_len: int, window_size: int) -> jnp.ndarray:
    """Boolean band mask [T, T]: attend iff |i - j| <= window_size."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    return jnp.abs(cols - rows) <= window_size


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention on [B, H, T, D] with fp32 softmax."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def q_chunked_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_chunk: int,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SDPA scanned over query chunks — same math, bounded logits footprint.

    Softmax rows are independent across queries, so splitting the q axis into
    chunks of ``q_chunk`` and scanning computes exactly the dense result while
    only ever materializing a ``[B, H, q_chunk, S]`` logits tile.  At the
    long-form shape (B1 H4 T4000 S2000 d40) the dense path writes a 128 MB
    fp32 score matrix to HBM; chunking keeps each tile resident and measured
    3.6x faster on v5e (0.539 -> 0.149 ms/call, chunk 500 — see the sweep in
    PARITY.md / BENCH_all_r03).  The two matmuls are ~5.1 GFLOP = ~0.10 ms at
    fp32 MXU peak, so the chunked form runs near speed-of-light; a Pallas
    flash kernel has nothing left to win here.
    """
    B, H, T, D = q.shape
    n = -(-T // q_chunk)
    pad = n * q_chunk - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qc = q.reshape(B, H, n, q_chunk, D).transpose(2, 0, 1, 3, 4)
    # A key-side validity mask ([B, S] bool) is the same for every query
    # chunk, so it broadcasts into each tile's sdpa unchanged.
    mask = None if key_mask is None else key_mask[:, None, None, :]

    def step(carry, qi):
        return carry, sdpa(qi, k, v, mask)

    _, outs = jax.lax.scan(step, None, qc)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, n * q_chunk, D)
    return out[:, :, :T] if pad else out


def q_chunked_banded_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    q_chunk: int,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Windowed self-attention via query chunks over static k/v band slices.

    Pure-XLA alternative to the Pallas banded kernel
    (ops/window_attention.py): for query rows ``[i*C, (i+1)*C)`` only columns
    ``[i*C - w, (i+1)*C + w)`` can be in-band, so each scan step contracts a
    ``[C, D]`` query tile against a static-size ``[C + 2w, D]`` key slice —
    O(T*(C+2w)) FLOPs and a bounded logits tile instead of the dense masked
    path's O(T^2) and its [T, T] fp32 score matrix (256 MB at T=4000).
    The in-band condition depends only on the within-chunk offsets
    (``0 <= j - a <= 2w``), so one [C, C+2w] mask serves every chunk; a
    per-chunk column-validity vector handles the sequence edges.  Exact same
    math as dense masked SDPA (parity-tested in tests/test_layers.py).
    """
    B, H, T, D = q.shape
    C = q_chunk
    n = -(-T // C)
    pad = n * C - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kwin = C + 2 * window
    kp = jnp.pad(k, ((0, 0), (0, 0), (window, window + pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (window, window + pad), (0, 0)))
    qc = q.reshape(B, H, n, C, D).transpose(2, 0, 1, 3, 4)
    # Optional per-batch key validity ([B, T] bool, e.g. ragged serving
    # batches): pad alongside k so the same slice geometry applies.
    kmp = (
        None
        if key_mask is None
        else jnp.pad(key_mask, ((0, 0), (window, window + pad)))
    )

    # Within-chunk band: row a attends col j iff 0 <= j - a <= 2w (col j of
    # the slice is global column i*C - w + j for rows starting at i*C).
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, kwin), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C, kwin), 1)
    band = (cols >= rows) & (cols - rows <= 2 * window)
    col_iota = jnp.arange(kwin, dtype=jnp.int32)

    def step(carry, xs):
        qi, i = xs
        ks = jax.lax.dynamic_slice_in_dim(kp, i * C, kwin, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(vp, i * C, kwin, axis=2)
        g = i * C - window + col_iota  # global column of each slice col
        valid = (g >= 0) & (g < T)
        mask = (band & valid[None, :])[None, None]
        if kmp is not None:
            kms = jax.lax.dynamic_slice_in_dim(kmp, i * C, kwin, axis=1)
            mask = mask & kms[:, None, None, :]
        return carry, sdpa(qi, ks, vs, mask)

    _, outs = jax.lax.scan(step, None, (qc, jnp.arange(n)))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, n * C, D)
    return out[:, :, :T] if pad else out


class EfficientAttention(nn.Module):
    """Multi-head self-attention with fused QKV and optional band mask.

    Parameter layout matches the reference for weight porting: ``qkv`` is a
    single no-bias projection to 3*dim, ``proj`` has a bias
    (reference: layers/attention.py:33-123).
    """

    dim: int
    heads: int = 4
    dropout: float = 0.1
    window_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Sequence-length crossover for the Pallas kernel: below this length the
    # XLA masked-SDPA path wins (kernel-launch overhead dominates the
    # O(T*window) vs O(T^2) FLOP saving); 0 forces the kernel whenever
    # use_pallas is set.  Measured on v5e — see ops/window_attention.py.
    pallas_min_seq: int = 0
    # Query-chunk size for the pure-XLA banded fallback (0 = dense masked
    # SDPA).  When the Pallas branch is not taken, long windowed sequences
    # route through q_chunked_banded_sdpa at T >= 2 * band_q_chunk on the
    # no-dropout path, avoiding the dense [T, T] fp32 score matrix.
    band_q_chunk: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``key_mask`` ([B, T] bool, True = real position) excludes padded
        positions from the key side — variable-length batched serving pads
        sequences to a bucket length and masks the tail (serving.py).  The
        Pallas kernel carries no per-batch mask (masked calls fall through),
        but the chunked-band path does, so long masked serving batches keep
        a bounded logits footprint.
        """
        B, T, C = x.shape
        head_dim = self.dim // self.heads

        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, T, 3, self.heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, T, d]
        q, k, v = qkv[0], qkv[1], qkv[2]

        band_chunk = self.band_q_chunk
        if (
            key_mask is not None
            and self.use_pallas
            and self.window_size is not None
            and deterministic
            and T >= self.pallas_min_seq
        ):
            # The Pallas kernel carries no key mask, so masked (serving)
            # batches at kernel-worthy lengths would otherwise fall all the
            # way back to the dense [T, T] score matrix the kernel exists to
            # avoid (~2 GB of fp32 logits per layer-call at a 2048-token
            # bucket).  Route them through the chunked-band XLA path, which
            # supports key_mask with a bounded logits tile; clamp to T // 2
            # so a configured chunk larger than the sequence cannot push the
            # branch back onto the dense path either.
            band_chunk = min(band_chunk or 512, T // 2)

        if (
            self.use_pallas
            and self.window_size is not None
            and deterministic
            and key_mask is None
            and T >= self.pallas_min_seq
        ):
            from ..ops.window_attention import banded_attention

            out = banded_attention(q, k, v, self.window_size)
        elif (
            band_chunk > 0
            and self.window_size is not None
            and deterministic
            and T >= 2 * band_chunk
        ):
            out = q_chunked_banded_sdpa(
                q, k, v, self.window_size, band_chunk,
                key_mask=key_mask,
            )
        else:
            mask = None
            if self.window_size is not None:
                mask = local_attention_mask(T, self.window_size)[None, None]
            if key_mask is not None:
                km = key_mask[:, None, None, :]
                mask = km if mask is None else (mask & km)
            rng = (
                self.make_rng("dropout")
                if (self.dropout > 0 and not deterministic)
                else None
            )
            out = sdpa(
                q,
                k,
                v,
                mask,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                dropout_rng=rng,
            )

        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Standard cross-attention (q from x, fused kv from context).

    Library component for capability parity; the production decoder uses MLA
    for cross-attention (reference: layers/attention.py:126-188, unused by
    the decoder — transformer.py:110).
    """

    dim: int
    context_dim: Optional[int] = None
    heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        B, T, C = x.shape
        S = context.shape[1]
        head_dim = self.dim // self.heads

        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="q")(x)
        kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype, name="kv")(
            context
        )
        q = q.reshape(B, T, self.heads, head_dim).transpose(0, 2, 1, 3)
        kv = kv.reshape(B, S, 2, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0 and not deterministic)
            else None
        )
        out = sdpa(
            q,
            k,
            v,
            None,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=rng,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MultiHeadLatentAttention(nn.Module):
    """DeepSeek-style MLA: KV compressed through a low-rank latent.

    kv_down -> RMSNorm -> kv_up produces K and V; RoPE applies to q,k only in
    self-attention mode; the band mask applies only in self-attention mode.
    Used as the decoder's cross-attention (context = semantic tokens).
    Reference: edge_diffusion_tts/layers/mla.py:61-194.
    """

    dim: int
    heads: int = 8
    kv_lora_rank: Optional[int] = None
    dropout: float = 0.1
    window_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # Cross-attention query chunking (0 = dense).  Engages only in context
    # mode, on the no-dropout path, and when T >= 2 * q_chunk — short
    # sequences gain nothing and the flagship T=500 path stays byte-identical.
    q_chunk: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``key_mask`` ([B, S] bool over the kv sequence) excludes padded
        key positions — used by variable-length batched serving (serving.py).
        """
        B, T, C = x.shape
        head_dim = self.dim // self.heads
        rank = self.kv_lora_rank or (self.dim // 2)
        kv_input = context if context is not None else x
        S = kv_input.shape[1]

        q_in = x
        if cond is not None:
            q_in = q_in + cond[:, None, :]
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="q_proj")(q_in)
        q = q.reshape(B, T, self.heads, head_dim).transpose(0, 2, 1, 3)

        c_kv = nn.Dense(rank, use_bias=False, dtype=self.dtype, name="kv_down_proj")(
            kv_input
        )
        c_kv = RMSNorm(rank, dtype=self.dtype, name="kv_norm")(c_kv)
        kv = nn.Dense(
            self.dim * 2, use_bias=False, dtype=self.dtype, name="kv_up_proj"
        )(c_kv)
        kv = kv.reshape(B, S, 2, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        if context is None:
            q, k = apply_rope(q, k)

        mask = None
        if self.window_size is not None and context is None:
            mask = local_attention_mask(T, self.window_size)[None, None]
        if key_mask is not None:
            km = key_mask[:, None, None, :]
            mask = km if mask is None else (mask & km)

        use_dropout = self.dropout > 0 and not deterministic
        if (
            self.q_chunk > 0
            and context is not None
            and not use_dropout
            and self.window_size is None
            and T >= 2 * self.q_chunk
        ):
            out = q_chunked_sdpa(q, k, v, self.q_chunk, key_mask=key_mask)
        else:
            rng = self.make_rng("dropout") if use_dropout else None
            out = sdpa(
                q,
                k,
                v,
                mask,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                dropout_rng=rng,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="out_proj")(
            out
        )
