"""Embedding layers: diffusion-timestep, positional, and rotary embeddings.

Numerics match the reference modules bit-for-shape so torch weights port
directly (reference: edge_diffusion_tts/layers/embeddings.py).  Tables are
computed inline with jnp — XLA constant-folds them under jit, which replaces
the reference's registered buffers.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[B] timesteps -> [B, dim] embedding: concat(sin, cos) halves.

    Frequency layout matches SinusoidalTimeEmb (reference:
    layers/embeddings.py:27-43): freqs = exp(-log(1e4) * i/(half-1)).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class SinusoidalTimeEmb(nn.Module):
    dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return sinusoidal_time_embedding(t, self.dim)


class LearnedTimeEmb(nn.Module):
    """Sinusoidal embedding refined by a 2-layer GELU MLP.

    Reference: layers/embeddings.py:46-79.
    """

    dim: int
    hidden_dim: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        hidden = self.hidden_dim or self.dim * 4
        emb = sinusoidal_time_embedding(t, self.dim).astype(self.dtype)
        emb = nn.Dense(hidden, dtype=self.dtype, name="fc1")(emb)
        emb = nn.gelu(emb, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(emb)


def sinusoidal_position_table(max_len: int, dim: int) -> jnp.ndarray:
    """Interleaved sin/cos positional table [max_len, dim].

    pe[:, 0::2] = sin, pe[:, 1::2] = cos — matches SinusoidalPositionalEmb
    (reference: layers/embeddings.py:119-130).
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    angles = position * div_term[None, :]
    pe = jnp.zeros((max_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe


class SinusoidalPositionalEmb(nn.Module):
    """Adds a fixed interleaved sin/cos table to the input sequence.

    ``offset`` (python int or traced scalar) shifts the table window so a
    sequence SHARD sees its global positions — used by the sequence-parallel
    long-form path (parallel/sequence_parallel.py)."""

    dim: int
    max_len: int = 5000

    def __call__(self, x: jnp.ndarray, offset=0) -> jnp.ndarray:
        table = sinusoidal_position_table(self.max_len, self.dim)
        if isinstance(offset, int) and offset == 0:
            sl = table[: x.shape[1]]
        else:
            sl = jax.lax.dynamic_slice_in_dim(table, offset, x.shape[1], 0)
        return x + sl[None].astype(x.dtype)


class LearnedPositionalEmb(nn.Module):
    """Learned positional embedding table added to the input.

    Reference: layers/embeddings.py:82-107 (exported but unused by the
    decoder; provided for capability parity).
    """

    max_len: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.max_len, self.dim, dtype=self.dtype, name="emb")
        positions = jnp.arange(x.shape[1])
        return x + emb(positions)[None]


def rope_tables(max_len: int, dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [max_len, dim] with duplicated frequency halves.

    Matches RotaryEmbedding's cached layout (reference:
    layers/embeddings.py:157-166): emb = cat(freqs, freqs).
    """
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray, k: jnp.ndarray, max_len: int = 5000
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q and k ([B, H, T, D]) by position.

    Reference: layers/embeddings.py:168-190.
    """
    T = q.shape[2]
    cos, sin = rope_tables(max_len, q.shape[-1])
    cos = cos[None, None, :T, :].astype(q.dtype)
    sin = sin[None, None, :T, :].astype(q.dtype)
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot
