"""Diffusion transformer block: AdaLN self-attn, MLA cross-attn, SwiGLU FFN.

Reference behavior: edge_diffusion_tts/layers/transformer.py:71-160.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import EfficientAttention, MultiHeadLatentAttention
from .ffn import FeedForward
from .norms import AdaLayerNorm, RMSNorm


class DiffusionTransformerBlock(nn.Module):
    """Pre-norm residual block with three sub-layers:

    1. AdaLN(timestep cond) + windowed self-attention
    2. RMSNorm + MLA cross-attention on the semantic context (full attention)
    3. AdaLN(timestep cond) + SwiGLU feed-forward
    """

    dim: int
    context_dim: Optional[int] = None
    cond_dim: Optional[int] = None
    heads: int = 4
    ffn_mult: int = 2
    dropout: float = 0.1
    use_adaln: bool = True
    window_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_min_seq: int = 0
    cross_q_chunk: int = 0
    band_q_chunk: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        mel_mask: Optional[jnp.ndarray] = None,
        ctx_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``mel_mask`` ([B, T] bool) / ``ctx_mask`` ([B, S] bool) exclude
        padded key positions from self-/cross-attention respectively, so a
        padded batched forward reproduces each row's unpadded numerics
        (variable-length batched serving, serving.py)."""
        cond_dim = self.cond_dim or self.dim

        if self.use_adaln:
            h = AdaLayerNorm(self.dim, cond_dim, dtype=self.dtype, name="norm1")(
                x, cond
            )
        else:
            h = RMSNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + EfficientAttention(
            self.dim,
            self.heads,
            self.dropout,
            window_size=self.window_size,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_min_seq=self.pallas_min_seq,
            band_q_chunk=self.band_q_chunk,
            name="attn",
        )(h, deterministic=deterministic, key_mask=mel_mask)

        h = RMSNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + MultiHeadLatentAttention(
            dim=self.dim,
            heads=self.heads,
            kv_lora_rank=self.dim // 2,
            dropout=self.dropout,
            window_size=None,  # full attention over the (short) context
            dtype=self.dtype,
            q_chunk=self.cross_q_chunk,
            name="cross_attn",
        )(h, context=context, deterministic=deterministic, key_mask=ctx_mask)

        if self.use_adaln:
            h = AdaLayerNorm(self.dim, cond_dim, dtype=self.dtype, name="norm3")(
                x, cond
            )
        else:
            h = RMSNorm(self.dim, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(
            self.dim, self.ffn_mult, self.dropout, dtype=self.dtype, name="ffn"
        )(h, deterministic=deterministic)

        return x
