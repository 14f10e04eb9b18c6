"""Feed-forward layers with SwiGLU gating.

Reference behavior: edge_diffusion_tts/layers/transformer.py:13-49.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def swiglu(x: jnp.ndarray) -> jnp.ndarray:
    """Split the last axis in half: value * silu(gate)."""
    value, gate = jnp.split(x, 2, axis=-1)
    return value * nn.silu(gate)


class FeedForward(nn.Module):
    """Dense(dim -> 2*mult*dim) -> SwiGLU -> Dropout -> Dense(mult*dim -> dim)."""

    dim: int
    mult: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden = self.dim * self.mult
        h = nn.Dense(hidden * 2, dtype=self.dtype, name="fc1")(x)
        h = swiglu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)
