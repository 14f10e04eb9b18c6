"""Normalization layers.

RMSNorm and adaptive (timestep-conditioned) RMSNorm with zero-initialized
modulation, as used by the diffusion transformer blocks.
Reference behavior: edge_diffusion_tts/layers/mla.py:46-58 (RMSNorm) and
edge_diffusion_tts/layers/transformer.py:53-68 (AdaLayerNorm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RMSNorm(nn.Module):
    """Root-mean-square norm; statistics in float32, output cast back."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps
        )
        return normed.astype(x.dtype) * weight.astype(x.dtype)


class AdaLayerNorm(nn.Module):
    """Adaptive RMSNorm: ``norm(x) * (1 + scale) + shift``.

    scale/shift come from a zero-initialized linear projection of the
    conditioning vector, so at init the layer is an identity RMSNorm.
    """

    dim: int
    cond_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        mod = nn.Dense(
            self.dim * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(cond)
        scale, shift = jnp.split(mod, 2, axis=-1)
        return h * (1.0 + scale[:, None, :]) + shift[:, None, :]
