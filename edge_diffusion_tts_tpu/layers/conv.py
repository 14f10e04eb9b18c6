"""1-D convolution blocks (depthwise-separable and standard).

Library components for capability parity — the reference exports them but the
decoder does not consume them (reference: edge_diffusion_tts/layers/conv.py,
config flag use_depthwise at config.py:107).

Layout convention is channels-last [B, T, C] (idiomatic for XLA on TPU; the
reference uses torch's [B, C, T]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DepthwiseSeparableConv(nn.Module):
    """Depthwise conv (no bias) + pointwise 1x1 + GroupNorm(<=8) + GELU.

    Reference: layers/conv.py:10-64.
    """

    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            features=self.in_ch,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="SAME",
            feature_group_count=self.in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            features=self.out_ch,
            kernel_size=(1,),
            use_bias=True,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        num_groups = min(8, self.out_ch)
        x = nn.GroupNorm(num_groups=num_groups, dtype=self.dtype, name="norm")(x)
        return nn.gelu(x, approximate=False)


class ConvBlock(nn.Module):
    """Conv1d + GroupNorm(<=8) + GELU.  Reference: layers/conv.py:67-95."""

    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            features=self.out_ch,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        num_groups = min(8, self.out_ch)
        x = nn.GroupNorm(num_groups=num_groups, dtype=self.dtype, name="norm")(x)
        return nn.gelu(x, approximate=False)
