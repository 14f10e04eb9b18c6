"""Polyphase windowed-sinc resampling in pure JAX.

Numerically equivalent to torchaudio.functional.resample with
sinc_interp_hann (the reference's 22.05k -> 16k path, collate.py:34-37):
the kernel bank [new_g, K] is precomputed on host, and resampling is one
strided conv — a single XLA HLO that runs on-device.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """Kernel bank [new_g, width*2 + orig_g] and the left pad width."""
    g = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // g, new_freq // g

    base_freq = min(orig_g, new_g) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_g / base_freq))

    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = np.arange(0, -new_g, -1, dtype=np.float64)[:, None] / new_g + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base_freq / orig_g
    return kernel.astype(np.float32), width


def resample(
    wav: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample [B, T] (or [T]) waveforms from orig_freq to new_freq."""
    if orig_freq == new_freq:
        return wav
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None, :]
    B, T = wav.shape

    g = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // g, new_freq // g
    kernel, width = _sinc_kernel(orig_g, new_g, lowpass_filter_width, rolloff)

    padded = jnp.pad(wav, ((0, 0), (width, width + orig_g)))
    # Strided conv: out[b, p, j] = sum_k padded[b, j*orig_g + k] * kernel[p, k]
    out = jax.lax.conv_general_dilated(
        padded[:, None, :],  # [B, 1, T']
        jnp.asarray(kernel)[:, None, :],  # [new_g, 1, K]
        window_strides=(orig_g,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new_g, blocks]
    resampled = jnp.transpose(out, (0, 2, 1)).reshape(B, -1)
    target_len = int(math.ceil(new_g * T / orig_g))
    resampled = resampled[:, :target_len]
    return resampled[0] if squeeze else resampled
