"""Mel normalization utilities.

Training operates entirely in normalized-mel space; statistics are
per-utterance over the time axis.  Reference: edge_diffusion_tts/utils/
audio.py:10-19 — note torch's ``std`` is the unbiased (ddof=1) estimator,
matched here.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def normalize_mel(
    mel: jnp.ndarray, eps: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, T, n_mels] -> (normalized, mean, std); stats over the time axis."""
    mean = jnp.mean(mel, axis=1, keepdims=True)
    std = jnp.std(mel, axis=1, keepdims=True, ddof=1)
    std = jnp.clip(std, eps)
    return (mel - mean) / std, mean, std


def denormalize_mel(
    mel_n: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
) -> jnp.ndarray:
    return mel_n * std + mean
