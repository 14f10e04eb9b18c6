"""Pallas banded-attention kernel vs dense masked SDPA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.layers.attention import local_attention_mask, sdpa
from edge_diffusion_tts_tpu.ops.window_attention import banded_attention


def _rand_qkv(key, B, H, T, d):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, T, d), jnp.float32)
    k = jax.random.normal(k2, (B, H, T, d), jnp.float32)
    v = jax.random.normal(k3, (B, H, T, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "B,H,T,d,window",
    [
        (1, 2, 128, 40, 64),   # flagship head_dim=40, one full tile
        (2, 4, 200, 40, 64),   # flagship shapes: 2 s of mel frames, padded
        (1, 1, 300, 32, 16),   # window smaller than a tile
        (1, 2, 256, 64, 200),  # window larger than a tile
    ],
)
def test_banded_matches_dense(B, H, T, d, window):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B, H, T, d)
    ours = banded_attention(q, k, v, window)
    mask = local_attention_mask(T, window)[None, None]
    ref = sdpa(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_banded_tiny_window_edge():
    # Degenerate: window=0 means attend only to self -> output == v rows.
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 1, 130, 16)
    ours = banded_attention(q, k, v, 0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(v), atol=2e-5)


def test_banded_full_window_equals_full_attention():
    T = 160
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 2, T, 24)
    ours = banded_attention(q, k, v, T)  # band covers everything
    ref = sdpa(q, k, v, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
