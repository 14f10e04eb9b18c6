"""Fused Pallas conv-frontend vs the flax _FeatureExtractor oracle
(interpret mode on CPU; device performance exercised via bench flows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = pytest.mark.slow

from edge_diffusion_tts_tpu.models.hubert import (
    HubertConfig,
    _FeatureExtractor,
)
from edge_diffusion_tts_tpu.ops.fused_frontend import (
    fast_encode,
    fused_conv_frontend,
)


@pytest.fixture(scope="module")
def fe_setup():
    hc = HubertConfig()  # full hubert-base conv specs
    fe = _FeatureExtractor(hc)
    wav = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (2, 8000))
    params = fe.init(jax.random.PRNGKey(1), wav)["params"]
    return hc, fe, params, wav


def test_fused_frontend_matches_flax(fe_setup):
    hc, fe, params, wav = fe_setup
    oracle = fe.apply({"params": params}, wav)
    fused = fused_conv_frontend(
        hc, params, wav, interpret=True, compute_dtype=jnp.float32
    )
    assert fused.shape == oracle.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(oracle), atol=2e-4, rtol=1e-3
    )


def test_fused_frontend_multi_tile(fe_setup):
    """A 2 s segment spans two F_TILE=56 tiles; boundary frames must match."""
    hc, fe, params, _ = fe_setup
    wav = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (1, 32000))
    oracle = fe.apply({"params": params}, wav)
    fused = fused_conv_frontend(
        hc, params, wav, interpret=True, compute_dtype=jnp.float32
    )
    assert fused.shape == oracle.shape == (1, 99, 512)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(oracle), atol=2e-4, rtol=1e-3
    )


def test_fast_encode_matches_encode():
    """fast_encode (fused frontend + transformer) must produce the SAME
    semantic token indices as the reference encode path."""
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import SemanticEncoder

    cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0)
    hc = HubertConfig(
        num_layers=2, hidden_size=64, num_heads=2, intermediate_size=128
    )
    encoder = SemanticEncoder(cfg, hc)
    wav = 0.2 * jax.random.normal(jax.random.PRNGKey(3), (2, 8000))
    enc_vars = encoder.init(
        {"params": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5),
         "vq": jax.random.PRNGKey(6)}, wav, train=False,
    )
    ref_tokens = np.asarray(
        encoder.apply(enc_vars, wav, method=encoder.encode)
    )
    fast_tokens = np.asarray(
        fast_encode(encoder, enc_vars, wav, interpret=True,
                    compute_dtype=jnp.float32)
    )
    assert fast_tokens.shape == ref_tokens.shape
    match = (fast_tokens == ref_tokens).mean()
    assert match == 1.0, f"token match rate {match}"
