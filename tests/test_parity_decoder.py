"""Numeric parity: our flax decoder vs the PyTorch reference decoder.

Ports reference weights through utils/torch_compat and compares forward
outputs on identical inputs (both conditioning paths).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_PATH, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def setup():
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    from edge_diffusion_tts.config import CFG as RefCFG
    from edge_diffusion_tts.models.decoder import EdgeDiffusionDecoder as RefDecoder

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.utils.torch_compat import convert_decoder_state_dict

    torch.manual_seed(0)
    kw = dict(
        hidden=32,
        layers=2,
        heads=2,
        dropout=0.0,
        use_fsq=False,
        codebook_size=64,
        attn_window_size=8,
        out_dir="/tmp/edt_test_runs",
    )
    ref_cfg = RefCFG(**{k: v for k, v in kw.items() if k != "out_dir"})
    ref = RefDecoder(ref_cfg).eval()

    cfg = CFG(**kw)
    dec = EdgeDiffusionDecoder(cfg)
    params = convert_decoder_state_dict(ref.state_dict(), num_layers=cfg.layers)
    return torch, ref, dec, params, cfg


def test_token_index_path(setup):
    torch, ref, dec, params, cfg = setup
    rng = np.random.RandomState(0)
    x = rng.randn(2, 24, cfg.n_mels).astype(np.float32)
    t = np.array([100, 800])
    sem = rng.randint(0, 64, size=(2, 12))
    step = np.array([0, 2])

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(t),
            sem_idx=torch.from_numpy(sem),
            step_idx=torch.from_numpy(step),
        ).numpy()
    import jax.numpy as jnp

    out = np.asarray(
        dec.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(t),
            sem_idx=jnp.asarray(sem),
            step_idx=jnp.asarray(step),
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_features_path(setup):
    torch, ref, dec, params, cfg = setup
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, cfg.n_mels).astype(np.float32)
    t = np.array([500])
    feats = rng.randn(1, 8, cfg.semantic_dim).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(t),
            sem_features=torch.from_numpy(feats),
        ).numpy()
    import jax.numpy as jnp

    out = np.asarray(
        dec.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(t),
            sem_features=jnp.asarray(feats),
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_flagship_config_parity(setup):
    """Full-size decoder (160H/4L) parity on one input."""
    torch, *_ = setup
    sys.path.insert(0, REFERENCE_PATH)
    from edge_diffusion_tts.config import CFG as RefCFG
    from edge_diffusion_tts.models.decoder import EdgeDiffusionDecoder as RefDecoder

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.utils.torch_compat import convert_decoder_state_dict

    torch.manual_seed(1)
    ref_cfg = RefCFG(dropout=0.0, use_fsq=True)
    ref_cfg.codebook_size = 2304  # FSQ-derived (the v2 fix, train_v2.py:246)
    ref = RefDecoder(ref_cfg).eval()

    cfg = CFG(dropout=0.0, use_fsq=True, out_dir="/tmp/edt_test_runs")
    dec = EdgeDiffusionDecoder(cfg)
    params = convert_decoder_state_dict(ref.state_dict(), num_layers=cfg.layers)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 100, cfg.n_mels).astype(np.float32)
    t = np.array([750])
    sem = rng.randint(0, 2304, size=(1, 50))
    step = np.array([1])

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(t),
            sem_idx=torch.from_numpy(sem),
            step_idx=torch.from_numpy(step),
        ).numpy()
    import jax.numpy as jnp

    out = np.asarray(
        dec.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(t),
            sem_idx=jnp.asarray(sem),
            step_idx=jnp.asarray(step),
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)
