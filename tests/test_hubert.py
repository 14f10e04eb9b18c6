"""JAX HuBERT vs torch transformers HubertModel: numeric parity on a tiny
random-initialized config (no network access needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.models.hubert import (
    HubertConfig,
    HubertEncoder,
    load_hubert_params_from_torch,
)
from edge_diffusion_tts_tpu.config import hubert_num_frames

KEY = jax.random.PRNGKey(0)


def test_frame_count_formula():
    cfg = HubertConfig()
    enc = HubertEncoder(cfg)
    wav = jnp.zeros((1, 3200))
    params = enc.init(KEY, wav)
    out = enc.apply(params, wav)
    assert out[0].shape[1] == hubert_num_frames(3200)


def test_hidden_states_indexing():
    cfg = HubertConfig.tiny()
    enc = HubertEncoder(cfg)
    wav = jax.random.normal(KEY, (2, 1600))
    params = enc.init(KEY, wav)
    states = enc.apply(params, wav)
    assert len(states) == cfg.num_layers + 1
    assert all(s.shape == states[0].shape for s in states)


@pytest.fixture(scope="module")
def torch_pair():
    import torch
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    tiny = HubertConfig.tiny()
    hf_cfg = HFConfig(
        hidden_size=tiny.hidden_size,
        num_hidden_layers=tiny.num_layers,
        num_attention_heads=tiny.num_heads,
        intermediate_size=tiny.intermediate_size,
        conv_dim=list(tiny.conv_dim),
        conv_kernel=list(tiny.conv_kernel),
        conv_stride=list(tiny.conv_stride),
        num_conv_pos_embeddings=tiny.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=tiny.num_conv_pos_embedding_groups,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
        feat_extract_activation="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = HubertModel(hf_cfg).eval()
    return torch, model, tiny


def test_parity_with_torch_hubert(torch_pair):
    torch, model, tiny = torch_pair
    enc = HubertEncoder(tiny)
    params = load_hubert_params_from_torch(model.state_dict(), tiny)

    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 1600) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(wav), output_hidden_states=True)
    ref_states = [h.numpy() for h in ref.hidden_states]

    states = enc.apply(params, jnp.asarray(wav))
    assert len(states) == len(ref_states)
    for i, (a, b) in enumerate(zip(states, ref_states)):
        np.testing.assert_allclose(
            np.asarray(a), b, atol=5e-4, rtol=1e-3, err_msg=f"hidden_states[{i}]"
        )


def test_parity_full_size_hubert_base():
    """Full hubert-base-ls960 architecture (random init): layer-9 parity.

    Exercises the exact conversion path used for real pretrained weights
    (12 layers, 768 hidden, weight-normed 128-tap positional conv).
    """
    import torch
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    full = HubertConfig()
    hf_cfg = HFConfig(
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(1)
    model = HubertModel(hf_cfg).eval()

    enc = HubertEncoder(full)
    params = load_hubert_params_from_torch(model.state_dict(), full)

    wav = (np.random.RandomState(2).randn(1, 3200) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav), output_hidden_states=True)
    ref9 = ref.hidden_states[9].numpy()

    ours = enc.apply(params, jnp.asarray(wav), method=HubertEncoder.extract_layer,
                     layer=9)
    np.testing.assert_allclose(np.asarray(ours), ref9, atol=2e-3, rtol=1e-2)


def test_extract_layer_matches_indexing(torch_pair):
    torch, model, tiny = torch_pair
    enc = HubertEncoder(tiny)
    params = load_hubert_params_from_torch(model.state_dict(), tiny)
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 1600).astype(np.float32))
    layer1 = enc.apply(params, wav, method=HubertEncoder.extract_layer, layer=1)
    states = enc.apply(params, wav)
    np.testing.assert_allclose(np.asarray(layer1), np.asarray(states[1]), atol=1e-6)
