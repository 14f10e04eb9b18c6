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


@pytest.mark.slow
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


@pytest.mark.slow
def test_masked_padded_forward_is_exact():
    # wav_len makes a zero-padded forward equal to the exact-length forward
    # on every valid frame: masked group-norm statistics, zeroed padded
    # positions before the positional conv, and masked attention keys.
    # (HF's attention_mask is NOT exact here — its group-norm ignores the
    # mask — so this is a documented improvement, not a ported behavior.)
    from edge_diffusion_tts_tpu.models.hubert import conv_frame_lengths

    cfg = HubertConfig.tiny()
    enc = HubertEncoder(cfg)
    T = 1600
    wav = jax.random.normal(jax.random.PRNGKey(3), (1, T))
    params = enc.init(KEY, wav)

    exact = enc.apply(params, wav)
    n_valid = conv_frame_lengths(cfg, T)[-1]
    assert exact[0].shape[1] == n_valid

    for pad in (80, 400):
        padded = enc.apply(
            params, jnp.pad(wav, ((0, 0), (0, pad))), wav_len=T
        )
        for i, (a, b) in enumerate(zip(exact, padded)):
            # "Exact" = up to float accumulation order: the two runs have
            # different shapes, so XLA builds different reduction trees
            # (measured ~1.5e-6 max abs across layers; the UNMASKED padded
            # run is off by ~1.3 — six orders of magnitude).
            np.testing.assert_allclose(
                np.asarray(a),
                np.asarray(b[:, :n_valid]),
                rtol=1e-5,
                atol=1e-5,
                err_msg=f"hidden_states[{i}] pad={pad}",
            )
            # Padded frames are zeroed in every returned hidden state.
            assert np.all(np.asarray(b[:, n_valid:]) == 0.0)

    # Unmasked padded forward is NOT exact (group-norm stats shift): the
    # mask is doing real work, not vacuously passing.
    loose = enc.apply(params, jnp.pad(wav, ((0, 0), (0, 400))))
    assert not np.allclose(
        np.asarray(exact[-1]), np.asarray(loose[-1][:, :n_valid]), atol=1e-4
    )


def test_masked_forward_batched_lengths():
    # Per-row wav_len: two utterances of different true lengths batched into
    # one padded forward each match their own solo exact-length run.
    from edge_diffusion_tts_tpu.models.hubert import conv_frame_lengths

    cfg = HubertConfig.tiny()
    enc = HubertEncoder(cfg)
    lens = (1200, 1600)
    wavs = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (1, L))
        for i, L in enumerate(lens)
    ]
    params = enc.init(KEY, wavs[1])

    batch = jnp.concatenate(
        [jnp.pad(w, ((0, 0), (0, 1600 - w.shape[1]))) for w in wavs], axis=0
    )
    out = enc.apply(params, batch, wav_len=jnp.asarray(lens))[-1]
    for i, (L, w) in enumerate(zip(lens, wavs)):
        solo = enc.apply(params, w)[-1]
        n = conv_frame_lengths(cfg, L)[-1]
        np.testing.assert_allclose(
            np.asarray(out[i : i + 1, :n]), np.asarray(solo),
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.slow
def test_semantic_encoder_masked_matches_exact():
    # wav_len threads end-to-end through SemanticEncoder: a padded encode
    # equals the exact-length encode on valid frames, and the quantized
    # features/indices at padded positions are exactly zero (matching how
    # downstream consumers zero-pad exact-length features).
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import SemanticEncoder
    from edge_diffusion_tts_tpu.models.hubert import conv_frame_lengths

    cfg = CFG(hidden=32, layers=1, heads=2, use_fsq=True,
              out_dir="/tmp/edt_test_runs")
    hc = HubertConfig.tiny()
    enc = SemanticEncoder(cfg, hc)
    T = 1600
    wav = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (1, T))
    variables = enc.init(
        {"params": KEY, "dropout": KEY, "vq": KEY}, wav, train=False
    )

    z_exact, idx_exact, *_ = enc.apply(variables, wav, train=False)
    n = conv_frame_lengths(hc, T)[-1]
    z_pad, idx_pad, *_ = enc.apply(
        variables, jnp.pad(wav, ((0, 0), (0, 480))), train=False, wav_len=T
    )
    np.testing.assert_allclose(
        np.asarray(z_pad[:, :n]), np.asarray(z_exact), rtol=1e-5, atol=1e-5
    )
    # FSQ levels are coarse, so ~1e-6 feature noise almost never flips a
    # quantization bin — but "almost" is not "never"; allow a stray flip.
    flips = int((np.asarray(idx_pad[:, :n]) != np.asarray(idx_exact)).sum())
    assert flips <= max(1, n // 50)
    assert np.all(np.asarray(z_pad[:, n:]) == 0.0)
    assert np.all(np.asarray(idx_pad[:, n:]) == 0)


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


@pytest.mark.slow
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
