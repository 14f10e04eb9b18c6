"""Layer-level tests: shapes, masks, invariances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edge_diffusion_tts_tpu.layers import (
    AdaLayerNorm,
    ConvBlock,
    CrossAttention,
    DepthwiseSeparableConv,
    DiffusionTransformerBlock,
    EfficientAttention,
    FeedForward,
    LearnedPositionalEmb,
    LearnedTimeEmb,
    MultiHeadLatentAttention,
    q_chunked_sdpa,
    RMSNorm,
    SinusoidalPositionalEmb,
    apply_rope,
    local_attention_mask,
    sinusoidal_time_embedding,
    swiglu,
)

KEY = jax.random.PRNGKey(0)


def test_local_attention_mask():
    m = np.asarray(local_attention_mask(6, 2))
    assert m.shape == (6, 6)
    assert m[0, 2] and not m[0, 3]
    assert m[5, 3] and not m[5, 2]
    assert np.array_equal(m, m.T)


def test_rmsnorm_scale_invariance():
    x = jax.random.normal(KEY, (2, 5, 8))
    mod = RMSNorm(8)
    params = mod.init(KEY, x)
    y1 = mod.apply(params, x)
    y2 = mod.apply(params, x * 100.0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    # unit RMS after norm with weight=1
    rms = np.sqrt(np.mean(np.asarray(y1) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_adaln_identity_at_init():
    x = jax.random.normal(KEY, (2, 5, 8))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    mod = AdaLayerNorm(8, 16)
    params = mod.init(KEY, x, cond)
    y = mod.apply(params, x, cond)
    # zero-init proj -> AdaLN == plain RMSNorm at init
    ref = RMSNorm(8).apply(
        {"params": {"weight": params["params"]["norm"]["weight"]}}, x
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_swiglu_halves_dim():
    x = jax.random.normal(KEY, (2, 3, 16))
    assert swiglu(x).shape == (2, 3, 8)


def test_feedforward_shapes():
    mod = FeedForward(8, mult=2, dropout=0.0)
    x = jax.random.normal(KEY, (2, 5, 8))
    params = mod.init(KEY, x)
    assert mod.apply(params, x).shape == (2, 5, 8)
    # hidden dims: fc1 -> 2*mult*dim, fc2 <- mult*dim
    assert params["params"]["fc1"]["kernel"].shape == (8, 32)
    assert params["params"]["fc2"]["kernel"].shape == (16, 8)


def test_time_embedding_shape_and_range():
    emb = sinusoidal_time_embedding(jnp.array([0, 500, 999]), 32)
    assert emb.shape == (3, 32)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)


def test_learned_time_emb():
    mod = LearnedTimeEmb(16)
    t = jnp.array([1, 2])
    params = mod.init(KEY, t)
    assert mod.apply(params, t).shape == (2, 16)


def test_positional_emb_additive():
    x = jnp.zeros((1, 7, 16))
    y = SinusoidalPositionalEmb(16, max_len=100)(x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), 0.0)
    mod = LearnedPositionalEmb(100, 16)
    params = mod.init(KEY, x)
    assert mod.apply(params, x).shape == x.shape


def test_rope_preserves_norm():
    q = jax.random.normal(KEY, (1, 2, 10, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 10, 8))
    q2, k2 = apply_rope(q, k)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q2), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        atol=1e-4,
    )
    # relative-position property: scores depend only on distance
    s_orig = np.einsum("bhtd,bhsd->bhts", np.asarray(q2), np.asarray(k2))
    assert s_orig.shape == (1, 2, 10, 10)


@pytest.mark.parametrize("window", [None, 2])
def test_efficient_attention(window):
    mod = EfficientAttention(16, heads=4, dropout=0.0, window_size=window)
    x = jax.random.normal(KEY, (2, 9, 16))
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    assert y.shape == (2, 9, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_windowed_attention_locality():
    # With a tiny window, distant-token perturbations must not change output
    # beyond the window (plus nothing else in the block mixes positions).
    mod = EfficientAttention(16, heads=2, dropout=0.0, window_size=1)
    x = jax.random.normal(KEY, (1, 12, 16))
    params = mod.init(KEY, x)
    y1 = np.asarray(mod.apply(params, x))
    x2 = x.at[0, 11, :].add(10.0)
    y2 = np.asarray(mod.apply(params, x2))
    np.testing.assert_allclose(y1[0, :9], y2[0, :9], atol=1e-5)
    assert np.abs(y1[0, 10:] - y2[0, 10:]).max() > 1e-3


def test_cross_attention_shapes():
    mod = CrossAttention(16, heads=4, dropout=0.0)
    x = jax.random.normal(KEY, (2, 9, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    params = mod.init(KEY, x, ctx)
    assert mod.apply(params, x, ctx).shape == (2, 9, 16)


def test_mla_self_and_cross():
    mod = MultiHeadLatentAttention(16, heads=4, dropout=0.0, window_size=3)
    x = jax.random.normal(KEY, (2, 9, 16))
    params = mod.init(KEY, x)
    assert mod.apply(params, x).shape == (2, 9, 16)

    modx = MultiHeadLatentAttention(16, heads=4, dropout=0.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    params = modx.init(KEY, x, context=ctx)
    assert modx.apply(params, x, context=ctx).shape == (2, 9, 16)
    # latent rank defaults to dim // 2
    assert params["params"]["kv_down_proj"]["kernel"].shape == (16, 8)


@pytest.mark.parametrize("T,chunk", [(64, 16), (50, 16), (7, 3)])
def test_q_chunked_sdpa_matches_dense(T, chunk):
    # Softmax rows are independent across queries, so chunking the q axis
    # must reproduce the dense result exactly (incl. the padded tail).
    from edge_diffusion_tts_tpu.layers.attention import sdpa as dense_sdpa

    B, H, S, d = 2, 4, 23, 8
    q = jax.random.normal(KEY, (B, H, T, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, d))
    ref = dense_sdpa(q, k, v)
    out = q_chunked_sdpa(q, k, v, chunk)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("T,chunk,window", [(64, 16, 4), (50, 16, 7), (40, 16, 20)])
def test_q_chunked_banded_sdpa_matches_dense(T, chunk, window):
    # The chunked-band form must reproduce dense masked SDPA exactly,
    # including ragged tails and windows wider than the chunk.
    from edge_diffusion_tts_tpu.layers.attention import (
        q_chunked_banded_sdpa,
        sdpa as dense_sdpa,
    )

    B, H, d = 2, 3, 8
    q = jax.random.normal(KEY, (B, H, T, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, d))
    mask = local_attention_mask(T, window)[None, None]
    ref = dense_sdpa(q, k, v, mask)
    out = q_chunked_banded_sdpa(q, k, v, window, chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # ragged key_mask (serving batches): compare on rows that keep at least
    # one in-band key — fully-masked rows are uniform-softmax garbage that
    # serving crops anyway
    lens = [T - 2, T // 2]
    key_mask = jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None]
    ref_m = dense_sdpa(q, k, v, mask & key_mask[:, None, None, :])
    out_m = q_chunked_banded_sdpa(q, k, v, window, chunk, key_mask=key_mask)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(out_m[b, :, :n]), np.asarray(ref_m[b, :, :n]), atol=1e-6
        )


def test_efficient_attention_band_q_chunk_routing():
    # band_q_chunk routes EfficientAttention's XLA fallback through the
    # chunked-band scan at T >= 2*chunk; same params must give the same
    # output, and short T must fall back to the dense path.
    x = jax.random.normal(KEY, (2, 48, 16))
    dense = EfficientAttention(16, heads=4, dropout=0.0, window_size=5)
    chunked = EfficientAttention(
        16, heads=4, dropout=0.0, window_size=5, band_q_chunk=8
    )
    params = dense.init(KEY, x)
    np.testing.assert_allclose(
        np.asarray(chunked.apply(params, x)),
        np.asarray(dense.apply(params, x)),
        atol=1e-6,
    )
    xs = x[:, :12]  # 12 < 2*8 -> dense fallback
    np.testing.assert_allclose(
        np.asarray(chunked.apply(params, xs)),
        np.asarray(dense.apply(params, xs)),
        atol=1e-6,
    )


def test_efficient_attention_masked_pallas_length_uses_chunked(monkeypatch):
    # The Pallas banded kernel carries no key mask, so masked (serving)
    # batches at kernel-worthy lengths must route through the chunked-band
    # XLA path — NOT fall back to the dense [T, T] score matrix (which is
    # ~2 GB of fp32 logits per layer-call at a 2048-token bucket).
    import edge_diffusion_tts_tpu.layers.attention as att

    calls = []
    real = att.q_chunked_banded_sdpa

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return real(*a, **kw)

    monkeypatch.setattr(att, "q_chunked_banded_sdpa", spy)
    T = 48
    x = jax.random.normal(KEY, (2, T, 16))
    key_mask = jnp.arange(T)[None, :] < jnp.asarray([T, T // 3])[:, None]
    # use_pallas with a low crossover, band_q_chunk unset: the masked call
    # can't take the Pallas branch and must auto-pick a chunk
    mod = EfficientAttention(
        16, heads=4, dropout=0.0, window_size=5,
        use_pallas=True, pallas_min_seq=16,
    )
    dense = EfficientAttention(16, heads=4, dropout=0.0, window_size=5)
    params = dense.init(KEY, x)
    out = mod.apply(params, x, key_mask=key_mask)
    assert calls, "masked long input must use the chunked-band path"
    ref = dense.apply(params, x, key_mask=key_mask)
    for b, n in enumerate([T, T // 3]):
        np.testing.assert_allclose(
            np.asarray(out[b, :n]), np.asarray(ref[b, :n]), atol=1e-6
        )

    # A configured chunk LARGER than the sequence must clamp (to T//2), not
    # fall back to the dense [T, T] path the routing exists to avoid.
    calls.clear()
    mod_big = EfficientAttention(
        16, heads=4, dropout=0.0, window_size=5,
        use_pallas=True, pallas_min_seq=16, band_q_chunk=4096,
    )
    out_big = mod_big.apply(params, x, key_mask=key_mask)
    assert calls, "oversized band_q_chunk must clamp, not go dense"
    for b, n in enumerate([T, T // 3]):
        np.testing.assert_allclose(
            np.asarray(out_big[b, :n]), np.asarray(ref[b, :n]), atol=1e-6
        )


def test_mla_cross_q_chunk_matches_dense():
    # The q_chunk routing inside MLA must be numerically transparent: the same
    # params applied with chunking on/off agree, and short sequences
    # (T < 2 * q_chunk) fall back to the dense path.
    x = jax.random.normal(KEY, (2, 40, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 16))
    dense = MultiHeadLatentAttention(16, heads=4, dropout=0.0)
    chunked = MultiHeadLatentAttention(16, heads=4, dropout=0.0, q_chunk=8)
    params = dense.init(KEY, x, context=ctx)
    ref = dense.apply(params, x, context=ctx)
    out = chunked.apply(params, x, context=ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # short-sequence fallback: T=9 < 2*8 routes dense; result must still match
    xs = x[:, :9]
    np.testing.assert_allclose(
        np.asarray(chunked.apply(params, xs, context=ctx)),
        np.asarray(dense.apply(params, xs, context=ctx)),
        atol=1e-6,
    )


def test_conv_blocks():
    # channel counts must divide the group count (<=8), as in torch GroupNorm
    x = jax.random.normal(KEY, (2, 20, 8))
    for mod in [DepthwiseSeparableConv(8, 16), ConvBlock(8, 16)]:
        params = mod.init(KEY, x)
        assert mod.apply(params, x).shape == (2, 20, 16)
    small = ConvBlock(8, 4)  # out_ch < 8 -> num_groups = out_ch
    params = small.init(KEY, x)
    assert small.apply(params, x).shape == (2, 20, 4)


def test_transformer_block():
    mod = DiffusionTransformerBlock(
        dim=16, heads=4, ffn_mult=2, dropout=0.0, use_adaln=True, window_size=4
    )
    x = jax.random.normal(KEY, (2, 9, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    params = mod.init(KEY, x, ctx, cond)
    y = mod.apply(params, x, ctx, cond)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
