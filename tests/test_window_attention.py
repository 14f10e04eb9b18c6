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


@pytest.mark.parametrize("blk_q,blk_k", [(128, 64), (128, 32), (64, 64)])
def test_banded_mixed_block_sizes(blk_q, blk_k):
    # blk_q != blk_k: the k-tile base must rescale the q-tile index into
    # blk_k units or the band silently truncates (q tile 1 rows 128..255
    # with window 64 must reach keys up to 319).
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 300, 32)
    ours = banded_attention(q, k, v, 64, blk_q=blk_q, blk_k=blk_k)
    mask = local_attention_mask(300, 64)[None, None]
    ref = sdpa(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
    with pytest.raises(ValueError, match="multiple"):
        banded_attention(q, k, v, 64, blk_q=64, blk_k=48)


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


@pytest.mark.slow
def test_decoder_auto_selects_pallas_by_seq_len():
    """cfg.use_flash_attn + cfg.pallas_min_seq_len routing: the decoder's
    self-attention uses the Pallas kernel only at/above the crossover length
    (PALLAS_CROSSOVER_r02.jsonl -> default 3000), and the kernel path is
    numerically equivalent to the XLA path."""
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params

    cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0, attn_window_size=4,
              use_flash_attn=True, pallas_min_seq_len=16)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)

    def fwd(T):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.n_mels))
        t = jnp.zeros((1,), jnp.int32)
        sem = jnp.zeros((1, T // 2), jnp.int32)
        return lambda: dec.apply(params, x, t, sem_idx=sem)

    # Below the crossover: no pallas_call in the lowered program.
    assert "pallas_call" not in str(jax.make_jaxpr(fwd(8))())
    # At/above: the kernel is engaged.
    jaxpr32 = str(jax.make_jaxpr(fwd(32))())
    assert "pallas_call" in jaxpr32

    # And the two routes agree numerically (interpret mode on CPU).
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, cfg.n_mels))
    t = jnp.zeros((1,), jnp.int32)
    sem = jnp.zeros((1, 16), jnp.int32)
    out_pallas = dec.apply(params, x, t, sem_idx=sem)
    dec_xla = EdgeDiffusionDecoder(cfg, use_pallas=False)
    out_xla = dec_xla.apply(params, x, t, sem_idx=sem)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=2e-5
    )


@pytest.mark.slow
def test_decoder_long_sequence_via_raised_position_caps():
    """The default positional tables cap T at 1000 mel frames / 512 context
    tokens (reference parity) — below the measured Pallas crossover of 3000.
    Raising cfg.max_mel_positions / max_ctx_positions must let the decoder
    accept such lengths (otherwise the crossover auto-select could never
    engage in the decoder)."""
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params

    T = 1200
    cfg = CFG(hidden=16, layers=1, heads=2, dropout=0.0, attn_window_size=8,
              max_mel_positions=2048, max_ctx_positions=1024,
              use_flash_attn=False)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.n_mels))
    out = dec.apply(
        params, x, jnp.zeros((1,), jnp.int32),
        sem_idx=jnp.zeros((1, T // 2), jnp.int32),
    )
    assert out.shape == (1, T, cfg.n_mels)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_longform_config_engages_pallas_end_to_end():
    """configs/longform.json is the SHIPPED long-utterance config: at its
    40 s working shape (mel T=4000 >= pallas_min_seq_len=3000) the flagship
    decoder's cfg routing must lower to the banded Pallas kernel, and the
    default 5 s shape must not (bench_all.py config 7 measures the win)."""
    import os

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "longform.json")
    with open(path) as f:
        cfg = CFG.from_json(f.read())
    assert cfg.max_mel_positions >= 4000
    assert cfg.pallas_min_seq_len <= 4000
    dec = EdgeDiffusionDecoder(cfg)  # use_pallas=None -> cfg routing
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)

    def traced(T):
        x = jnp.zeros((1, T, cfg.n_mels))
        t = jnp.zeros((1,), jnp.int32)
        sem = jnp.zeros((1, T // 2), jnp.int32)
        return str(jax.make_jaxpr(
            lambda: dec.apply(params, x, t, sem_idx=sem))())

    assert "pallas_call" in traced(4000)   # the 40 s bench shape
    assert "pallas_call" not in traced(500)  # the 5 s headline shape
