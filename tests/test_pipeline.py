"""Long-form chunked pipeline: refine shapes, inpainting tail continuity,
end-to-end generate on a tiny model, vocode output shape."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
from edge_diffusion_tts_tpu.pipeline import LongFormPipeline
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=50, dropout=0.0)
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    sem_dim = cfg.semantic_dim

    def encoder_apply(_, wav):
        # Fake semantic encoder: 1 feature frame per 320 samples.
        S = wav.shape[-1] // 320
        return jnp.zeros((wav.shape[0], S, sem_dim), jnp.float32)

    pipe = LongFormPipeline(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
        encoder_apply=encoder_apply,
        encoder_params={},
        chunk_seconds=0.5,
        overlap_seconds=0.125,
    )
    return cfg, pipe


def test_refine_chunk_shapes_and_finite(tiny_pipeline):
    cfg, pipe = tiny_pipeline
    x = jax.random.normal(jax.random.PRNGKey(1), (1, pipe.chunk_frames, cfg.n_mels))
    sem = jnp.zeros((1, pipe.chunk_samples // 320, cfg.semantic_dim))
    out = pipe.refine_chunk(x, sem, steps=3, strength=0.3, cfg_scale=2.0)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_refine_chunk_keeps_known_overlap(tiny_pipeline):
    cfg, pipe = tiny_pipeline
    x = jax.random.normal(jax.random.PRNGKey(2), (1, pipe.chunk_frames, cfg.n_mels))
    sem = jnp.zeros((1, pipe.chunk_samples // 320, cfg.semantic_dim))
    known = jnp.ones((1, pipe.overlap_frames, cfg.n_mels)) * 0.5
    out = pipe.refine_chunk(x, sem, known_mel=known, steps=3, strength=0.3)
    # The known overlap region is re-imposed exactly at the end.
    np.testing.assert_allclose(
        np.asarray(out[:, : pipe.overlap_frames, :]), 0.5, atol=1e-6
    )


def test_generate_streaming_matches_offline(tiny_pipeline):
    """Streaming increments concatenate to exactly the offline mel."""
    cfg, pipe = tiny_pipeline
    secs = 1.2
    wav = 0.2 * np.sin(
        2 * np.pi * 300 * np.arange(int(secs * cfg.sample_rate)) / cfg.sample_rate
    ).astype(np.float32)
    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)
    offline, _ = pipe.generate(wav, vocode=False, rng=jax.random.PRNGKey(3), **kw)
    chunks = list(pipe.generate_streaming(wav, rng=jax.random.PRNGKey(3), **kw))
    assert len(chunks) >= 2
    offsets = [off for _, off in chunks]
    assert offsets[0] == 0 and all(
        b > a for a, b in zip(offsets, offsets[1:])
    )
    streamed = np.concatenate([seg for seg, _ in chunks], axis=1)
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_generate_end_to_end(tiny_pipeline):
    cfg, pipe = tiny_pipeline
    secs = 1.2
    wav = 0.2 * np.sin(
        2 * np.pi * 300 * np.arange(int(secs * cfg.sample_rate)) / cfg.sample_rate
    ).astype(np.float32)
    mel, out_wav = pipe.generate(
        wav, steps=2, strength=0.3, cfg_scale=1.0, vocode=True,
        griffin_lim_iters=4,
    )
    total_frames = wav.shape[0] // cfg.hop_length + 1
    assert mel.shape == (cfg.n_mels, total_frames)
    assert np.isfinite(mel).all()
    assert out_wav is not None and np.isfinite(out_wav).all()
