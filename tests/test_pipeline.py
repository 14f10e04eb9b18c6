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

# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = pytest.mark.slow


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


def test_refine_batch_rows_match_single(tiny_pipeline):
    # The serving scheduler's contract (serving.py::LongFormScheduler): rows
    # of the batched refine are pure functions of their own inputs — per-row
    # PRNG keys, per-row inpaint flags — so a chunk refined in a shared
    # batch (here with a padding row and mixed flags) equals the same chunk
    # refined alone.
    cfg, pipe = tiny_pipeline
    T, M = pipe.chunk_frames, cfg.n_mels
    S = pipe.chunk_samples // 320
    kw = dict(strength=0.3, steps=3, cfg_scale=2.0)

    rows = []
    for i in range(3):
        kx, kz, kk, kr = jax.random.split(jax.random.PRNGKey(10 + i), 4)
        rows.append((
            jax.random.normal(kx, (1, T, M)),
            jax.random.normal(kz, (1, S, cfg.semantic_dim)),
            jax.random.normal(kk, (1, T, M)),
            i % 2 == 0,  # mixed inpaint flags within one batch
            kr,
        ))
    x = jnp.concatenate([r[0] for r in rows] + [jnp.zeros_like(rows[0][0])])
    z = jnp.concatenate([r[1] for r in rows] + [jnp.zeros_like(rows[0][1])])
    kn = jnp.concatenate([r[2] for r in rows] + [jnp.zeros_like(rows[0][2])])
    hv = jnp.asarray([r[3] for r in rows] + [False])
    ks = jnp.stack([r[4] for r in rows] + [rows[0][4]])
    batched = np.asarray(pipe.refine_chunk_batch(x, z, kn, hv, ks, **kw))

    for i, (xi, zi, kni, hi, ki) in enumerate(rows):
        solo = np.asarray(pipe.refine_chunk_batch(
            xi, zi, kni, jnp.asarray([hi]), ki[None], **kw
        ))
        np.testing.assert_allclose(
            batched[i], solo[0], rtol=1e-5, atol=1e-6
        )


def test_refine_keys_variant_matches_x_variant(tiny_pipeline):
    # The dispatch-minimal serving surface (refine_chunk_batch_keys) draws
    # the coarse noise on-device from per-row keys; row i must equal
    # refine_chunk_batch fed x_coarse[i] = normal(k_noise[i], (1, T, M)).
    cfg, pipe = tiny_pipeline
    T, M = pipe.chunk_frames, cfg.n_mels
    S = pipe.chunk_samples // 320
    kw = dict(strength=0.3, steps=3, cfg_scale=2.0)

    k_noise = jax.random.split(jax.random.PRNGKey(42), 2)
    k_ref = jax.random.split(jax.random.PRNGKey(43), 2)
    z = jax.random.normal(jax.random.PRNGKey(44), (2, S, cfg.semantic_dim))
    kn = jax.random.normal(jax.random.PRNGKey(45), (2, T, M))
    hv = jnp.asarray([True, False])

    from_keys = np.asarray(pipe.refine_chunk_batch_keys(
        np.asarray(k_noise), np.asarray(z), np.asarray(kn),
        np.asarray(hv), np.asarray(k_ref), **kw
    ))
    x = jnp.concatenate(
        [jax.random.normal(k, (1, T, M)) for k in k_noise], axis=0
    )
    from_x = np.asarray(pipe.refine_chunk_batch(x, z, kn, hv, k_ref, **kw))
    np.testing.assert_allclose(from_keys, from_x, rtol=1e-5, atol=1e-6)


def test_refine_mesh_sharded_matches_single_device(tiny_pipeline):
    # A meshed pipeline shards refine rows over the data axis; outputs must
    # equal the single-device program row for row, including when the row
    # count needs internal padding to the quantum (B=1 single-stream path).
    from edge_diffusion_tts_tpu.parallel.mesh import make_mesh

    cfg, pipe = tiny_pipeline
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    pipe_m = LongFormPipeline(
        cfg, pipe.schedule, pipe.decoder_apply, pipe.decoder_params,
        encoder_apply=pipe.encoder_apply, encoder_params={},
        chunk_seconds=0.5, overlap_seconds=0.125, mesh=mesh,
    )
    assert pipe_m.row_quantum == 4
    T, M = pipe.chunk_frames, cfg.n_mels
    S = pipe.chunk_samples // 320
    kw = dict(strength=0.3, steps=2, cfg_scale=2.0)

    k_noise = np.asarray(jax.random.split(jax.random.PRNGKey(50), 4))
    k_ref = np.asarray(jax.random.split(jax.random.PRNGKey(51), 4))
    z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(52), (4, S, cfg.semantic_dim))
    )
    kn = np.asarray(jax.random.normal(jax.random.PRNGKey(53), (4, T, M)))
    hv = np.asarray([True, False, True, False])

    sharded = np.asarray(
        pipe_m.refine_chunk_batch_keys(k_noise, z, kn, hv, k_ref, **kw)
    )
    single = np.asarray(
        pipe.refine_chunk_batch_keys(k_noise, z, kn, hv, k_ref, **kw)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    # B=1 pads internally to the quantum and slices back.
    one = np.asarray(pipe_m.refine_chunk_batch_keys(
        k_noise[:1], z[:1], kn[:1], hv[:1], k_ref[:1], **kw
    ))
    assert one.shape == (1, T, M)
    np.testing.assert_allclose(one, single[:1], rtol=1e-5, atol=1e-6)

    # The whole streaming pipeline runs unchanged on a meshed pipe.
    wav = (0.1 * np.sin(np.arange(int(0.8 * cfg.sample_rate)) / 30)).astype(
        np.float32
    )
    segs_m = [
        s for s, _ in pipe_m.generate_streaming(
            wav, rng=jax.random.PRNGKey(9), **kw
        )
    ]
    segs_1 = [
        s for s, _ in pipe.generate_streaming(
            wav, rng=jax.random.PRNGKey(9), **kw
        )
    ]
    np.testing.assert_allclose(
        np.concatenate(segs_m, axis=1), np.concatenate(segs_1, axis=1),
        rtol=1e-5, atol=1e-6,
    )


def test_stream_prep_matches_unfused_oracles(tiny_pipeline):
    # stream_prep's fused program must be bit-identical to the unfused
    # pieces it replaced: encode_global, per-chunk
    # normalize_mel(mel_frontend(chunk)) stats, and the sequential
    # rng, k_noise, k_ref = split(rng, 3) chain.
    cfg, pipe = tiny_pipeline
    wav = (
        0.2 * np.sin(2 * np.pi * 220 * np.arange(int(0.9 * cfg.sample_rate))
                     / cfg.sample_rate)
    ).astype(np.float32).reshape(1, -1)
    rng = jax.random.PRNGKey(5)
    z, mean, std, kns, krs = pipe.stream_prep(wav, rng)

    np.testing.assert_array_equal(
        z, np.asarray(pipe.encode_global(jnp.asarray(wav)))
    )
    n = max(1, int(np.ceil(
        (wav.shape[1] - pipe.overlap_samples) / pipe.hop_samples
    )))
    assert mean.shape == std.shape == (n, 1, cfg.n_mels)
    assert kns.shape == krs.shape == (n, 2)
    from edge_diffusion_tts_tpu.utils.audio import normalize_mel
    r = rng
    for i in range(n):
        s0 = i * pipe.hop_samples
        chunk = np.zeros((1, pipe.chunk_samples), np.float32)
        c = wav[0, s0 : s0 + pipe.chunk_samples]
        chunk[0, : c.shape[0]] = c
        _, m_i, s_i = normalize_mel(pipe.mel_frontend(jnp.asarray(chunk)))
        # rtol absorbs last-ulp XLA fusion differences: the fused program
        # schedules the mel reductions differently than the standalone call.
        np.testing.assert_allclose(
            mean[i : i + 1], np.asarray(m_i), rtol=1e-6
        )
        np.testing.assert_allclose(
            std[i : i + 1], np.asarray(s_i), rtol=1e-6
        )
        r, kn, kr = jax.random.split(r, 3)
        np.testing.assert_array_equal(kns[i], np.asarray(kn))
        np.testing.assert_array_equal(krs[i], np.asarray(kr))


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


def test_streaming_overlap_add_oracle(tiny_pipeline, monkeypatch):
    """The chunk-assembly logic (slicing, triangular crossfade, overlap-add,
    finalization boundaries, weight renormalization) checked against an
    INDEPENDENT numpy oracle with the diffusion model patched out — a real
    guard now that generate() is implemented by draining
    generate_streaming()."""
    from edge_diffusion_tts_tpu.utils.audio import (
        denormalize_mel,
        normalize_mel,
    )

    cfg, pipe = tiny_pipeline
    secs = 1.1
    wav = 0.2 * np.sin(
        2 * np.pi * 250 * np.arange(int(secs * cfg.sample_rate))
        / cfg.sample_rate
    ).astype(np.float32)

    def fake_refine(k_noise, z_chunk, known_mel, have, rngs, **kw):
        # Deterministic, chunk-distinguishable stand-in for the model:
        # a linear ramp over frames offset by the chunk's z slice sum
        # (so chunks differ and window blending is actually exercised).
        # Signature = refine_chunk_batch_keys (the surface
        # generate_streaming drives).
        ramp = jnp.linspace(-1.0, 1.0, known_mel.shape[1])[None, :, None]
        return jnp.broadcast_to(
            ramp, known_mel.shape
        ) + 0.01 * jnp.sum(z_chunk)

    monkeypatch.setattr(pipe, "refine_chunk_batch_keys", fake_refine)

    chunks = list(
        pipe.generate_streaming(wav, steps=1, rng=jax.random.PRNGKey(0))
    )
    streamed = np.concatenate([seg for seg, _ in chunks], axis=1)

    # ---- independent oracle -------------------------------------------------
    w = wav.reshape(1, -1)
    total = w.shape[1]
    total_frames = total // cfg.hop_length + 1
    num_chunks = max(
        1, int(np.ceil((total - pipe.overlap_samples) / pipe.hop_samples))
    )
    assert num_chunks >= 3, "test wav must span several chunks"
    cf, fade = pipe.chunk_frames, pipe.overlap_frames
    window = np.ones((1, cf), np.float32)
    window[0, :fade] = np.linspace(0, 1, fade)
    window[0, -fade:] = np.linspace(1, 0, fade)

    z_global = pipe.encode_global(jnp.asarray(w))
    sem_per_chunk = pipe.chunk_samples // 320
    acc = np.zeros((cfg.n_mels, total_frames + cf), np.float32)
    wsum = np.zeros((1, total_frames + cf), np.float32)
    for i in range(num_chunks):
        s0 = i * pipe.hop_samples
        chunk = w[:, s0 : s0 + pipe.chunk_samples]
        if chunk.shape[1] < pipe.chunk_samples:
            chunk = np.pad(
                chunk, ((0, 0), (0, pipe.chunk_samples - chunk.shape[1]))
            )
        lat0 = s0 // 320
        z_chunk = z_global[:, lat0 : lat0 + sem_per_chunk, :]
        if z_chunk.shape[1] < sem_per_chunk:
            z_chunk = jnp.pad(
                z_chunk,
                ((0, 0), (0, sem_per_chunk - z_chunk.shape[1]), (0, 0)),
            )
        x_ref = fake_refine(
            None, z_chunk, jnp.zeros((1, cf, cfg.n_mels), jnp.float32),
            None, None,
        )
        _, mean, std = normalize_mel(pipe.mel_frontend(jnp.asarray(chunk)))
        lin = np.asarray(jnp.exp(denormalize_mel(x_ref, mean, std)))[0].T
        f0 = i * pipe.hop_frames
        # Boundary chunks keep full weight at the sequence edges (pipeline
        # .py: a fade against no neighbor would emit weight-0 edge frames
        # as silence).
        win = window.copy()
        if i == 0:
            win[0, :fade] = 1.0
        if i == num_chunks - 1:
            win[0, -fade:] = 1.0
        acc[:, f0 : f0 + cf] += lin * win
        wsum[:, f0 : f0 + cf] += win
    expected = acc[:, :total_frames] / np.clip(
        wsum[:, :total_frames], 1e-5, None
    )

    assert streamed.shape == expected.shape == (cfg.n_mels, total_frames)
    # rtol absorbs last-ulp exp() differences: ChunkStream denormalizes on
    # host (np.exp), the oracle on device (XLA exp).
    np.testing.assert_allclose(streamed, expected, rtol=1e-5, atol=1e-5)
    # The first frame is real generated mel (linear mel is exp() > 0), not
    # the exact-zero silence a fade-to-zero against no neighbor produced.
    assert np.abs(streamed[:, 0]).max() > 0.0
    assert np.abs(streamed[:, -1]).max() > 0.0


@pytest.mark.parametrize("secs", [2.0, 3.5])
def test_streaming_audio_default_geometry_covers_input(secs):
    """Regression: at the DEFAULT chunk geometry (2 s / 0.5 s, where
    overlap_frames > ctx_frames) the final increment used to fall outside
    the fixed render-window lookback — a 2.0 s input yielded 160 samples
    and a 3.5 s input lost its last ~2 s.  The stream must cover the whole
    utterance with contiguous offsets for any input length."""
    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=50, dropout=0.0)
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    def encoder_apply(_, wav):
        S = wav.shape[-1] // 320
        return jnp.zeros((wav.shape[0], S, cfg.semantic_dim), jnp.float32)

    pipe = LongFormPipeline(
        cfg, schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params, encoder_apply=encoder_apply, encoder_params={},
    )
    total = int(secs * cfg.sample_rate)
    t = np.arange(total) / cfg.sample_rate
    wav = (0.2 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
    chunks = list(
        pipe.generate_streaming_audio(
            wav, steps=2, strength=0.3, cfg_scale=1.0,
            rng=jax.random.PRNGKey(1), griffin_lim_iters=4,
        )
    )
    assert chunks and chunks[0][1] == 0
    for (c1, o1), (c2, o2) in zip(chunks, chunks[1:]):
        assert o2 == o1 + c1.shape[0]
    stream = np.concatenate([c for c, _ in chunks])
    assert np.isfinite(stream).all()
    assert abs(stream.shape[0] - total) <= cfg.hop_length, (
        stream.shape[0], total
    )


def test_streaming_audio_mel_equivalence(tiny_pipeline):
    """generate_streaming_audio yields contiguous waveform increments whose
    concatenation tracks the generated mel as closely as the offline
    waveform does.  Sample-exactness vs offline is impossible (Griffin-Lim
    phase is a global fixed point — see the method docstring), so the
    equivalence is held in mel space."""
    cfg, pipe = tiny_pipeline
    secs = 1.2
    rng = jax.random.PRNGKey(7)
    t = np.arange(int(secs * cfg.sample_rate)) / cfg.sample_rate
    wav = (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    mel_lin, offline_wav = pipe.generate(
        wav, steps=2, strength=0.3, cfg_scale=1.0, rng=rng, vocode=True,
        griffin_lim_iters=8,
    )
    chunks = list(
        pipe.generate_streaming_audio(
            wav, steps=2, strength=0.3, cfg_scale=1.0, rng=rng,
            griffin_lim_iters=8,
        )
    )
    assert len(chunks) >= 2, "expected multiple waveform increments"
    # Contiguous offsets starting at zero.
    assert chunks[0][1] == 0
    for (c1, o1), (c2, o2) in zip(chunks, chunks[1:]):
        assert o2 == o1 + c1.shape[0]
    stream = np.concatenate([c for c, _ in chunks])
    assert np.isfinite(stream).all()
    assert abs(stream.shape[0] - offline_wav.shape[0]) <= cfg.hop_length

    # Mel-space equivalence: re-analysis error to the generated mel must be
    # in the same ballpark for streamed and offline renders.
    target_log = np.log(np.clip(mel_lin, 1e-5, None))  # [n_mels, T]
    L = min(stream.shape[0], offline_wav.shape[0])

    def reanalysis_err(w):
        m = np.asarray(pipe.mel_frontend(jnp.asarray(w[None, :L])))[0].T
        T = min(m.shape[1], target_log.shape[1])
        return float(np.abs(m[:, :T] - target_log[:, :T]).mean())

    err_stream = reanalysis_err(stream)
    err_offline = reanalysis_err(np.asarray(offline_wav))
    assert err_stream < 1.5 * err_offline + 0.1, (err_stream, err_offline)


@pytest.fixture(scope="module")
def bucketed_pipes():
    """Two pipes sharing ONE real tiny SemanticEncoder + decoder: one with
    prep_buckets, one without — the wav_len masked-encode path must do real
    work, so the fake zeros-encoder fixture won't do."""
    from edge_diffusion_tts_tpu.models import HubertConfig, SemanticEncoder

    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=50, dropout=0.0,
              use_fsq=True, out_dir="/tmp/edt_test_runs")
    hc = HubertConfig.tiny()
    enc = SemanticEncoder(cfg, hc)
    key = jax.random.PRNGKey(0)
    variables = enc.init(
        {"params": key, "dropout": key, "vq": key},
        jnp.zeros((1, 3200)), train=False,
    )
    decoder = EdgeDiffusionDecoder(cfg)
    dec_params = init_decoder_params(decoder, key, cfg)["params"]
    # Zero-init heads make a fresh decoder output exactly 0 regardless of
    # conditioning; perturb so the refine actually responds to z.
    leaves = jax.tree_util.tree_leaves_with_path(dec_params)
    dec_params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(dec_params),
        [
            l + 0.02 * jax.random.normal(jax.random.fold_in(key, i), l.shape)
            for i, (_, l) in enumerate(leaves)
        ],
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    def encoder_apply(v, w, **kw):
        return enc.apply(v, w, train=False, **kw)[0]

    def mk(buckets):
        return LongFormPipeline(
            cfg, schedule,
            lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
            dec_params,
            encoder_apply=encoder_apply, encoder_params=variables,
            chunk_seconds=0.5, overlap_seconds=0.125,
            prep_buckets=buckets,
            sem_stride=hc.total_stride,
        )

    sr = cfg.sample_rate
    return cfg, mk(None), mk((int(0.8 * sr), int(1.6 * sr)))


def test_stream_prep_bucketed_matches_exact(bucketed_pipes):
    # Bucketed prep (wav padded to the bucket + traced wav_len through the
    # masked HuBERT forward) row-matches the per-length exact program: PRNG
    # chain bit-equal, chunk stats bit-equal, features equal to float
    # accumulation order; padded semantic frames are zeroed.
    cfg, pipe, pipe_b = bucketed_pipes
    rng = jax.random.PRNGKey(7)
    for secs in (0.7, 1.3):
        T = int(secs * cfg.sample_rate)
        wav = (0.2 * np.sin(
            2 * np.pi * 220 * np.arange(T) / cfg.sample_rate
        )).astype(np.float32).reshape(1, -1)
        z, mean, std, kns, krs = pipe.stream_prep(wav, rng)
        zb, mean_b, std_b, kns_b, krs_b = pipe_b.stream_prep(wav, rng)
        assert mean_b.shape == mean.shape  # host slicing to true chunk count
        np.testing.assert_array_equal(kns_b, kns)
        np.testing.assert_array_equal(krs_b, krs)
        np.testing.assert_allclose(mean_b, mean, rtol=1e-6)
        np.testing.assert_allclose(std_b, std, rtol=1e-6)
        S = z.shape[1]
        np.testing.assert_allclose(
            zb[:, :S], z, rtol=1e-4, atol=1e-5
        )
        assert np.all(zb[:, S:] == 0.0)
    # Bucketing bounds the compile surface: a THIRD wav length that lands in
    # an already-compiled bucket must not trace a new program.  Counted by
    # shadowing the program body (it only runs while tracing), not via
    # private jit cache APIs.
    traces = []
    orig_impl = pipe_b._prep_impl
    pipe_b._prep_impl = lambda *a, **kw: (traces.append(1), orig_impl(*a, **kw))[1]
    try:
        T3 = int(0.6 * cfg.sample_rate)  # same 0.8 s bucket as the 0.7 s wav
        wav3 = (0.2 * np.sin(
            2 * np.pi * 180 * np.arange(T3) / cfg.sample_rate
        )).astype(np.float32).reshape(1, -1)
        z3, mean3, std3, kns3, krs3 = pipe_b.stream_prep(wav3, rng)
        z3e, _, _, kns3e, _ = pipe.stream_prep(wav3, rng)
    finally:
        del pipe_b._prep_impl
    assert traces == [], "same-bucket length must reuse the compiled program"
    np.testing.assert_array_equal(kns3, kns3e)
    S3 = z3e.shape[1]
    np.testing.assert_allclose(z3[:, :S3], z3e, rtol=1e-4, atol=1e-5)


def test_generate_streaming_bucketed_matches_exact(bucketed_pipes):
    # End to end through ChunkStream: a bucketed pipe streams the same mel
    # increments as the per-length pipe (up to the encode's accumulation
    # -order noise through the refine).
    cfg, pipe, pipe_b = bucketed_pipes
    T = int(0.7 * cfg.sample_rate)
    wav = (0.2 * np.sin(
        2 * np.pi * 330 * np.arange(T) / cfg.sample_rate
    )).astype(np.float32)
    kw = dict(steps=2, strength=0.4, cfg_scale=1.0)
    a = list(pipe.generate_streaming(wav, rng=jax.random.PRNGKey(3), **kw))
    b = list(pipe_b.generate_streaming(wav, rng=jax.random.PRNGKey(3), **kw))
    assert [off for _, off in a] == [off for _, off in b]
    for (sa, _), (sb, _) in zip(a, b):
        np.testing.assert_allclose(sa, sb, rtol=2e-3, atol=2e-4)


def test_stream_prep_oversize_falls_back(bucketed_pipes):
    # A wav longer than the largest bucket is still served: it warns and
    # falls back to the per-length program instead of raising at request
    # time (the pre-r4 behavior was a hard ValueError).
    cfg, pipe, pipe_b = bucketed_pipes
    T = int(2.0 * cfg.sample_rate)  # largest bucket is 1.6 s
    wav = (0.2 * np.sin(
        2 * np.pi * 200 * np.arange(T) / cfg.sample_rate
    )).astype(np.float32).reshape(1, -1)
    with pytest.warns(UserWarning, match="exceeds the largest prep bucket"):
        zb, mean_b, std_b, kns_b, _ = pipe_b.stream_prep(
            wav, jax.random.PRNGKey(5)
        )
    z, mean, std, kns, _ = pipe.stream_prep(wav, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(kns_b, kns)
    np.testing.assert_allclose(zb, z, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mean_b, mean, rtol=1e-6)


# (the pre-r4 behavior — oversize wavs raising ValueError — was replaced by
# the warn-and-fall-back path, tested in test_stream_prep_oversize_falls_back)


def test_sem_stride_mismatch_guard(tiny_pipeline):
    """An encoder emitting latents at a different rate than pipe.sem_stride
    must fail LOUDLY at prep fetch, not silently slice the wrong features
    (HubertConfig.tiny emits at stride 20, the production stack at 320)."""
    from edge_diffusion_tts_tpu.pipeline import ChunkStream

    cfg, pipe = tiny_pipeline
    bad = LongFormPipeline(
        cfg, pipe.schedule, pipe.decoder_apply, pipe.decoder_params,
        # 1 latent per 20 samples, i.e. 16x what sem_stride=320 expects.
        encoder_apply=lambda _, wav: jnp.zeros(
            (wav.shape[0], wav.shape[-1] // 20, cfg.semantic_dim)
        ),
        encoder_params={},
        chunk_seconds=0.5, overlap_seconds=0.125,
    )
    wav = np.zeros((1, 8000), np.float32)
    st = ChunkStream(bad, wav, steps=2)
    with pytest.raises(ValueError, match="sem_stride"):
        st.next_job()
    # The matched-rate pipeline accepts the same wav.
    ChunkStream(pipe, wav, steps=2).next_job()


def test_hubert_tiny320_total_stride():
    from edge_diffusion_tts_tpu.models.hubert import (
        HubertConfig, conv_frame_lengths,
    )

    hc = HubertConfig.tiny320()
    assert hc.total_stride == 320
    assert HubertConfig().total_stride == 320   # hubert-base
    assert HubertConfig.tiny().total_stride == 20
    # Frame math agrees with the real base stack at the chunk size.
    assert conv_frame_lengths(hc, 32000)[-1] == conv_frame_lengths(
        HubertConfig(), 32000
    )[-1]
