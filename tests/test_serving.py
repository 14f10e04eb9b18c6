"""Serving tests: exact variable-length batching + micro-batcher behavior.

The core claim: padding requests to a bucket and masking the tail gives
EACH row numerics equal to its own unpadded run — batching is a pure
throughput optimization (serving.py; decoder sem_mask/mel_mask).
"""

import base64
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
from edge_diffusion_tts_tpu.inference import EdgeInference

# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = pytest.mark.slow
from edge_diffusion_tts_tpu.serving import (
    MicroBatcher,
    pick_bucket,
    request_tts,
    serve_tcp,
)

KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    kw.setdefault("hidden", 32)
    kw.setdefault("layers", 2)
    kw.setdefault("heads", 2)
    kw.setdefault("dropout", 0.0)
    kw.setdefault("use_fsq", False)
    kw.setdefault("codebook_size", 64)
    kw.setdefault("out_dir", "/tmp/edt_test_runs")
    return CFG(**kw)


# ---------------------------------------------------------------------------
# Mask exactness
# ---------------------------------------------------------------------------


def test_decoder_mask_exactness():
    # A padded+masked forward must reproduce the unpadded forward on the
    # valid rows: attention is key-masked, everything else is per-position.
    cfg = small_cfg()
    dec = EdgeDiffusionDecoder(cfg)
    S, S_pad = 6, 10
    x = jax.random.normal(KEY, (1, 2 * S, cfg.n_mels))
    t = jnp.array([77])
    sem = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, 64)
    params = init_decoder_params(dec, KEY, cfg)

    ref = dec.apply(params, x, t, sem_idx=sem)

    x_pad = jnp.pad(x, ((0, 0), (0, 2 * (S_pad - S)), (0, 0)),
                    constant_values=3.21)  # junk tail must not leak
    sem_pad = jnp.pad(sem, ((0, 0), (0, S_pad - S)))
    sem_mask = jnp.arange(S_pad)[None, :] < S
    mel_mask = jnp.arange(2 * S_pad)[None, :] < 2 * S
    out = dec.apply(
        params, x_pad, t, sem_idx=sem_pad, sem_mask=sem_mask, mel_mask=mel_mask
    )
    np.testing.assert_allclose(
        np.asarray(out[:, : 2 * S]), np.asarray(ref), atol=1e-5
    )


def test_generate_mel_masked_batch_matches_single():
    # Two requests of different lengths served as one padded masked batch;
    # temperature=0 makes x_T deterministic so rows are comparable with the
    # per-request unpadded programs.
    cfg = small_cfg()
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(cfg, schedule, dec.apply, params)

    lens = (5, 8)
    S_pad = 8
    toks = [
        np.asarray(
            jax.random.randint(jax.random.PRNGKey(i), (n,), 0, 64), np.int32
        )
        for i, n in enumerate(lens)
    ]
    sem_idx = np.zeros((2, S_pad), np.int32)
    sem_mask = np.zeros((2, S_pad), bool)
    for i, tk in enumerate(toks):
        sem_idx[i, : tk.size] = tk
        sem_mask[i, : tk.size] = True

    batched = inf.generate_mel(
        jnp.asarray(sem_idx), num_steps=2, temperature=0.0,
        sem_mask=jnp.asarray(sem_mask),
    )
    for i, tk in enumerate(toks):
        single = inf.generate_mel(
            jnp.asarray(tk[None]), num_steps=2, temperature=0.0
        )
        np.testing.assert_allclose(
            np.asarray(batched[i, : 2 * tk.size]),
            np.asarray(single[0]),
            atol=1e-5,
        )


def test_generate_mel_masked_dpmpp():
    # The masked program variant also serves the DPM-Solver++ sampler
    # (v2-recipe serving): batched masked rows match single unpadded runs.
    cfg = small_cfg(layers=1)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(
        cfg, schedule, dec.apply, params, sampler="dpmpp", prediction="v"
    )
    tk = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (5,), 0, 64), np.int32
    )
    S_pad = 8
    sem_idx = np.zeros((2, S_pad), np.int32)
    sem_mask = np.zeros((2, S_pad), bool)
    sem_idx[0, :5] = tk
    sem_mask[0, :5] = True
    sem_idx[1, :3] = tk[:3]
    sem_mask[1, :3] = True
    batched = inf.generate_mel(
        jnp.asarray(sem_idx), num_steps=2, temperature=0.0,
        sem_mask=jnp.asarray(sem_mask),
    )
    single = inf.generate_mel(jnp.asarray(tk[None]), num_steps=2,
                              temperature=0.0)
    np.testing.assert_allclose(
        np.asarray(batched[0, :10]), np.asarray(single[0]), atol=1e-5
    )


def test_masked_generate_shards_over_mesh():
    # The serving program (masked generate) sharded over the 8-device data
    # axis equals the unsharded program (CLI serve --mesh path).
    from edge_diffusion_tts_tpu.parallel import make_dp_generate
    from edge_diffusion_tts_tpu.parallel.mesh import make_mesh

    cfg = small_cfg(layers=1)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(cfg, schedule, dec.apply, params)

    B, S = 8, 8
    rng = np.random.default_rng(0)
    sem_idx = jnp.asarray(rng.integers(0, 64, (B, S)), jnp.int32)
    sem_mask = jnp.asarray(rng.integers(0, 2, (B, S)) > 0).at[:, 0].set(True)

    prog = inf._build_generate_mel(2, masked=True)
    key = jax.random.PRNGKey(3)
    ref = prog(params, sem_idx, key, jnp.float32(1.0), sem_mask)

    mesh = make_mesh((8, 1))
    with mesh:
        out = make_dp_generate(prog, mesh, masked=True)(
            params, sem_idx, key, jnp.float32(1.0), sem_mask
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# MicroBatcher
# ---------------------------------------------------------------------------


def _fake_generate(sem_idx, sem_mask):
    # Deterministic, shape-faithful stand-in for generate_mel: frame 2t and
    # 2t+1 encode token t so crops are verifiable.
    B, S = sem_idx.shape
    mel = np.repeat(sem_idx.astype(np.float32), 2, axis=1)[..., None]
    return np.broadcast_to(mel, (B, 2 * S, 4)).copy()


def test_pick_bucket():
    assert pick_bucket(1, (4, 8)) == 4
    assert pick_bucket(4, (4, 8)) == 4
    assert pick_bucket(5, (4, 8)) == 8
    with pytest.raises(ValueError):
        pick_bucket(9, (4, 8))


def test_micro_batcher_batches_and_crops():
    calls = []

    def gen(sem_idx, sem_mask):
        calls.append((sem_idx.shape, sem_mask.sum()))
        return _fake_generate(sem_idx, sem_mask)

    mb = MicroBatcher(gen, buckets=(4, 8), max_batch=4, max_wait_ms=100.0)
    try:
        toks = [np.arange(1, n + 1, dtype=np.int32) for n in (2, 3, 4)]
        tickets = [mb.submit(t) for t in toks]
        outs = [t.wait(30.0) for t in tickets]
        for tk, out in zip(toks, outs):
            assert out.shape == (2 * tk.size, 4)
            np.testing.assert_array_equal(out[::2, 0], tk.astype(np.float32))
        # all three requests fit one bucket-4 batch
        assert mb.batches_run == 1
        assert calls[0][0] == (4, 4)
    finally:
        mb.close()


def test_micro_batcher_bucket_split_and_error():
    def gen(sem_idx, sem_mask):
        if sem_idx.shape[1] == 8:
            raise RuntimeError("boom")
        return _fake_generate(sem_idx, sem_mask)

    mb = MicroBatcher(gen, buckets=(4, 8), max_batch=4, max_wait_ms=100.0)
    try:
        ok = mb.submit(np.arange(1, 4, dtype=np.int32))     # bucket 4
        bad = mb.submit(np.arange(1, 7, dtype=np.int32))    # bucket 8 -> boom
        assert ok.wait(30.0).shape == (6, 4)
        with pytest.raises(RuntimeError, match="boom"):
            bad.wait(30.0)
        with pytest.raises(ValueError):
            mb.submit(np.arange(100, dtype=np.int32))  # oversize
    finally:
        mb.close()


def test_micro_batcher_concurrent_load():
    mb = MicroBatcher(
        _fake_generate, buckets=(8,), max_batch=4, max_wait_ms=20.0
    )
    results = {}

    def client(i):
        tk = np.full((3 + (i % 5),), i + 1, np.int32)
        results[i] = (tk, mb.generate(tk, timeout=30.0))

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30.0)
        assert len(results) == 12
        for i, (tk, out) in results.items():
            assert out.shape == (2 * tk.size, 4)
            np.testing.assert_array_equal(out[1::2, 0], tk.astype(np.float32))
        # 12 requests, max_batch 4 -> at least 3 program runs, far fewer than 12
        assert 3 <= mb.batches_run < 12
        s = mb.stats()
        assert s["requests_served"] == 12
        assert 0 < s["mean_batch_occupancy"] <= 1.0
        assert s["mean_batch_ms"] >= 0.0
    finally:
        mb.close()


def test_run_server_end_to_end(tmp_path):
    # Checkpoint -> run_server -> TCP request: the full `serve` CLI flow
    # (restore, bucket-capacity clamp, warmup compile, live request).
    from edge_diffusion_tts_tpu.serving import run_server
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model

    cfg = small_cfg(layers=1, max_ctx_positions=16, max_mel_positions=32)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)["params"]
    ckpt = str(tmp_path / "final")
    save_final_model(ckpt, {"decoder": params, "encoder": {"unused": 0}}, cfg)

    # steps=2, not 1: with this zero-init out_proj decoder the 1-step x0 is
    # sqrt(abar_999)*x_T ~ 0*x_T, which would hide the per-batch noise fold
    # the test below asserts on.
    server, batcher = run_server(
        ckpt, port=0, steps=2, buckets=(8, 64), max_batch=2,
        max_wait_ms=5.0, verbose=False,
    )
    try:
        # bucket 64 exceeds the 16-token positional capacity -> dropped
        assert batcher.buckets == (8,)
        assert batcher.stats()["requests_served"] == 0  # warmup not counted
        # The decoder head is interpreted per the checkpoint's training
        # objective (cfg.use_v_prediction defaults True), NOT per the
        # sampler flag: serving a v-trained model as epsilon would silently
        # denoise garbage.
        assert batcher.inference.prediction == "v"
        host, port = server.server_address
        mel = request_tts([1, 2, 3], host=host, port=port, timeout=120.0)
        assert mel.shape == (6, cfg.n_mels)
        assert np.isfinite(mel).all()
        assert batcher.stats()["requests_served"] == 1
        # Sampling noise folds a fresh per-batch key: the same tokens again
        # draw a new temperature-1.0 sample, not a bit-identical replay.
        mel2 = request_tts([1, 2, 3], host=host, port=port, timeout=120.0)
        assert np.abs(mel2 - mel).max() > 1e-6
    finally:
        server.shutdown()
        batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.asarray([1, 2, 3], np.int32))


def test_run_server_eps_checkpoint(tmp_path):
    # An eps-trained checkpoint (use_v_prediction=False) serves as epsilon.
    from edge_diffusion_tts_tpu.serving import run_server
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model

    cfg = small_cfg(layers=1, max_ctx_positions=16, max_mel_positions=32,
                    use_v_prediction=False)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)["params"]
    ckpt = str(tmp_path / "final_eps")
    save_final_model(ckpt, {"decoder": params, "encoder": {"unused": 0}}, cfg)

    server, batcher = run_server(
        ckpt, port=0, steps=1, buckets=(8,), max_batch=2,
        max_wait_ms=5.0, verbose=False, warmup=False,
    )
    try:
        assert batcher.inference.prediction == "eps"
    finally:
        server.shutdown()
        batcher.close()
    # DPM-Solver++ needs a v/x0 head; EdgeInference's guard must surface.
    with pytest.raises(ValueError, match="v-prediction"):
        run_server(ckpt, port=0, steps=1, buckets=(8,), sampler="dpmpp",
                   verbose=False, warmup=False)


def test_run_server_longform_tiny_hubert(tmp_path):
    # The full `serve --longform` flow from a training checkpoint whose
    # encoder is a tiny HuBERT: run_server must rebuild the SemanticEncoder
    # from the architecture recorded in the artifact (hubert.json,
    # restore_hubert_config) — assuming the full-size default would fail
    # the module/params shape check.
    from edge_diffusion_tts_tpu.models import HubertConfig
    from edge_diffusion_tts_tpu.serving import request_longform, run_server
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model
    from edge_diffusion_tts_tpu.training.train import init_models

    cfg = small_cfg(layers=1, diff_steps=16, segment_secs=0.5, use_fsq=True)
    hc = HubertConfig.tiny()
    _, _, params, vq_state = init_models(cfg, KEY, hc)
    ckpt = str(tmp_path / "final")
    save_final_model(ckpt, params, cfg, vq_state=vq_state or None,
                     hubert_cfg=hc)

    server, batcher = run_server(
        ckpt, port=0, steps=2, buckets=(8,), max_batch=2, max_wait_ms=5.0,
        verbose=False, warmup=False, longform=True,
        chunk_seconds=0.4, overlap_seconds=0.1,
    )
    try:
        host, port = server.server_address
        t = np.arange(int(0.9 * cfg.sample_rate)) / cfg.sample_rate
        wav = (0.2 * np.sin(2 * np.pi * 260 * t)).astype(np.float32)
        segs = list(request_longform(
            wav, host=host, port=port, steps=2, strength=0.3,
            cfg_scale=1.0, seed=3,
        ))
        assert len(segs) >= 1
        total = sum(seg.shape[1] for seg, _ in segs)
        assert total > 0
        assert all(np.isfinite(seg).all() for seg, _ in segs)
        assert all(seg.shape[0] == cfg.n_mels for seg, _ in segs)
    finally:
        server.shutdown()
        batcher.close()


def test_micro_batcher_mixed_buckets_fill():
    # Mixed-bucket traffic must fill each bucket's program: 4 short + 4 long
    # submitted together -> exactly two FULL batches, not four half-empty
    # ones (the gather limit is max_batch PER BUCKET).
    mb = MicroBatcher(
        _fake_generate, buckets=(4, 8), max_batch=4, max_wait_ms=200.0
    )
    try:
        toks = [np.full((3,), i + 1, np.int32) for i in range(4)]
        toks += [np.full((6,), i + 1, np.int32) for i in range(4)]
        tickets = [mb.submit(t) for t in toks]
        outs = [t.wait(30.0) for t in tickets]
        for tk, out in zip(toks, outs):
            assert out.shape == (2 * tk.size, 4)
        assert mb.batches_run == 2
        assert mb.stats()["mean_batch_occupancy"] == 1.0
    finally:
        mb.close()


def test_micro_batcher_bucket_fairness_under_load():
    """Mixed-length traffic across 3 buckets at sustained load: every bucket
    gets service (per-bucket counters), no class starves (each bucket's mean
    latency bounded relative to the others), and the per-bucket stats add up
    (VERDICT r4 item 4; TPU-scale artifact: tools/mixed_loadtest.py)."""
    import time as _time

    def slow_gen(sem_idx, sem_mask):
        _time.sleep(0.004)  # make queueing real so fairness is exercised
        return _fake_generate(sem_idx, sem_mask)

    mb = MicroBatcher(slow_gen, buckets=(4, 8, 16), max_batch=4,
                      max_wait_ms=5.0)
    lats = {4: [], 8: [], 16: []}
    lock = threading.Lock()

    def client(bucket, n_tok, reps):
        for _ in range(reps):
            tk = np.arange(1, n_tok + 1, dtype=np.int32)
            t0 = _time.monotonic()
            out = mb.generate(tk, timeout=60.0)
            dt = _time.monotonic() - t0
            assert out.shape == (2 * n_tok, 4)
            with lock:
                lats[bucket].append(dt)

    try:
        threads = []
        for bucket, n_tok in ((4, 3), (8, 7), (16, 12)):
            threads += [
                threading.Thread(target=client, args=(bucket, n_tok, 6))
                for _ in range(2)
            ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120.0)
        s = mb.stats()
        # every bucket was served, and the per-bucket rows sum to the total
        assert set(s["per_bucket"]) == {"4", "8", "16"}, s["per_bucket"]
        assert sum(
            v["rows"] for v in s["per_bucket"].values()
        ) == s["requests_served"] == 36
        means = {b: float(np.mean(v)) for b, v in lats.items() if v}
        assert len(means) == 3
        # no bucket starves: its mean latency stays within a bounded factor
        # of the fastest class (generous for 1-core CI noise)
        assert max(means.values()) <= 10 * min(means.values()) + 0.05, means
    finally:
        mb.close()


def test_tcp_mixed_short_and_longform_concurrent(longform_server):
    """The two serving workloads claim ONE device at the same time — short
    token requests through the MicroBatcher and streaming long-form through
    the LongFormScheduler — and both classes complete correctly (the
    deployment shape the r4 load tests never exercised together)."""
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, pipe, server = longform_server
    host, port = server.server_address
    t = np.arange(int(0.9 * cfg.sample_rate)) / cfg.sample_rate
    short_results, lf_results, errors = {}, {}, []

    def short_client(i):
        try:
            tk = list(range(1, 4 + (i % 4)))
            short_results[i] = (tk, request_tts(tk, host=host, port=port))
        except Exception as e:  # surfaced below; join() must not hang
            errors.append(f"short{i}: {e}")

    def lf_client(seed):
        try:
            wav = (0.1 * np.sin(2 * np.pi * (250 + 60 * seed) * t)).astype(
                np.float32
            )
            segs = list(request_longform(
                wav, host=host, port=port, seed=seed, steps=2,
                strength=0.3, cfg_scale=1.0,
            ))
            lf_results[seed] = (
                wav, np.concatenate([s for s, _ in segs], axis=1)
            )
        except Exception as e:
            errors.append(f"lf{seed}: {e}")

    threads = [threading.Thread(target=short_client, args=(i,))
               for i in range(6)]
    threads += [threading.Thread(target=lf_client, args=(s,)) for s in (7, 8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    assert len(short_results) == 6 and len(lf_results) == 2
    for tk, mel in short_results.values():
        assert mel.shape == (2 * len(tk), 4)
        np.testing.assert_array_equal(
            mel[1::2, 0], np.asarray(tk, np.float32)
        )
    for seed, (wav, streamed) in lf_results.items():
        offline, _ = pipe.generate(
            wav, vocode=False, rng=jax.random.PRNGKey(seed), steps=2,
            strength=0.3, cfg_scale=1.0,
        )
        np.testing.assert_allclose(streamed, offline, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# TCP transport
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def longform_server():
    # Tiny LongFormPipeline behind the TCP front-end (serve --longform path):
    # micro-batched token requests and streaming long-form requests share
    # one server.
    from edge_diffusion_tts_tpu.pipeline import LongFormPipeline
    from edge_diffusion_tts_tpu.serving import make_longform_fn

    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=50, dropout=0.0,
              out_dir="/tmp/edt_test_runs")
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, KEY, cfg)["params"]

    def encoder_apply(_, wav, **kw):
        # Fake encoder: accepts (and can ignore) wav_len — its output is
        # all-zero, so masking padded frames changes nothing.
        S = wav.shape[-1] // 320
        return jnp.zeros((wav.shape[0], S, cfg.semantic_dim), jnp.float32)

    pipe = LongFormPipeline(
        cfg,
        DiffusionSchedule.create(cfg.diff_steps),
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
        encoder_apply=encoder_apply,
        encoder_params={},
        chunk_seconds=0.5,
        overlap_seconds=0.125,
        # One shared prep program for every stream length: the FIRST submit
        # compiles it, later submits are host-pad + run — which also keeps
        # the matches_solo interleaving assertions robust under CPU
        # contention (per-length prep compiles made streams arrive serially,
        # so ticks degenerated to one row each).
        prep_buckets=(2 * cfg.sample_rate,),
    )
    mb = MicroBatcher(_fake_generate, buckets=(8,), max_batch=2,
                      max_wait_ms=10.0)
    server = serve_tcp(mb, port=0, longform_fn=make_longform_fn(pipe))
    yield cfg, pipe, server
    server.shutdown()
    mb.close()


def test_tcp_longform_stream_matches_offline(longform_server):
    # The streamed mel increments concatenate to exactly the offline
    # generation under the same seed (the per-request PRNG contract).
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, pipe, server = longform_server
    host, port = server.server_address
    secs = 1.2
    wav = 0.2 * np.sin(
        2 * np.pi * 300 * np.arange(int(secs * cfg.sample_rate))
        / cfg.sample_rate
    ).astype(np.float32)
    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)

    segs = list(request_longform(wav, host=host, port=port, seed=7, **kw))
    assert len(segs) >= 2
    offsets = [off for _, off in segs]
    widths = [seg.shape[1] for seg, _ in segs]
    assert offsets[0] == 0
    assert all(
        o2 == o1 + w for o1, o2, w in zip(offsets, offsets[1:], widths)
    )
    streamed = np.concatenate([seg for seg, _ in segs], axis=1)
    offline, _ = pipe.generate(
        wav, vocode=False, rng=jax.random.PRNGKey(7), **kw
    )
    np.testing.assert_allclose(streamed, offline, rtol=1e-5, atol=1e-6)

    # Token micro-batch requests still work on the same server.
    mel = request_tts([5, 6], host=host, port=port, timeout=30.0)
    assert mel.shape == (4, 4)


def test_longform_scheduler_matches_solo(longform_server):
    # Continuous batching preserves the per-request PRNG contract: streams
    # batched together produce exactly what each produces alone under its
    # own seed — and batching genuinely happened (fewer device batches than
    # chunks).  A slowed refine pins the interleaving: stream 1's first
    # chunk runs while 2 and 3 queue, so later ticks carry multiple streams
    # at DIFFERENT chunk indices (the continuous-batching case).
    import time as _time

    from edge_diffusion_tts_tpu.serving import LongFormScheduler

    cfg, pipe, _ = longform_server
    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)
    # Unequal lengths: streams carry different CHUNK COUNTS, so they leave
    # the batch at different ticks and the tail ticks run ragged — the
    # continuous-batching case a fixed-batch design can't serve.
    wavs = {
        seed: (0.1 * np.sin(
            2 * np.pi * (200 + 50 * seed)
            * np.arange(int((0.8 + 0.3 * seed) * cfg.sample_rate))
            / cfg.sample_rate
        )).astype(np.float32)
        for seed in (1, 2, 3)
    }

    real_refine = pipe.refine_chunk_batch_keys

    def slow_refine(*a, **k):
        _time.sleep(0.15)
        return real_refine(*a, **k)

    pipe.refine_chunk_batch_keys = slow_refine
    sched = LongFormScheduler(pipe, max_streams=4)
    try:
        iters = {
            seed: sched.submit(wavs[seed], seed=seed, **kw)
            for seed in wavs
        }
        # Queues buffer every increment, so sequential draining is fine.
        results = {
            seed: np.concatenate([s for s, _ in it], axis=1)
            for seed, it in iters.items()
        }
        assert sched.chunks_run > sched.batches_run  # multi-row batches ran
        assert sched.stats()["mean_row_occupancy"] > 0.4
    finally:
        pipe.refine_chunk_batch_keys = real_refine
        sched.close()

    for seed, wav in wavs.items():
        solo = np.concatenate(
            [
                s
                for s, _ in pipe.generate_streaming(
                    wav, rng=jax.random.PRNGKey(seed), **kw
                )
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            results[seed], solo, rtol=1e-5, atol=1e-6
        )


def test_longform_scheduler_on_mesh_matches_solo(longform_server):
    # A meshed pipeline shards scheduler ticks over the data axis: batches
    # pad to the row quantum (4 devices here), and each stream still equals
    # its solo single-device generation.  max_streams must be a multiple of
    # the quantum.
    from edge_diffusion_tts_tpu.parallel.mesh import make_mesh
    from edge_diffusion_tts_tpu.pipeline import LongFormPipeline
    from edge_diffusion_tts_tpu.serving import LongFormScheduler

    cfg, pipe, _ = longform_server
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    pipe_m = LongFormPipeline(
        cfg, pipe.schedule, pipe.decoder_apply, pipe.decoder_params,
        encoder_apply=pipe.encoder_apply, encoder_params={},
        chunk_seconds=0.5, overlap_seconds=0.125, mesh=mesh,
    )
    with pytest.raises(ValueError, match="row_quantum"):
        LongFormScheduler(pipe_m, max_streams=3)

    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)
    t = np.arange(int(0.8 * cfg.sample_rate)) / cfg.sample_rate
    wavs = {
        seed: (0.1 * np.sin(2 * np.pi * (240 + 70 * seed) * t)).astype(
            np.float32
        )
        for seed in (6, 7)
    }
    sched = LongFormScheduler(pipe_m, max_streams=4)
    try:
        iters = {
            seed: sched.submit(wavs[seed], seed=seed, **kw) for seed in wavs
        }
        results = {
            seed: np.concatenate([s for s, _ in it], axis=1)
            for seed, it in iters.items()
        }
        assert sched.rows_padded % 4 == 0  # every tick a quantum multiple
    finally:
        sched.close()

    for seed, wav in wavs.items():
        solo = np.concatenate(
            [
                s
                for s, _ in pipe.generate_streaming(
                    wav, rng=jax.random.PRNGKey(seed), **kw
                )
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            results[seed], solo, rtol=1e-5, atol=1e-6
        )


def test_longform_scheduler_mixed_signatures_no_starvation(longform_server):
    # Streams with DIFFERENT refine signatures cannot share a device
    # program; the scheduler must round-robin the groups (served streams
    # rotate to the back) so neither signature starves, and each stream
    # still matches its solo generation.
    from edge_diffusion_tts_tpu.serving import LongFormScheduler

    cfg, pipe, _ = longform_server
    secs = 0.8
    t = np.arange(int(secs * cfg.sample_rate)) / cfg.sample_rate
    wav_a = (0.1 * np.sin(2 * np.pi * 230 * t)).astype(np.float32)
    wav_b = (0.1 * np.sin(2 * np.pi * 310 * t)).astype(np.float32)
    kw_a = dict(steps=2, strength=0.3, cfg_scale=1.0)
    kw_b = dict(steps=3, strength=0.4, cfg_scale=2.0)

    sched = LongFormScheduler(pipe, max_streams=4)
    try:
        it_a = sched.submit(wav_a, seed=11, **kw_a)
        it_b = sched.submit(wav_b, seed=12, **kw_b)
        results = {}
        threads = []
        for name, it in (("a", it_a), ("b", it_b)):
            def run(name=name, it=it):
                results[name] = np.concatenate(
                    [s for s, _ in it], axis=1
                )
            th = threading.Thread(target=run)
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=300)
        assert set(results) == {"a", "b"}
    finally:
        sched.close()

    for name, wav, kw, seed in (
        ("a", wav_a, kw_a, 11), ("b", wav_b, kw_b, 12)
    ):
        solo = np.concatenate(
            [
                s
                for s, _ in pipe.generate_streaming(
                    wav, rng=jax.random.PRNGKey(seed), **kw
                )
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            results[name], solo, rtol=1e-5, atol=1e-6
        )


def test_longform_scheduler_warmup_compiles_row_counts(longform_server):
    # warmup() must pre-build the refine program for every row count a tick
    # can emit (1, 2, ..., max_streams cap) so no live tick pays an XLA
    # compile mid-traffic.
    from edge_diffusion_tts_tpu.serving import LongFormScheduler

    cfg, pipe, _ = longform_server
    sched = LongFormScheduler(pipe, max_streams=3)
    try:
        before = set(pipe._refine_jit)
        sched.warmup(steps=2, strength=0.3, cfg_scale=1.0)
        assert (0.3, 2, 1.0, "k") in set(pipe._refine_jit) - before or (
            (0.3, 2, 1.0, "k") in before
        )
        # The compiled fn is shared across row counts (jit re-specializes
        # per shape); warmup must have executed B=1,2,3 without error, and
        # a real submit afterwards still works.
        it = sched.submit(
            np.zeros(int(0.6 * cfg.sample_rate), np.float32),
            steps=2, strength=0.3, cfg_scale=1.0, seed=0,
        )
        segs = list(it)
        assert segs and all(np.isfinite(s).all() for s, _ in segs)
    finally:
        sched.close()


def test_tcp_longform_concurrent_streams(longform_server):
    # Two long-form requests on simultaneous TCP connections each match
    # their own offline generation — the handler threads share the
    # scheduler's batched refine instead of serializing on a device lock.
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, pipe, server = longform_server
    host, port = server.server_address
    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)
    t = np.arange(int(0.9 * cfg.sample_rate)) / cfg.sample_rate
    wavs = {
        seed: (0.1 * np.sin(2 * np.pi * (300 + 80 * seed) * t)).astype(
            np.float32
        )
        for seed in (4, 5)
    }
    results = {}

    def run(seed):
        segs = list(
            request_longform(wavs[seed], host=host, port=port, seed=seed, **kw)
        )
        results[seed] = np.concatenate([s for s, _ in segs], axis=1)

    threads = [
        threading.Thread(target=run, args=(seed,)) for seed in wavs
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert set(results) == set(wavs)

    for seed, wav in wavs.items():
        offline, _ = pipe.generate(
            wav, vocode=False, rng=jax.random.PRNGKey(seed), **kw
        )
        np.testing.assert_allclose(
            results[seed], offline, rtol=1e-5, atol=1e-6
        )


def test_tcp_longform_client_disconnect_mid_stream(longform_server):
    # A client that drops its connection after the first increment must not
    # disturb streams sharing its scheduler batches: the abandoned stream is
    # cancelled (its remaining chunks never scheduled) and the survivor
    # still matches its offline generation exactly.
    import socket as socket_mod

    cfg, pipe, server = longform_server
    host, port = server.server_address
    kw = dict(steps=2, strength=0.3, cfg_scale=1.0)
    t = np.arange(int(1.2 * cfg.sample_rate)) / cfg.sample_rate
    wav_keep = (0.1 * np.sin(2 * np.pi * 270 * t)).astype(np.float32)
    wav_drop = (0.1 * np.sin(2 * np.pi * 350 * t)).astype(np.float32)
    results = {}

    def survivor():
        from edge_diffusion_tts_tpu.serving import request_longform

        segs = list(request_longform(
            wav_keep, host=host, port=port, seed=21, **kw
        ))
        results["keep"] = np.concatenate([s for s, _ in segs], axis=1)

    def dropper():
        wav = np.ascontiguousarray(wav_drop.astype("<f4"))
        req = {"longform": dict(
            kw, seed=22,
            wav_b64=base64.b64encode(wav.tobytes()).decode("ascii"),
        )}
        with socket_mod.create_connection((host, port), timeout=60) as s:
            s.sendall((json.dumps(req) + "\n").encode())
            s.recv(1 << 16)  # first response line(s), then vanish

    th_drop = threading.Thread(target=dropper)
    th_keep = threading.Thread(target=survivor)
    th_drop.start()
    th_keep.start()
    th_drop.join(timeout=120)
    th_keep.join(timeout=300)
    assert "keep" in results

    offline, _ = pipe.generate(
        wav_keep, vocode=False, rng=jax.random.PRNGKey(21), **kw
    )
    np.testing.assert_allclose(results["keep"], offline, rtol=1e-5, atol=1e-6)

    # The scheduler survives and serves new streams afterwards.
    from edge_diffusion_tts_tpu.serving import request_longform

    segs = list(request_longform(
        wav_keep, host=host, port=port, seed=23, **kw
    ))
    assert segs and all(np.isfinite(s).all() for s, _ in segs)


def test_tcp_longform_audio_stream(longform_server):
    # audio=True streams playable 1-D waveform increments with contiguous
    # sample offsets.
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, _, server = longform_server
    host, port = server.server_address
    wav = 0.2 * np.sin(
        2 * np.pi * 220 * np.arange(int(0.9 * cfg.sample_rate))
        / cfg.sample_rate
    ).astype(np.float32)

    segs = list(request_longform(
        wav, host=host, port=port, audio=True, steps=2, strength=0.3,
        cfg_scale=1.0, griffin_lim_iters=4, seed=1,
    ))
    assert len(segs) >= 1
    pos = 0
    for seg, off in segs:
        assert seg.ndim == 1
        assert off == pos
        assert np.isfinite(seg).all()
        pos += seg.shape[0]
    assert 0 < pos <= wav.size


def test_tcp_longform_concurrent_audio_streams(longform_server):
    # Two audio=True streams at once: each handler thread vocodes its own
    # increments (sliding Griffin-Lim windows) while the scheduler batches
    # the mel refines underneath — both must deliver contiguous, finite
    # waveform increments and the SAME waveform as a solo run of the same
    # seed (vocoder keys derive from the request seed alone).
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, _, server = longform_server
    host, port = server.server_address
    kw = dict(
        audio=True, steps=2, strength=0.3, cfg_scale=1.0,
        griffin_lim_iters=4,
    )
    t = np.arange(int(1.0 * cfg.sample_rate)) / cfg.sample_rate
    wavs = {
        seed: (0.15 * np.sin(2 * np.pi * (210 + 90 * seed) * t)).astype(
            np.float32
        )
        for seed in (31, 32)
    }
    results = {}

    def run(seed):
        segs = list(request_longform(
            wavs[seed], host=host, port=port, seed=seed, **kw
        ))
        pos = 0
        for seg, off in segs:
            assert seg.ndim == 1 and off == pos and np.isfinite(seg).all()
            pos += seg.shape[0]
        results[seed] = np.concatenate([s for s, _ in segs])

    threads = [threading.Thread(target=run, args=(s,)) for s in wavs]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert set(results) == set(wavs)

    for seed, wav in wavs.items():
        solo = np.concatenate([
            s for s, _ in request_longform(
                wav, host=host, port=port, seed=seed, **kw
            )
        ])
        np.testing.assert_allclose(results[seed], solo, rtol=1e-5, atol=1e-6)


def test_tcp_longform_unsupported_and_empty(longform_server):
    # A server without longform_fn rejects the request with a clean error;
    # an empty waveform is rejected by the handler.
    from edge_diffusion_tts_tpu.serving import request_longform

    cfg, _, server = longform_server
    host, port = server.server_address
    with pytest.raises(RuntimeError, match="no audio"):
        list(request_longform(np.zeros(0), host=host, port=port))

    mb = MicroBatcher(_fake_generate, buckets=(8,), max_batch=2)
    bare = serve_tcp(mb, port=0)
    try:
        h2, p2 = bare.server_address
        with pytest.raises(RuntimeError, match="longform"):
            list(request_longform(np.zeros(100, np.float32), host=h2, port=p2))
    finally:
        bare.shutdown()
        mb.close()


def test_tcp_round_trip():
    mb = MicroBatcher(
        _fake_generate, buckets=(8,), max_batch=4, max_wait_ms=10.0
    )
    server = serve_tcp(mb, port=0)
    host, port = server.server_address
    try:
        tk = [5, 6, 7]
        mel = request_tts(tk, host=host, port=port, timeout=30.0)
        assert mel.shape == (6, 4)
        np.testing.assert_array_equal(mel[::2, 0], np.float32(tk))
        # plain-JSON transport form matches the binary (default) form
        mel_json = request_tts(tk, host=host, port=port, timeout=30.0,
                               binary=False)
        np.testing.assert_array_equal(mel_json, mel)
        with pytest.raises(RuntimeError, match="ValueError"):
            request_tts([], host=host, port=port, timeout=30.0)
    finally:
        server.shutdown()
        mb.close()


def test_micro_batcher_slo_sheds_overload():
    """max_queue_delay_ms: once the predicted queueing delay exceeds the
    bound, submit() raises Overloaded instead of joining the tail, and
    queue-delay percentiles are reported in stats()."""
    import time as _time

    from edge_diffusion_tts_tpu.serving import Overloaded

    def slow_gen(sem_idx, sem_mask):
        _time.sleep(0.05)
        return _fake_generate(sem_idx, sem_mask)

    mb = MicroBatcher(
        slow_gen, buckets=(8,), max_batch=2, max_wait_ms=1.0,
        max_queue_delay_ms=120.0,
    )
    try:
        # Prime the mean-batch-time estimate (prediction needs >=1 batch).
        mb.generate(np.arange(1, 4, dtype=np.int32), timeout=30.0)

        tickets, shed = [], 0
        for i in range(30):
            try:
                tickets.append(mb.submit(np.arange(1, 4, dtype=np.int32)))
            except Overloaded:
                shed += 1
        assert shed > 0, "sustained overload must shed"
        assert tickets, "the bound admits work up to the SLO"
        for t in tickets:
            t.wait(30.0)
        # Admitted requests were dispatched within a few batch-times of the
        # bound (admission headroom: depth seen at submit), far below the
        # unshedded tail (30 requests x 50 ms / 2 rows ~ 750 ms).
        worst = max(t.queue_delay_ms for t in tickets)
        assert worst < 400.0, f"queue delay {worst} despite shedding"
        s = mb.stats()
        assert s["shed_count"] == shed
        assert "queue_delay_ms" in s and s["queue_delay_ms"]["max"] < 400.0
    finally:
        mb.close()


def test_micro_batcher_oldest_first_bucket_order():
    """Across bucket groups in one gather cycle, the group holding the
    OLDEST ticket runs first (tail bound for big-bucket stragglers that
    would otherwise sort behind every smaller bucket)."""
    import time as _time

    order = []

    def gen(sem_idx, sem_mask):
        order.append(sem_idx.shape[1])
        return _fake_generate(sem_idx, sem_mask)

    # Long gather window so both tickets land in ONE cycle.
    mb = MicroBatcher(gen, buckets=(4, 8), max_batch=2, max_wait_ms=200.0)
    try:
        big = mb.submit(np.arange(1, 7, dtype=np.int32))   # bucket 8, older
        _time.sleep(0.02)
        small = mb.submit(np.arange(1, 3, dtype=np.int32))  # bucket 4, newer
        big.wait(30.0)
        small.wait(30.0)
        assert order == [8, 4], f"bucket order {order} (oldest-first expected)"
    finally:
        mb.close()
