"""EdgeInference API: shapes, determinism, num_steps variants, export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.inference import EdgeInference
from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample


@pytest.fixture(scope="module")
def tiny_inference():
    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=40, dropout=0.0)
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
    )
    return cfg, decoder, params, inf


@pytest.mark.parametrize("num_steps", [1, 2, 4])
def test_generate_mel_shapes(tiny_inference, num_steps):
    cfg, _, _, inf = tiny_inference
    sem_idx = jnp.zeros((2, 25), jnp.int32)
    mel = inf.generate_mel(sem_idx, num_steps=num_steps)
    assert mel.shape == (2, 50, cfg.n_mels)  # T_out = 2 * S
    assert np.isfinite(np.asarray(mel)).all()


def test_generate_mel_deterministic_given_rng(tiny_inference):
    cfg, _, _, inf = tiny_inference
    sem_idx = jnp.zeros((1, 20), jnp.int32)
    rng = jax.random.PRNGKey(7)
    a = inf.generate_mel(sem_idx, num_steps=2, rng=rng)
    b = inf.generate_mel(sem_idx, num_steps=2, rng=rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_from_audio_requires_encoder(tiny_inference):
    cfg, _, _, inf = tiny_inference
    with pytest.raises(ValueError):
        inf.generate_from_audio(jnp.zeros((100,)))


def test_generate_from_audio_encode_is_jit_cached(tiny_inference):
    """The encode path compiles ONCE per wav shape (the HuBERT forward is the
    dominant cost of the batched config; it must not re-trace per call)."""
    cfg, decoder, params, _ = tiny_inference
    traces = []

    def encoder_apply(p, wav):
        traces.append(wav.shape)  # runs only when jit traces
        S = wav.shape[-1] // 320
        return jnp.zeros((wav.shape[0], S), jnp.int32)

    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
        encoder_apply=encoder_apply,
        encoder_params={},
    )
    wav = jnp.zeros((2, 3200), jnp.float32)
    mel1 = inf.generate_from_audio(wav, num_steps=1)
    mel2 = inf.generate_from_audio(wav, num_steps=1)
    assert mel1.shape == mel2.shape == (2, 20, cfg.n_mels)
    assert len(traces) == 1, "same shape must reuse the compiled encode"
    inf.generate_from_audio(jnp.zeros((2, 6400), jnp.float32), num_steps=1)
    assert len(traces) == 2, "new shape triggers exactly one new trace"


def test_export_tflite_roundtrip(tiny_inference, tmp_path):
    """Edge-runtime consumption: the decoder exports to a TFLite flatbuffer
    that a stock tf.lite.Interpreter (no JAX) loads and executes, matching
    the JAX forward (reference capability: ONNX export, utils/export.py)."""
    pytest.importorskip("tensorflow")
    cfg, decoder, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.utils.export import export_tflite, load_tflite

    B, T, S = 1, 20, 10
    path = str(tmp_path / "decoder.tflite")
    export_tflite(cfg, decoder, params, path, batch=B, t_frames=T, s_tokens=S)
    run = load_tflite(path)

    x = np.random.RandomState(0).randn(B, T, cfg.n_mels).astype(np.float32)
    t = np.full((B,), 10, np.int32)
    sem = np.zeros((B, S), np.int32)
    si = np.zeros((B,), np.int32)
    out = run(x, t, sem, si)
    ref = np.asarray(
        decoder.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            sem_idx=jnp.asarray(sem), step_idx=jnp.asarray(si),
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_trim_positional_tables_preserves_module_fields(tiny_inference):
    """The export-time positional-table trim must keep the decoder's other
    constructor fields (dtype, use_pallas) and leave outputs unchanged —
    the trimmed rows are never indexed at the export shape."""
    cfg, _, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.utils.export import _trim_positional_tables

    decoder = EdgeDiffusionDecoder(cfg, dtype=jnp.bfloat16, use_pallas=False)
    T, S = 20, 10
    trimmed = _trim_positional_tables(decoder, T, S)
    assert trimmed is not decoder
    assert trimmed.dtype == jnp.bfloat16
    assert trimmed.use_pallas is False
    assert trimmed.cfg.max_mel_positions == T
    assert trimmed.cfg.max_ctx_positions == S

    x = jnp.asarray(np.random.RandomState(1).randn(1, T, cfg.n_mels), jnp.float32)
    t = jnp.full((1,), 10, jnp.int32)
    sem = jnp.zeros((1, S), jnp.int32)
    si = jnp.zeros((1,), jnp.int32)
    ref = decoder.apply({"params": params}, x, t, sem_idx=sem, step_idx=si)
    out = trimmed.apply({"params": params}, x, t, sem_idx=sem, step_idx=si)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # Already-small tables: no-op, same module returned.
    small = _trim_positional_tables(
        decoder, cfg.max_mel_positions, cfg.max_ctx_positions
    )
    assert small is decoder


def test_export_stablehlo_roundtrip(tiny_inference, tmp_path):
    cfg, decoder, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.utils.export import export_for_edge, load_exported

    path = os.path.join(str(tmp_path), "dec.stablehlo")
    export_for_edge(cfg, decoder, params, path, dynamic=False)
    assert os.path.getsize(path) > 1000
    exported = load_exported(path)
    x = jnp.zeros((1, 200, cfg.n_mels), jnp.float32)
    t = jnp.full((1,), 5, jnp.int32)
    sem = jnp.zeros((1, 100), jnp.int32)
    si = jnp.zeros((1,), jnp.int32)
    out = exported.call(params, x, t, sem, si)
    ref = decoder.apply({"params": params}, x, t, sem_idx=sem, step_idx=si)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_generate_mel_dpmpp_sampler(tiny_inference):
    """sampler='dpmpp' serves through DPM-Solver++ order 2 (v-prediction,
    the v2 serving sampler) and matches the solver called directly."""
    cfg, decoder, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.schedule import DPMSolverPP

    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(
        cfg, schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params, prediction="v", sampler="dpmpp",
    )
    sem_idx = jnp.zeros((1, 20), jnp.int32)
    rng = jax.random.PRNGKey(3)
    mel = inf.generate_mel(sem_idx, num_steps=4, rng=rng)
    assert mel.shape == (1, 40, cfg.n_mels)

    x_T = jax.random.normal(rng, (1, 40, cfg.n_mels), jnp.float32)
    solver = DPMSolverPP(schedule, order=2)

    def model_fn(x, t, si):
        return decoder.apply(
            {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
        )

    want = solver.sample(model_fn, x_T, 4, max_t=schedule.T - 1)
    np.testing.assert_allclose(np.asarray(mel), np.asarray(want), atol=1e-5)

    with pytest.raises(ValueError):
        EdgeInference(cfg, schedule, None, None, sampler="dpmpp")  # eps model


def test_cli_parser():
    from edge_diffusion_tts_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["train", "--batch-size", "8", "--epochs", "2"])
    assert a.command == "train" and a.batch_size == 8 and a.epochs == 2
    a = p.parse_args(["bench"])
    assert a.command == "bench"
    a = p.parse_args(["precompute", "/tmp/x", "--limit", "5"])
    assert a.root == "/tmp/x" and a.limit == 5
    a = p.parse_args(["generate", "/ckpt", "--steps", "2", "--oracle"])
    assert a.checkpoint == "/ckpt" and a.steps == 2 and a.oracle
    a = p.parse_args(["longform", "/ckpt", "/in.wav", "--cfg-scale", "1.5"])
    assert a.wav == "/in.wav" and a.cfg_scale == 1.5
    a = p.parse_args(["longform", "/ckpt", "/in.wav", "--stream"])
    assert a.stream
    a = p.parse_args(["train", "--device", "cpu", "--mesh", "8"])
    assert a.device == "cpu" and a.mesh == "8"
    a = p.parse_args(["train", "--pipeline", "4"])
    assert a.pipeline == 4
    a = p.parse_args(["export", "/ckpt", "--format", "tflite",
                      "--t-frames", "120"])
    assert a.format == "tflite" and a.t_frames == 120


def test_export_tflite_quantized(tiny_inference, tmp_path):
    """Post-training dynamic-range quantization: the quantized flatbuffer is
    materially smaller than the float one, loads on a stock interpreter,
    and its forward tracks the JAX float forward (beyond the reference's
    fp32-only ONNX edge story)."""
    pytest.importorskip("tensorflow")
    cfg, decoder, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.utils.export import export_tflite, load_tflite

    B, T, S = 1, 20, 10
    f32_path = str(tmp_path / "decoder_f32.tflite")
    q_path = str(tmp_path / "decoder_q8.tflite")
    export_tflite(cfg, decoder, params, f32_path, batch=B, t_frames=T,
                  s_tokens=S)
    export_tflite(cfg, decoder, params, q_path, batch=B, t_frames=T,
                  s_tokens=S, quantize="dynamic")
    f32_size = os.path.getsize(f32_path)
    q_size = os.path.getsize(q_path)
    # At tiny scale the flatbuffer is mostly op metadata and fewer weights
    # pattern-match the converter's quantization passes, so assert a
    # meaningful-but-conservative SAVING here; the flagship-scale coverage
    # (60% of param bytes reclaimed, 1.95x smaller) is pinned in
    # QUANT_r03.json via tools/quant_report.py.
    param_bytes = sum(
        int(np.prod(p.shape)) * 4 for p in jax.tree.leaves(params)
    )
    assert f32_size - q_size > 0.1 * param_bytes, (
        f32_size, q_size, param_bytes
    )

    run = load_tflite(q_path)
    x = np.random.RandomState(0).randn(B, T, cfg.n_mels).astype(np.float32)
    t = np.full((B,), 10, np.int32)
    sem = np.zeros((B, S), np.int32)
    si = np.zeros((B,), np.int32)
    out = run(x, t, sem, si)
    ref = np.asarray(
        decoder.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            sem_idx=jnp.asarray(sem), step_idx=jnp.asarray(si),
        )
    )
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    # int8 weights: outputs track the float forward within quantization
    # error; scale the tolerance to the output spread.
    tol = 0.1 * max(float(np.abs(ref).max()), 1e-3)
    assert float(np.abs(out - ref).mean()) < tol


def test_export_tflite_weight_int8(tiny_inference, tmp_path):
    """The shipping edge artifact (VERDICT r4 item 1): selective weight-only
    int8 baked into the TFLite flatbuffer as int8 constants + in-graph
    dequantize.  A stock interpreter must reproduce the JAX dequantized
    forward (the in-budget 8.4e-3 path, QUANT_r05.json) essentially exactly
    — the only difference is kernel rounding — while the flatbuffer carries
    the int8 size saving."""
    pytest.importorskip("tensorflow")
    cfg, decoder, params, _ = tiny_inference
    from edge_diffusion_tts_tpu.utils.export import export_tflite, load_tflite
    from edge_diffusion_tts_tpu.utils.quantize import (
        dequantize_decoder_params, quantize_decoder_params,
    )

    # Zero-init heads quantize trivially; fill with noise so every weight
    # path contributes to the parity check.
    params = jax.tree.map(
        lambda p: p
        + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        params,
    )
    B, T, S = 1, 20, 10
    f32_path = str(tmp_path / "decoder_f32.tflite")
    w8_path = str(tmp_path / "decoder_w8.tflite")
    export_tflite(cfg, decoder, params, f32_path, batch=B, t_frames=T,
                  s_tokens=S)
    export_tflite(cfg, decoder, params, w8_path, batch=B, t_frames=T,
                  s_tokens=S, quantize="weight_int8")
    # int8 constants survived conversion: the weight-int8 flatbuffer must be
    # materially smaller than the float one (flagship ratio ~2x is pinned in
    # QUANT_r05.json; tiny scale is mostly op metadata).
    param_bytes = sum(
        int(np.prod(p.shape)) * 4 for p in jax.tree.leaves(params)
    )
    saved = os.path.getsize(f32_path) - os.path.getsize(w8_path)
    assert saved > 0.3 * param_bytes, (
        os.path.getsize(f32_path), os.path.getsize(w8_path), param_bytes
    )

    run = load_tflite(w8_path)
    rs = np.random.RandomState(0)
    x = rs.randn(B, T, cfg.n_mels).astype(np.float32)
    t = np.full((B,), 10, np.int32)
    sem = rs.randint(0, cfg.effective_codebook_size(), (B, S)).astype(np.int32)
    si = np.zeros((B,), np.int32)
    out = run(x, t, sem, si)

    params_deq = jax.tree.map(
        jnp.asarray,
        dequantize_decoder_params(quantize_decoder_params(params)),
    )
    ref_deq = np.asarray(
        decoder.apply(
            {"params": params_deq}, jnp.asarray(x), jnp.asarray(t),
            sem_idx=jnp.asarray(sem), step_idx=jnp.asarray(si),
        )
    )
    # Same int8 grid, same dequant: stock interpreter == JAX dequantized
    # forward to kernel rounding error.
    assert float(np.abs(out - ref_deq).mean()) < 1e-5 * max(
        float(np.abs(ref_deq).max()), 1.0
    ), float(np.abs(out - ref_deq).mean())


@pytest.mark.slow
def test_generate_sample_vq_checkpoint(tmp_path):
    """demo.generate_sample end-to-end from a use_fsq=False checkpoint: the
    saved VQ codebook (vq_state) must be threaded into the encoder apply —
    previously the flow crashed on the missing collection (and the trained
    codebook was not even in the artifact)."""
    import numpy as np
    from scipy.io import wavfile

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.demo import generate_sample
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.training import init_models
    from edge_diffusion_tts_tpu.training.checkpoint import save_final_model

    cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0, use_fsq=False,
              codebook_size=16, segment_secs=0.2, inference_steps=2,
              out_dir=str(tmp_path))
    _, _, params, vq_state = init_models(
        cfg, jax.random.PRNGKey(0), hubert_cfg=HubertConfig.tiny()
    )
    ckpt = str(tmp_path / "final_vq")
    save_final_model(ckpt, params, cfg, vq_state=vq_state)

    sr = cfg.sample_rate
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr)).astype(
        np.float32
    )
    wav_path = str(tmp_path / "ref.wav")
    wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))

    out, out_sr = generate_sample(
        ckpt, wav_path=wav_path, num_steps=2,
        out_path=str(tmp_path / "gen.wav"),
        hubert_cfg=HubertConfig.tiny(),
    )
    assert out_sr == sr
    assert np.isfinite(out).all() and out.size > 0


def test_weight_int8_quantization_roundtrip_and_budget():
    """Selective per-channel weight-only int8 (utils/quantize.py): >=1.5x
    smaller, e2e 4-step DDIM mel L1 inside the project's 1e-2 budget, and
    the .npz artifact round-trips bit-exactly."""
    import tempfile

    from edge_diffusion_tts_tpu.utils.quantize import (
        dequantize_decoder_params,
        load_quantized,
        quantize_decoder_params,
        save_quantized,
    )

    cfg = CFG(hidden=32, layers=2, heads=2, dropout=0.0, use_fsq=False,
              codebook_size=64, out_dir="/tmp/edt_test_runs")
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    # Zero-init head/AdaLN make a fresh decoder output exactly 0 — perturb
    # to a generic point so the budget assertion has teeth.
    params = jax.tree.map(
        lambda p: p + 0.03 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params,
    )

    q = quantize_decoder_params(params)
    # Sensitive tensors stay f32; bulk kernels are int8 with per-out scales.
    assert any(k.startswith("q8:") for k in q)
    assert any(k == "f32:out_proj/kernel" for k in q)
    assert any("norm1/proj/kernel" in k and k.startswith("f32:") for k in q)

    deq = dequantize_decoder_params(q)
    sched = DiffusionSchedule.create(cfg.diff_steps)
    rng = np.random.RandomState(0)
    x_T = jnp.asarray(rng.randn(1, 24, cfg.n_mels).astype(np.float32))
    sem = jnp.asarray(rng.randint(0, 64, size=(1, 12)))

    def mk(p):
        def f(x, t, si):
            return dec.apply({"params": p}, x, t, sem_idx=sem, step_idx=si)
        return f

    ref = np.asarray(ddim_sample(sched, mk(params), x_T, 4, prediction="v"))
    out = np.asarray(
        ddim_sample(sched, mk(jax.tree.map(jnp.asarray, deq)), x_T, 4,
                    prediction="v")
    )
    l1 = float(np.mean(np.abs(ref - out)))
    assert l1 <= 1e-2, f"weight-int8 e2e mel L1 {l1} exceeds the budget"
    assert l1 > 0  # it IS quantized

    with tempfile.TemporaryDirectory() as d:
        path, report = save_quantized(d + "/dec.npz", params)
        assert report["ratio"] >= 1.5, report
        loaded = load_quantized(path)
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(deq)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0],
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
