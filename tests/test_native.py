"""Native C++ audio ingest: decode parity with scipy, resample parity with
the JAX path, collate behavior (crop/pad/clamp/determinism)."""

import os

import numpy as np
import pytest

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.data.collate import resample_np
from edge_diffusion_tts_tpu.data.native import (
    NativeCollate,
    native_available,
    read_wav_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain to build the native lib"
)


def _write_wav(path, wav, sr):
    from scipy.io import wavfile

    wavfile.write(path, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    paths = []
    for i, n in enumerate([22050, 33000, 11025]):
        wav = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n) / 22050)
        p = str(d / f"u{i}.wav")
        _write_wav(p, wav.astype(np.float32), 22050)
        paths.append(p)
    return paths


def test_read_wav_matches_scipy(wav_dir):
    from scipy.io import wavfile

    for p in wav_dir:
        ours, sr = read_wav_native(p)
        sr_ref, ref = wavfile.read(p)
        ref = ref.astype(np.float32) / 32768.0
        assert sr == sr_ref
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_native_collate_matches_python(wav_dir):
    cfg = CFG(segment_secs=0.5)
    col = NativeCollate(cfg, orig_sr=22050, deterministic=True)
    batch = col(wav_dir)
    assert batch["wav"].shape == (3, cfg.segment_len)

    from scipy.io import wavfile

    for b, p in enumerate(wav_dir):
        _, raw = wavfile.read(p)
        wav = raw.astype(np.float32) / 32768.0
        res = resample_np(wav, 22050, cfg.sample_rate)
        ref = np.zeros(cfg.segment_len, np.float32)
        n = min(len(res), cfg.segment_len)
        ref[:n] = np.clip(res[:n], -1, 1)
        np.testing.assert_allclose(batch["wav"][b], ref, atol=1e-5)


def test_native_collate_random_crop_deterministic_per_seed(wav_dir):
    cfg = CFG(segment_secs=0.25)
    a = NativeCollate(cfg, orig_sr=22050, seed=7)(wav_dir)
    b = NativeCollate(cfg, orig_sr=22050, seed=7)(wav_dir)
    np.testing.assert_array_equal(a["wav"], b["wav"])
    c = NativeCollate(cfg, orig_sr=22050, seed=8)(wav_dir)
    assert not np.array_equal(a["wav"], c["wav"])


def test_native_collate_missing_file_error(wav_dir):
    cfg = CFG(segment_secs=0.25)
    col = NativeCollate(cfg, orig_sr=22050)
    with pytest.raises(IOError):
        col([wav_dir[0], "/nonexistent/file.wav"])


def test_collate_rejects_unexpected_sample_rate(tmp_path):
    """The polyphase kernel encodes a FIXED source rate: a file at any other
    rate must be an error, never a silent wrong-ratio (pitch-shifting)
    resample — the python fallback resamples per-item correctly, so silent
    corruption here would diverge from it."""
    cfg = CFG(segment_secs=0.2, out_dir=str(tmp_path))
    wav = 0.3 * np.sin(2 * np.pi * 300 * np.arange(44100) / 44100)
    p = str(tmp_path / "hi_rate.wav")
    _write_wav(p, wav.astype(np.float32), 44100)
    collate = NativeCollate(cfg, orig_sr=22050, deterministic=True)
    with pytest.raises(IOError, match="hi_rate"):
        collate([p])


def test_read_wav_truncated_is_error(tmp_path):
    """A data chunk shorter than its declared size must be an error (-5),
    not a silent decode to zeros."""
    wav = 0.3 * np.sin(2 * np.pi * 300 * np.arange(8000) / 22050)
    p = str(tmp_path / "t.wav")
    _write_wav(p, wav.astype(np.float32), 22050)
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[: len(blob) // 2])  # truncate mid-data
    with pytest.raises(IOError):
        read_wav_native(p)
