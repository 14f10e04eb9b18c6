"""Data pipeline: resample parity host-vs-device, collate shapes, loader
determinism, LJSpeech split logic (on a synthetic mini dataset)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.data import (
    Collate,
    CollatePrecomputed,
    DataLoader,
    LJSpeechDataset,
    load_wav,
    resample_np,
)
from edge_diffusion_tts_tpu.ops.resample import resample


def _write_wav(path, wav, sr):
    from scipy.io import wavfile

    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def mini_ljspeech(tmp_path_factory):
    root = tmp_path_factory.mktemp("LJSpeech-1.1")
    os.makedirs(root / "wavs", exist_ok=True)
    rng = np.random.RandomState(0)
    n = 24
    with open(root / "metadata.csv", "w") as f:
        for i in range(n):
            uid = f"LJ000-{i:04d}"
            f.write(f"{uid}|text|text\n")
            wav = 0.3 * np.sin(
                2 * np.pi * 220 * np.arange(22050 + i * 500) / 22050
            ).astype(np.float32)
            _write_wav(str(root / "wavs" / f"{uid}.wav"), wav, 22050)
    return str(root)


def test_resample_host_matches_device():
    wav = np.random.RandomState(0).randn(4410).astype(np.float32)
    host = resample_np(wav, 22050, 16000)
    dev = np.asarray(resample(jnp.asarray(wav), 22050, 16000))
    np.testing.assert_allclose(host, dev, atol=1e-5)


def test_load_wav_int16(mini_ljspeech):
    wav, sr = load_wav(os.path.join(mini_ljspeech, "wavs", "LJ000-0000.wav"))
    assert sr == 22050
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0


def test_split_deterministic_and_disjoint(mini_ljspeech):
    tr1 = LJSpeechDataset(mini_ljspeech, "train")
    tr2 = LJSpeechDataset(mini_ljspeech, "train")
    va = LJSpeechDataset(mini_ljspeech, "val")
    assert tr1.ids == tr2.ids
    assert set(tr1.ids).isdisjoint(va.ids)
    assert len(tr1) + len(va) == 24
    assert len(va) == int(24 * 0.05)  # reference split math, no max(1, .)


def test_collate_shapes(mini_ljspeech):
    cfg = CFG(segment_secs=0.5)
    ds = LJSpeechDataset(mini_ljspeech, "train")
    col = Collate(cfg)
    batch = col([ds[0], ds[1]])
    assert batch["wav"].shape == (2, cfg.segment_len)
    assert batch["wav"].dtype == np.float32
    assert np.abs(batch["wav"]).max() <= 1.0


def test_loader_iterates_and_shuffles(mini_ljspeech):
    cfg = CFG(segment_secs=0.25)
    ds = LJSpeechDataset(mini_ljspeech, "train")
    loader = DataLoader(ds, batch_size=4, collate=Collate(cfg), seed=7)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert all(b["wav"].shape == (4, cfg.segment_len) for b in batches)
    # distinct epochs see different order but same loader works repeatedly
    batches2 = list(loader)
    assert len(batches2) == len(batches)


def test_loader_workers_preserve_order_and_content(mini_ljspeech):
    """cfg.num_workers wiring: 0 (synchronous), 1 (single prefetch thread)
    and a >1 thread pool must yield bit-identical batches in the same
    order."""
    cfg = CFG(segment_secs=0.25)
    ds = LJSpeechDataset(mini_ljspeech, "train")

    def run(workers):
        loader = DataLoader(
            ds, batch_size=4, collate=Collate(cfg, deterministic=True),
            seed=7, workers=workers,
        )
        return list(loader)

    ref = run(0)
    for w in (1, 3):
        got = run(w)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(
                np.asarray(a["wav"]), np.asarray(b["wav"])
            )


def test_loader_pool_surfaces_reader_errors(mini_ljspeech):
    cfg = CFG(segment_secs=0.25)
    ds = LJSpeechDataset(mini_ljspeech, "train")

    def boom(items):
        raise RuntimeError("collate exploded")

    loader = DataLoader(ds, batch_size=4, collate=boom, workers=2)
    with pytest.raises(RuntimeError, match="collate exploded"):
        list(loader)


def test_collate_precomputed_alignment():
    cfg = CFG(segment_secs=0.5)
    from edge_diffusion_tts_tpu.config import hubert_num_frames

    wav = np.random.RandomState(0).randn(16000).astype(np.float32)
    feats = np.random.RandomState(1).randn(50, 16).astype(np.float32)
    col = CollatePrecomputed(cfg, deterministic=True)
    batch = col([(wav, feats)])
    assert batch["wav"].shape == (1, cfg.segment_len)
    assert batch["hubert_features"].shape == (
        1,
        hubert_num_frames(cfg.segment_len),
        16,
    )


def test_resolve_ljspeech_dir(mini_ljspeech, tmp_path):
    """Explicit existing dir wins; otherwise fall back to data_root/LJSpeech-1.1
    (reference train.py:54); raise with instructions when neither exists."""
    import pytest

    from edge_diffusion_tts_tpu.data.dataset import resolve_ljspeech_dir

    assert resolve_ljspeech_dir(str(mini_ljspeech), "/nonexistent") == str(
        mini_ljspeech
    )
    root = tmp_path / "data"
    root.mkdir()
    (root / "LJSpeech-1.1").symlink_to(mini_ljspeech)
    got = resolve_ljspeech_dir(str(tmp_path / "missing"), str(root))
    assert got == str(root / "LJSpeech-1.1")
    with pytest.raises(FileNotFoundError):
        resolve_ljspeech_dir(str(tmp_path / "missing"), str(tmp_path / "also"))


def test_loader_pin_memory_device_put(mini_ljspeech):
    """pin_memory=True (cfg.pin_memory, reference train.py:63) must yield
    already-on-device batches with values identical to the plain path."""
    import jax

    cfg = CFG(segment_secs=0.25)
    ds = LJSpeechDataset(mini_ljspeech, "train")
    plain = DataLoader(
        ds, batch_size=4, collate=Collate(cfg), shuffle=False, seed=7
    )
    pinned = DataLoader(
        ds, batch_size=4, collate=Collate(cfg), shuffle=False, seed=7,
        pin_memory=True,
    )
    for a, b in zip(plain, pinned):
        assert isinstance(b["wav"], jax.Array)
        np.testing.assert_array_equal(np.asarray(a["wav"]), np.asarray(b["wav"]))


def test_loader_abandoned_iteration_releases_producer():
    """Breaking out of a prefetching DataLoader epoch (what every validation
    loop does after val_batches batches) must release the producer thread
    instead of leaving it blocked on the bounded queue forever."""
    import threading
    import time

    from edge_diffusion_tts_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return i

    loader = DataLoader(
        DS(), batch_size=2, collate=lambda xs: np.asarray(xs),
        shuffle=False, prefetch=2,
    )
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # what a for-loop break does on GC
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer threads leaked"


def test_val_frac_zero_empty_split(mini_ljspeech):
    # precompute_hubert_features relies on val_frac=0.0 covering EVERY
    # utterance (reference split math: n_val = int(len * frac), no max(1,.)).
    full = LJSpeechDataset(mini_ljspeech, split="train", val_frac=0.0)
    val = LJSpeechDataset(mini_ljspeech, split="val", val_frac=0.0)
    assert len(val) == 0
    assert len(full) == 24
