"""Mel-spectrogram frontend in pure JAX (torchaudio-parity numerics).

The reference leans on ``torchaudio.transforms.MelSpectrogram``
(reference: edge_diffusion_tts/data/collate.py:22-32: n_fft 1024, hop 160,
hann window, center/reflect padding, power 2.0, HTK mel scale, norm=None).
Here the STFT is expressed as framing + ``jnp.fft.rfft`` (an XLA FFT HLO,
supported on TPU), so the whole frontend jits and runs on-device (no
torchaudio, no host DSP). FFT is used rather than a matmul-DFT because f32
matmul accumulation over 1024-tap frames loses ~3 decimal digits, which is
visible against the torch.stft parity target; the frontend is not a
performance hotspot (the denoise loop is), so accuracy wins.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * math.pi * n / win_length))
    return w.astype(dtype)


def frame_signal(
    wav: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """[B, T] -> frames [B, num_frames, n_fft] with reflect center-padding.

    Hop-decomposed dense framing: the wav reshapes into hop-length chunks
    and frame t is the concatenation of chunks t..t+K-1 (K = ceil(n_fft /
    hop)) — K static slices instead of a [num_frames, n_fft] scalar gather,
    which lowers serially on TPU (measured: the gather made Griffin-Lim
    ~5 ms/iteration at T=250; the dense form is pure data movement).
    Bit-identical to the gather (no arithmetic)."""
    if center:
        pad = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    B, L = wav.shape
    num_frames = (L - n_fft) // hop_length + 1
    K = -(-n_fft // hop_length)  # ceil
    Lp = (num_frames + K) * hop_length
    wavp = jnp.pad(wav, ((0, 0), (0, max(0, Lp - L))))
    ch = wavp.reshape(B, -1, hop_length)
    frames = jnp.concatenate(
        [ch[:, k : k + num_frames] for k in range(K)], axis=2
    )
    return frames[:, :, :n_fft]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Dense overlap-add: frames [B, T, W] -> signal [B, (T-1)*hop + W].

    Each frame splits into K = ceil(W / hop) hop-length chunks; chunk k of
    frame t lands at output chunk t+k, so the whole OLA is K static shifted
    adds over a [B, T+K-1, hop] buffer — no scatter (``segment_sum`` lowers
    to a serialized scatter-add on TPU; this form is what made streaming
    Griffin-Lim viable)."""
    B, T, W = frames.shape
    K = -(-W // hop_length)
    Wp = K * hop_length
    fr = jnp.pad(frames, ((0, 0), (0, 0), (0, Wp - W)))
    fr = fr.reshape(B, T, K, hop_length)
    out = jnp.zeros((B, T + K - 1, hop_length), frames.dtype)
    for k in range(K):
        out = out.at[:, k : k + T].add(fr[:, :, k])
    return out.reshape(B, (T + K - 1) * hop_length)[:, : (T - 1) * hop_length + W]


def stft_power(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    power: float = 2.0,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram [B, num_frames, n_fft//2+1] via framed matmul-DFT."""
    frames = frame_signal(wav, n_fft, hop_length, center)
    window = hann_window(win_length)
    if win_length < n_fft:  # torch center-pads the window inside n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag_sq = spec.real**2 + spec.imag**2
    if power == 2.0:
        return mag_sq
    return jnp.power(jnp.sqrt(mag_sq), power)


def stft_complex(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(real, imag) STFT parts, each [B, num_frames, n_freqs]."""
    frames = frame_signal(wav, n_fft, hop_length, center)
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return spec.real, spec.imag


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT by inverse-DFT matmul + windowed overlap-add.

    Input layout [B, num_frames, n_freqs] (one-sided spectrum).
    """
    B, T, n_freqs = re.shape
    frames = jnp.fft.irfft(re + 1j * im, n=n_fft, axis=-1)
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, None, :]

    # Dense overlap-add (see overlap_add): scatter-free, TPU-friendly.
    sig = overlap_add(frames, hop_length)
    win_sq = overlap_add(
        jnp.broadcast_to(window**2, (1, T, n_fft)), hop_length
    )[0]
    sig = sig / jnp.clip(win_sq, 1e-11)[None, :]

    pad = n_fft // 2
    sig = sig[:, pad:-pad]
    if length is not None:
        sig = sig[:, :length]
    return sig


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: Optional[str] = None,
) -> np.ndarray:
    """Triangular HTK-scale mel filterbank [n_freqs, n_mels].

    Matches torchaudio.functional.melscale_fbanks(mel_scale="htk", norm=None),
    the configuration the reference uses (collate.py:22-32).
    """
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(np.asarray(f_min))
    m_max = _hz_to_mel_htk(np.asarray(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


class MelFrontend:
    """wav [B, T] -> log-mel [B, frames, n_mels], fully jittable.

    Semantics match the reference's Collate mel path (collate.py:48-61):
    power-2 spectrogram -> HTK mel (norm=None) -> log(clamp(mel, 1e-5)).
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 1024,
        hop_length: int = 160,
        win_length: int = 1024,
        n_mels: int = 80,
        f_min: float = 0.0,
        f_max: float = 8000.0,
        log_clamp: float = 1e-5,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        self.log_clamp = log_clamp
        self.fbank = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
        )

    def mel_power(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Linear-power mel [B, frames, n_mels]."""
        spec = stft_power(wav, self.n_fft, self.hop_length, self.win_length)
        return jnp.einsum(
            "btf,fm->btm", spec, self.fbank, preferred_element_type=jnp.float32
        )

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Log-mel [B, frames, n_mels]."""
        mel = self.mel_power(wav)
        return jnp.log(jnp.clip(mel, self.log_clamp))


def inverse_mel_scale(
    mel_power: jnp.ndarray, fbank: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Mel power -> linear power spectrogram via pseudo-inverse least squares.

    Capability-parity with torchaudio.transforms.InverseMelScale (used by the
    reference vocoder demo, generate_sample.py:124-132); non-negativity is
    enforced by clamping.
    """
    pinv = jnp.linalg.pinv(fbank)  # [n_mels, n_freqs]
    spec = jnp.einsum("btm,mf->btf", mel_power, pinv)
    return jnp.clip(spec, eps)
