"""Griffin-Lim phase reconstruction as a jitted fixed-point loop.

TPU-native equivalent of torchaudio.transforms.GriffinLim (used by the
reference demo/vocoder scripts: generate_sample.py:135-141,
inference_pipeline.py:394-399).  The whole iteration — iSTFT, STFT, phase
projection with momentum — is a ``lax.fori_loop`` over MXU matmuls, so N
iterations compile to one XLA program with zero host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .mel import istft, stft_complex


@partial(
    jax.jit,
    static_argnames=(
        "n_fft",
        "hop_length",
        "win_length",
        "n_iter",
        "length",
        "momentum",
        "rand_init",
    ),
)
def griffin_lim(
    spec_power: jnp.ndarray,
    rng: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: Optional[int] = None,
    power: float = 2.0,
    rand_init: bool = True,
) -> jnp.ndarray:
    """Power (or magnitude) spectrogram [B, frames, n_freqs] -> waveform [B, T].

    Momentum-accelerated Griffin-Lim (Perraudin et al.), matching torchaudio's
    formulation: the previous rebuilt spectrum is subtracted with
    momentum/(1+momentum) before phase normalization.
    """
    mag = jnp.power(jnp.clip(spec_power, 0.0), 1.0 / power)
    B, T, F = mag.shape

    if rand_init:
        angle = jax.random.uniform(rng, (B, T, F), minval=0.0, maxval=2 * jnp.pi)
        re0, im0 = jnp.cos(angle), jnp.sin(angle)
    else:
        re0, im0 = jnp.ones_like(mag), jnp.zeros_like(mag)

    mom = momentum / (1.0 + momentum)

    def body(_, carry):
        re, im, tre, tim = carry
        # Subtract momentum-scaled previous rebuilt spectrum
        cre = re - mom * tre
        cim = im - mom * tim
        # Project onto the target magnitude
        norm = jnp.sqrt(cre**2 + cim**2) + 1e-16
        sre = mag * cre / norm
        sim = mag * cim / norm
        # Rebuild: iSTFT -> STFT
        wav = istft(sre, sim, n_fft, hop_length, win_length)
        nre, nim = stft_complex(wav, n_fft, hop_length, win_length)
        return nre, nim, re, im

    init = (re0 * mag, im0 * mag, jnp.zeros_like(mag), jnp.zeros_like(mag))
    re, im, _, _ = jax.lax.fori_loop(0, n_iter, body, init)

    norm = jnp.sqrt(re**2 + im**2) + 1e-16
    wav = istft(mag * re / norm, mag * im / norm, n_fft, hop_length, win_length)
    if length is not None:
        wav = wav[:, :length]
    return wav
