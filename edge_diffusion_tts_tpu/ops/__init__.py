"""TPU-native compute ops: mel frontend, resampling, vocoder, kernels."""

from .mel import (
    MelFrontend,
    hann_window,
    inverse_mel_scale,
    istft,
    mel_filterbank,
    stft_complex,
    stft_power,
)
from .resample import resample
from .vocoder import griffin_lim

__all__ = [
    "MelFrontend",
    "griffin_lim",
    "hann_window",
    "inverse_mel_scale",
    "istft",
    "mel_filterbank",
    "resample",
    "stft_complex",
    "stft_power",
]
