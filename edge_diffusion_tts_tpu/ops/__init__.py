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
from .fused_frontend import fast_encode, fused_conv_frontend
from .fused_denoise import (
    FusedEdgeInference,
    fused_ddpm_sample,
    fused_generate_mel,
)
from .resample import resample
from .vocoder import griffin_lim
from .window_attention import banded_attention

__all__ = [
    "FusedEdgeInference",
    "MelFrontend",
    "banded_attention",
    "fast_encode",
    "fused_conv_frontend",
    "fused_ddpm_sample",
    "fused_generate_mel",
    "griffin_lim",
    "hann_window",
    "inverse_mel_scale",
    "istft",
    "mel_filterbank",
    "resample",
    "stft_complex",
    "stft_power",
]
