"""Utilities: audio normalization, logging, speed, export, visualization."""

from .audio import denormalize_mel, normalize_mel
from .logging import MetricWriter
from .speed import TimingContext, benchmark, memory_stats, profile_trace, remat_decoder

__all__ = [
    "MetricWriter",
    "TimingContext",
    "benchmark",
    "denormalize_mel",
    "memory_stats",
    "normalize_mel",
    "profile_trace",
    "remat_decoder",
]
