"""Models: diffusion decoder, quantizers, HuBERT, semantic encoder."""

from .decoder import EdgeDiffusionDecoder
from .encoder import SemanticEncoder, is_hubert_param
from .fsq import FSQ, FSQEncoder, count_code_usage, usage_metrics
from .hubert import HubertConfig, HubertEncoder, load_hubert_params_from_torch
from .vq import VectorQuantizer

__all__ = [
    "EdgeDiffusionDecoder",
    "FSQ",
    "FSQEncoder",
    "HubertConfig",
    "HubertEncoder",
    "SemanticEncoder",
    "VectorQuantizer",
    "count_code_usage",
    "is_hubert_param",
    "load_hubert_params_from_torch",
    "usage_metrics",
]
