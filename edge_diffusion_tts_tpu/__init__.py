"""TPU-native Edge Diffusion TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Krabbens/edge-diffusion-tts: HuBERT semantic tokens (FSQ/VQ) conditioning a
small diffusion transformer that generates 80-bin log-mel spectrograms in
1-4 denoising steps, trained with diffusion -> progressive distillation ->
consistency phases, with data-parallel scaling over a TPU mesh.

Subpackages:
  config     CFG dataclass, seeding, derived sizes
  schedule   cosine diffusion tables, DDIM/DDPM steps, DPM-Solver++
  layers     attention (windowed/MLA/cross), AdaLN, SwiGLU, embeddings, convs
  models     EdgeDiffusionDecoder, SemanticEncoder, HuBERT, FSQ, VQ
  ops        mel frontend, resampling, Griffin-Lim, Pallas banded attention
  data       LJSpeech reader, collation, loader, precomputed features
  training   jitted phase steps, 3-phase driver, orbax checkpoints
  parallel   device mesh, shard_map data parallelism
  inference  few-step EdgeInference; pipeline: long-form chunked generation
  serving    micro-batched request serving (shape buckets + exact masking)
  utils      audio norm, logging, export, speed/profiling, visualization
"""

from .config import CFG, TrainPhase, get_device, set_seed

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (mirrors the reference exports)
    if name in ("DiffusionSchedule", "DPMSolverPP", "ddim_sample", "ddpm_sample"):
        from . import schedule

        return getattr(schedule, name)
    if name in ("SemanticEncoder", "EdgeDiffusionDecoder", "VectorQuantizer",
                "FSQ", "FSQEncoder", "HubertEncoder"):
        from . import models

        return getattr(models, name)
    if name == "EdgeInference":
        from .inference import EdgeInference

        return EdgeInference
    if name == "LongFormPipeline":
        from .pipeline import LongFormPipeline

        return LongFormPipeline
    if name in ("MicroBatcher", "serve_tcp", "request_tts"):
        from . import serving

        return getattr(serving, name)
    if name in ("Trainer", "ConsistencyTrainer", "train", "train_v2"):
        from . import training

        if name == "ConsistencyTrainer":
            # API-familiarity alias: the reference's ConsistencyTrainer role
            # (EMA teacher + progressive/consistency losses) lives on Trainer.
            return training.Trainer
        return getattr(training, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "CFG",
    "TrainPhase",
    "get_device",
    "set_seed",
    "DiffusionSchedule",
    "SemanticEncoder",
    "EdgeDiffusionDecoder",
    "VectorQuantizer",
    "EdgeInference",
    "MicroBatcher",
    "ConsistencyTrainer",
    "LongFormPipeline",
    "Trainer",
    "__version__",
]
