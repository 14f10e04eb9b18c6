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
  utils      audio norm, logging, export, speed/profiling, visualization
"""

from .config import CFG, TrainPhase, get_device, set_seed

__version__ = "0.1.0"

__all__ = ["CFG", "TrainPhase", "get_device", "set_seed", "__version__"]
