"""Configuration for the TPU-native Edge Diffusion TTS framework.

A single dataclass carries every hyperparameter (system, data, mel, semantic
encoder, model, diffusion, training phases, logging, inference) and
round-trips through JSON.  Functional equivalent of the reference CFG
(reference: edge_diffusion_tts/config.py:51-213) re-designed for JAX: no
device-global state, explicit PRNG seeding, and derived fields exposed as
properties so the config stays a plain serializable record.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional


class TrainPhase(Enum):
    """Training phases of the 3-stage recipe.

    Reference: edge_diffusion_tts/config.py:44-48.
    """

    DIFFUSION = "diffusion"
    PROGRESSIVE = "progressive"
    CONSISTENCY = "consistency"


def get_device() -> str:
    """Return the best available JAX backend name ("tpu" > "gpu" > "cpu").

    Reference: edge_diffusion_tts/config.py:18-32 (cuda > mps > xla > cpu).
    """
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def set_seed(seed: int):
    """Seed python/numpy RNGs and return a fresh JAX PRNG key.

    JAX randomness is functional: the returned key is the root of all
    stochasticity; thread it explicitly.  Reference:
    edge_diffusion_tts/config.py:35-41 seeds global RNGs instead.
    """
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@dataclass
class CFG:
    """Main configuration record.

    Field groups and defaults mirror the reference capability surface
    (reference: edge_diffusion_tts/config.py:51-213); all values are plain
    python types so the record serializes to JSON and can live inside
    checkpoints.
    """

    # ===== SYSTEM =====
    seed: int = 42
    # "auto" resolves via get_device() on first use — constructing a CFG must
    # NOT initialize a jax backend (it may run in a process that shouldn't
    # touch the single-client TPU, e.g. config tooling).
    device: str = "auto"
    out_dir: str = "run_edge_diffusion"
    run_name: str = field(default_factory=lambda: time.strftime("run_%Y%m%d_%H%M%S"))

    # ===== DATA =====
    data_root: str = "./data"
    ljspeech_dir: str = "./data/LJSpeech-1.1"
    sample_rate: int = 16000
    orig_sr: int = 22050
    segment_secs: float = 2.0
    segment_len: int = 32000  # derived in __post_init__
    # Read+collate worker threads in the DataLoader (data/loader.py): 0 =
    # synchronous in-consumer loading (the reference's MPS-safe default,
    # config.py:82 — an IPC concern threads don't share), 1 = one prefetch
    # thread (our default: overlap host collation with device compute),
    # >1 = order-preserving thread pool.
    num_workers: int = 1
    pin_memory: bool = False

    # ===== MEL SPECTROGRAM =====
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0

    # ===== HUBERT + VQ/FSQ =====
    hubert_id: str = "facebook/hubert-base-ls960"
    hubert_layer: int = 9
    semantic_dim: int = 128
    codebook_size: int = 512
    vq_commit: float = 1.0
    use_fsq: bool = True
    fsq_levels: List[int] = field(default_factory=lambda: [4, 4, 3, 3, 2, 2, 2, 2])

    # ===== EDGE-OPTIMIZED MODEL =====
    hidden: int = 160
    layers: int = 4
    heads: int = 4
    ffn_mult: int = 2
    # Residual depthwise-separable conv pre-net on the decoder's projected
    # mel sequence (models/decoder.py).  The reference declares this True
    # but nothing consumes it (SURVEY quirks); here it is WIRED and defaults
    # OFF so architecture/weights match the reference decoder exactly
    # (PARITY.md deviations).
    use_depthwise: bool = False
    # Allow the Pallas banded-attention kernel for windowed self-attention.
    # The kernel only engages when the mel sequence length reaches
    # pallas_min_seq_len — below that the XLA masked-SDPA path is measured
    # faster on v5e.  Crossover measured at T=3000 (window 64, 4 heads of 40):
    # XLA wins up to T=2000, Pallas wins 3.7x at 3000 rising to 9.8x at 8000
    # (PALLAS_CROSSOVER_r02.jsonl, bench_pallas.py).
    use_flash_attn: bool = True
    pallas_min_seq_len: int = 3000
    # Query-chunk size for the decoder's cross-attention (0 = dense).  Long
    # mel sequences against a long semantic context materialize an O(T*S)
    # fp32 score matrix in HBM (128 MB at the 40 s long-form shape); scanning
    # q in chunks bounds that to one tile and measured 3.6x faster on v5e
    # (layers/attention.py::q_chunked_sdpa).  Engages only when
    # T >= 2 * cross_q_chunk on the no-dropout path, so the flagship T=500
    # program is untouched.
    cross_q_chunk: int = 512
    # Query-chunk size for the pure-XLA banded self-attention fallback
    # (layers/attention.py::q_chunked_banded_sdpa): when the Pallas branch
    # is not taken (use_flash_attn=False or T < pallas_min_seq_len), long
    # windowed sequences scan static k/v band slices instead of
    # materializing the dense [T, T] fp32 score matrix (256 MB at T=4000).
    # 0 = dense masked SDPA (default pending v5e measurement).
    band_q_chunk: int = 0
    use_adaln: bool = True
    dropout: float = 0.2
    attn_window_size: int = 64
    # Positional-table capacities.  Reference hard-codes 1000 mel frames /
    # 512 context tokens (decoder.py:38-41) — those are the parity defaults;
    # raise them for long-sequence configs (a mel length at/above
    # pallas_min_seq_len needs max_mel_positions >= that length for the
    # banded Pallas kernel to actually engage in the decoder).
    max_mel_positions: int = 1000
    max_ctx_positions: int = 512

    # ===== DIFFUSION SCHEDULE =====
    diff_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 2e-2
    use_v_prediction: bool = True
    max_timestep: int = 950

    # ===== TRAINING PHASE =====
    phase: TrainPhase = TrainPhase.DIFFUSION

    diffusion_epochs: int = 50
    progressive_epochs_per_halving: int = 5
    progressive_target_steps: int = 4
    # True = two-step-teacher distillation (Salimans & Ho); False = the
    # reference's same-t EMA objective (see PARITY.md).
    progressive_exact: bool = False
    consistency_epochs: int = 10
    consistency_weight: float = 1.0
    # Phase-1 auxiliary loss pulling token_emb(sem_idx) toward the trained
    # sem_proj(features) context (stop-gradient), so a phase-1-only (v2
    # recipe) checkpoint serves correctly through the token path inference
    # uses.  0 disables (pure reference v2 objective).
    token_align_weight: float = 0.1
    # True = adjacent-timestep EMA-teacher consistency (Song et al.);
    # False = the reference's independent-two-t objective.
    consistency_exact: bool = False

    # ===== TRAINING =====
    batch_size: int = 4
    grad_accumulation: int = 8
    lr: float = 2e-4
    lr_consistency: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    cfg_dropout: float = 0.1  # classifier-free-guidance conditioning dropout
    warmup_frac: float = 0.05  # cosine-LR linear warmup fraction
    # >1 chains that many optimizer steps into ONE device dispatch
    # (lax.scan with on-device corpus gathering, Trainer.make_chained_step).
    # Amortizes the ~30 ms/dispatch tunnel overhead; requires an in-memory
    # fixed-segment corpus loader (exposing .wavs) and no mesh/pipeline.
    steps_per_dispatch: int = 1

    # ===== TPU / PARALLELISM =====
    compute_dtype: str = "float32"  # "bfloat16" runs module matmuls in bf16
    # "bfloat16" stores/optimizes the param tree in bf16 (init_models casts
    # after init; halves checkpoint + Adam-moment memory).
    param_dtype: str = "float32"
    mesh_shape: Optional[List[int]] = None  # (data, model); None = all-data
    mesh_axis_names: List[str] = field(default_factory=lambda: ["data", "model"])
    # Pipeline parallelism: >1 stages the decoder backbone over a "pipe"
    # mesh axis (parallel/pipeline_parallel.py); cfg.layers must divide by
    # it.  Mutually exclusive with mesh_shape (use PPTrainer's data_axis
    # composition directly for 2D DP x PP meshes).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0  # 0 = one microbatch per pipeline stage

    # Best-model checkpointing threshold: a new val_cos must beat the best
    # by this margin before best_model is (re)written.  Every save writes
    # the full state (incl. the 380 MB frozen HuBERT) — ~10 s on this box —
    # so saving on every epsilon improvement dominates a fast trainer's
    # wall-clock (see TRAIN_r04 throughput notes).
    best_min_delta: float = 0.0
    # Chained-dispatch driver only: validate every N epoch crossings
    # (1 = every epoch, the per-step driver's cadence).
    validate_every_epochs: int = 1

    # ===== LOGGING / EVAL =====
    log_every_steps: int = 50
    val_every_steps: int = 200
    plot_every_steps: int = 100
    val_batches: int = 4
    ckpt_every_steps: int = 500  # periodic checkpoint_latest (0 = phase-end only)

    # ===== INFERENCE =====
    inference_steps: int = 4

    # ===== CHECKPOINT =====
    ckpt_path: str = ""

    def __post_init__(self):
        # Segment length derived from seconds, floored to the HuBERT hop (320
        # samples @16 kHz) so waveform crops align with semantic frames.
        # Reference: edge_diffusion_tts/config.py:155-162.
        self.segment_len = int(self.sample_rate * self.segment_secs)
        lcm = 320
        self.segment_len = (self.segment_len // lcm) * lcm
        if not self.ckpt_path:
            self.ckpt_path = os.path.join(self.out_dir, "checkpoint_latest")

    # -- derived sizes (static-shape helpers for XLA) ------------------------

    @property
    def segment_mel_frames(self) -> int:
        """Mel frames produced by a segment (torchaudio center-pad formula)."""
        return self.segment_len // self.hop_length + 1

    @property
    def segment_sem_frames(self) -> int:
        """Semantic (HuBERT) frames produced by a segment (hop 320, no pad)."""
        return hubert_num_frames(self.segment_len)

    @property
    def fsq_codebook_size(self) -> int:
        n = 1
        for l in self.fsq_levels:
            n *= l
        return n

    def effective_codebook_size(self) -> int:
        """Codebook size actually produced by the configured quantizer.

        The reference v1 leaves codebook_size=512 while FSQ yields 2304 codes
        (a known bug, fixed in train_v2.py:246); we always derive it.
        """
        return self.fsq_codebook_size if self.use_fsq else self.codebook_size

    # -- environment ----------------------------------------------------------

    def setup_environment(self):
        """Seed RNGs and create output dirs; returns the root PRNG key.

        Reference: edge_diffusion_tts/config.py:172-180.
        """
        os.makedirs(self.data_root, exist_ok=True)
        os.makedirs(self.out_dir, exist_ok=True)
        return set_seed(self.seed)

    def print_config(self):
        print("=" * 60)
        print("   EDGE-OPTIMIZED DIFFUSION TTS (TPU-native)")
        print("=" * 60)
        if self.device == "auto":
            self.device = get_device()
        print(f"Backend: {self.device}")
        print(f"Segment: {self.segment_len} samples "
              f"({self.segment_len / self.sample_rate:.2f}s)")
        print(f"Model hidden: {self.hidden} (edge-optimized)")
        print(f"Target inference steps: {self.inference_steps}")
        print("=" * 60)

    def get_run_dir(self) -> str:
        return os.path.join(self.out_dir, self.run_name)

    # -- serialization ---------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "CFG":
        """Build a CFG from a dict, ignoring unknown keys.

        Reference: edge_diffusion_tts/config.py:197-203.
        """
        d = dict(d)
        if "phase" in d and isinstance(d["phase"], str):
            d["phase"] = TrainPhase(d["phase"])
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def to_dict(self) -> dict:
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, TrainPhase):
                v = v.value
            d[f.name] = v
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "CFG":
        return cls.from_dict(json.loads(s))


def hubert_num_frames(num_samples: int) -> int:
    """Number of frames HuBERT-base emits for a waveform of given length.

    The conv feature extractor applies strides [5,2,2,2,2,2,2] with kernels
    [10,3,3,3,3,2,2] and no padding; the composition is an effective hop of
    320 samples with a receptive field of 400.
    """
    n = num_samples
    for k, s in zip([10, 3, 3, 3, 3, 2, 2], [5, 2, 2, 2, 2, 2, 2]):
        n = (n - k) // s + 1
    return n
