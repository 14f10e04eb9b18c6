"""EdgeDiffusionDecoder: the conditional diffusion denoiser.

Inputs: noisy mel x_t [B, T, n_mels], timestep t [B], and semantic
conditioning as either discrete token indices (token embedding) or continuous
features (linear projection); optional few-step stage index adds a learned
embedding to the time conditioning.  Backbone: N DiffusionTransformerBlocks
with windowed self-attention, MLA cross-attention over the context, AdaLN
time conditioning; zero-initialized output head.

Parameter shapes port 1:1 from the reference decoder
(reference: edge_diffusion_tts/models/decoder.py:14-109).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import CFG
from ..layers import (
    DiffusionTransformerBlock,
    SinusoidalPositionalEmb,
    sinusoidal_time_embedding,
)

MAX_STEP_EMB = 16  # few-step stage embedding table size (decoder.py:32)


def backbone_block(cfg: CFG, dtype, use_pallas: Optional[bool] = None):
    """The decoder's transformer block with routing resolved like __call__.

    Standalone so the pipeline-parallel path can apply ONE block to a
    lax.scan-stacked params shard (parallel/pipeline_parallel.py) with
    exactly the decoder's hyperparameters.
    """
    if use_pallas is None:
        up, pms = cfg.use_flash_attn, cfg.pallas_min_seq_len
    else:
        up, pms = use_pallas, 0
    return DiffusionTransformerBlock(
        dim=cfg.hidden,
        context_dim=cfg.hidden,
        cond_dim=cfg.hidden,
        heads=cfg.heads,
        ffn_mult=cfg.ffn_mult,
        dropout=cfg.dropout,
        use_adaln=cfg.use_adaln,
        window_size=cfg.attn_window_size,
        dtype=dtype,
        use_pallas=up,
        pallas_min_seq=pms,
        cross_q_chunk=cfg.cross_q_chunk,
        band_q_chunk=cfg.band_q_chunk,
    )


class EdgeDiffusionDecoder(nn.Module):
    """Edge-optimized diffusion decoder (~650K params at 160H/4L/4heads).

    setup-style with the forward split into ``prelude`` (embeddings/
    conditioning) -> ``backbone`` (transformer blocks) -> ``postlude``
    (norm + zero-init head) so the pipeline-parallel trainer can stage the
    backbone across devices while reusing the exact pre/post computations
    (all submodule names match the original compact layout — checkpoints
    and ported reference weights are unaffected).
    """

    cfg: CFG
    dtype: jnp.dtype = jnp.float32
    # None = resolve from the config: cfg.use_flash_attn enables the Pallas
    # banded-attention kernel, engaged only once the mel sequence reaches
    # cfg.pallas_min_seq_len (XLA SDPA is faster below the crossover).
    # True/False force the route unconditionally (tests, benchmarks).
    use_pallas: Optional[bool] = None

    def setup(self):
        cfg, H = self.cfg, self.cfg.hidden
        self.time_fc1 = nn.Dense(H, dtype=self.dtype)
        self.time_fc2 = nn.Dense(H, dtype=self.dtype)
        self.step_emb = nn.Embed(MAX_STEP_EMB, H, dtype=self.dtype)
        self.sem_proj = nn.Dense(H, dtype=self.dtype)
        self.token_emb = nn.Embed(
            cfg.effective_codebook_size(), H, dtype=self.dtype
        )
        self.context_pos_emb = SinusoidalPositionalEmb(
            H, max_len=cfg.max_ctx_positions
        )
        self.in_proj = nn.Dense(H, dtype=self.dtype)
        if cfg.use_depthwise:
            # Residual depthwise-separable conv pre-net on the projected mel
            # sequence (kernel 3, local temporal smoothing).  The reference
            # declares this flag (README-advertised, config.py:107) but no
            # reference model consumes it — here it is WIRED, default off so
            # ported reference weights/numerics are unchanged (PARITY.md
            # deviations).  Not halo-exact under sequence parallelism.
            from ..layers.conv import DepthwiseSeparableConv

            self.pre_conv = DepthwiseSeparableConv(H, H, dtype=self.dtype)
        self.pos_emb = SinusoidalPositionalEmb(H, max_len=cfg.max_mel_positions)
        # flax names list entries "layers_<i>" — same tree as the old loop.
        self.layers = [
            backbone_block(cfg, self.dtype, self.use_pallas)
            for _ in range(cfg.layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.out_proj = nn.Dense(
            cfg.n_mels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    def prelude(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        sem_idx: Optional[jnp.ndarray] = None,
        step_idx: Optional[jnp.ndarray] = None,
        sem_features: Optional[jnp.ndarray] = None,
        pos_offset=0,
    ):
        """Embeddings + conditioning: ``(h0, context, t_cond)``."""
        # 1. Timestep conditioning: sinusoid -> Dense -> GELU -> Dense
        t_cond = sinusoidal_time_embedding(t, self.cfg.hidden).astype(self.dtype)
        t_cond = self.time_fc2(nn.gelu(self.time_fc1(t_cond), approximate=False))

        if step_idx is not None:
            # Clamp to the table: the reference's Embedding(16) hard-crashes
            # when progressive distillation passes step indices up to
            # num_steps-1 (consistency.py:55 with num_steps=500); in flax an
            # out-of-bounds Embed gather fills NaN. Indices >= 16 share the
            # last row — step conditioning only matters at small step counts.
            t_cond = t_cond + self.step_emb(
                jnp.clip(step_idx, 0, MAX_STEP_EMB - 1)
            )

        # 2. Semantic context: continuous features (training / STE gradient
        #    path) or discrete token indices (inference path).
        if sem_features is not None:
            context = self.sem_proj(sem_features)
        elif sem_idx is not None:
            context = self.token_emb(sem_idx)
        else:
            raise ValueError("either sem_idx or sem_features must be provided")
        context = self.context_pos_emb(context)

        # 3. Mel projection + positional encoding
        # ``pos_offset`` shifts the mel positional window: a sequence shard
        # processing global frames [pos_offset, pos_offset + T) sees its true
        # positions (parallel/sequence_parallel.py).
        h = self.in_proj(x_t.astype(self.dtype))
        if self.cfg.use_depthwise:
            h = h + self.pre_conv(h)
        h = self.pos_emb(h, offset=pos_offset)
        return h, context, t_cond

    def backbone(
        self,
        h: jnp.ndarray,
        context: jnp.ndarray,
        t_cond: jnp.ndarray,
        deterministic: bool = True,
        mel_mask: Optional[jnp.ndarray] = None,
        ctx_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        for block in self.layers:
            h = block(
                h,
                context=context,
                cond=t_cond,
                deterministic=deterministic,
                mel_mask=mel_mask,
                ctx_mask=ctx_mask,
            )
        return h

    def postlude(self, h: jnp.ndarray) -> jnp.ndarray:
        """LayerNorm + zero-init output head (prediction starts at zero)."""
        return self.out_proj(self.final_norm(h)).astype(jnp.float32)

    def align_contexts(self, sem_idx: jnp.ndarray, sem_features: jnp.ndarray):
        """Both conditioning embeddings for the same utterance:
        ``(token_emb(sem_idx), sem_proj(sem_features))``.

        Used by the phase-1 token-alignment auxiliary loss (training/steps
        .py): the diffusion objective conditions through sem_features (the
        v2 recipe's STE gradient path, reference train_v2.py:132), but
        inference/serving condition through sem_idx (reference inference
        .py:44) — without alignment a phase-1-only checkpoint would serve
        through an untrained token embedding."""
        return self.token_emb(sem_idx), self.sem_proj(sem_features)

    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        sem_idx: Optional[jnp.ndarray] = None,
        step_idx: Optional[jnp.ndarray] = None,
        sem_features: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        pos_offset=0,
        sem_mask: Optional[jnp.ndarray] = None,
        mel_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``sem_mask`` ([B, S] bool) / ``mel_mask`` ([B, T] bool) mark real
        (non-padded) positions for variable-length batched serving: padded
        keys are excluded from cross-/self-attention, every other op is
        per-position, so each row's valid frames match its unpadded forward
        exactly (serving.py; tests/test_serving.py)."""
        h, context, t_cond = self.prelude(
            x_t, t, sem_idx=sem_idx, step_idx=step_idx,
            sem_features=sem_features, pos_offset=pos_offset,
        )
        h = self.backbone(
            h,
            context,
            t_cond,
            deterministic=deterministic,
            mel_mask=mel_mask,
            ctx_mask=sem_mask,
        )
        return self.postlude(h)


def init_decoder_params(decoder: EdgeDiffusionDecoder, rng, cfg: CFG) -> dict:
    """Initialize decoder params covering BOTH conditioning branches.

    flax creates params lazily per traced branch, but the decoder must own
    both ``token_emb`` (sem_idx path, inference) and ``sem_proj``
    (sem_features path, training) like the torch module does
    (reference: models/decoder.py:22-23).  Init twice, merge the trees.
    """
    import jax.numpy as jnp

    B, T = 1, 8
    x = jnp.zeros((B, T, cfg.n_mels), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    si = jnp.zeros((B,), jnp.int32)
    v_idx = decoder.init(
        rng, x, t, sem_idx=jnp.zeros((B, 4), jnp.int32), step_idx=si
    )
    v_feat = decoder.init(
        rng, x, t, sem_features=jnp.zeros((B, 4, cfg.semantic_dim)), step_idx=si
    )
    params = dict(v_idx["params"])
    for k, v in v_feat["params"].items():
        if k not in params:
            params[k] = v
    return {"params": params}
