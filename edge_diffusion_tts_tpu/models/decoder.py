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


class EdgeDiffusionDecoder(nn.Module):
    """Edge-optimized diffusion decoder (~650K params at 160H/4L/4heads)."""

    cfg: CFG
    dtype: jnp.dtype = jnp.float32
    # None = resolve from the config: cfg.use_flash_attn enables the Pallas
    # banded-attention kernel, engaged only once the mel sequence reaches
    # cfg.pallas_min_seq_len (XLA SDPA is faster below the crossover).
    # True/False force the route unconditionally (tests, benchmarks).
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        sem_idx: Optional[jnp.ndarray] = None,
        step_idx: Optional[jnp.ndarray] = None,
        sem_features: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        pos_offset=0,
    ) -> jnp.ndarray:
        cfg = self.cfg
        H = cfg.hidden

        # 1. Timestep conditioning: sinusoid -> Dense -> GELU -> Dense
        t_cond = sinusoidal_time_embedding(t, H).astype(self.dtype)
        t_cond = nn.Dense(H, dtype=self.dtype, name="time_fc1")(t_cond)
        t_cond = nn.gelu(t_cond, approximate=False)
        t_cond = nn.Dense(H, dtype=self.dtype, name="time_fc2")(t_cond)

        if step_idx is not None:
            # Clamp to the table: the reference's Embedding(16) hard-crashes
            # when progressive distillation passes step indices up to
            # num_steps-1 (consistency.py:55 with num_steps=500); in flax an
            # out-of-bounds Embed gather fills NaN. Indices >= 16 share the
            # last row — step conditioning only matters at small step counts.
            step_emb = nn.Embed(
                MAX_STEP_EMB, H, dtype=self.dtype, name="step_emb"
            )(jnp.clip(step_idx, 0, MAX_STEP_EMB - 1))
            t_cond = t_cond + step_emb

        # 2. Semantic context: continuous features (training / STE gradient
        #    path) or discrete token indices (inference path).
        if sem_features is not None:
            context = nn.Dense(H, dtype=self.dtype, name="sem_proj")(sem_features)
        elif sem_idx is not None:
            context = nn.Embed(
                cfg.effective_codebook_size(), H, dtype=self.dtype, name="token_emb"
            )(sem_idx)
        else:
            raise ValueError("either sem_idx or sem_features must be provided")
        context = SinusoidalPositionalEmb(
            H, max_len=cfg.max_ctx_positions, name="context_pos_emb"
        )(
            context
        )

        # 3. Mel projection + positional encoding
        # ``pos_offset`` shifts the mel positional window: a sequence shard
        # processing global frames [pos_offset, pos_offset + T) sees its true
        # positions (parallel/sequence_parallel.py).
        h = nn.Dense(H, dtype=self.dtype, name="in_proj")(x_t.astype(self.dtype))
        h = SinusoidalPositionalEmb(
            H, max_len=cfg.max_mel_positions, name="pos_emb"
        )(h, offset=pos_offset)

        # 4. Transformer backbone
        if self.use_pallas is None:
            use_pallas = cfg.use_flash_attn
            pallas_min_seq = cfg.pallas_min_seq_len
        else:
            use_pallas = self.use_pallas
            pallas_min_seq = 0
        for i in range(cfg.layers):
            h = DiffusionTransformerBlock(
                dim=H,
                context_dim=H,
                cond_dim=H,
                heads=cfg.heads,
                ffn_mult=cfg.ffn_mult,
                dropout=cfg.dropout,
                use_adaln=cfg.use_adaln,
                window_size=cfg.attn_window_size,
                dtype=self.dtype,
                use_pallas=use_pallas,
                pallas_min_seq=pallas_min_seq,
                name=f"layers_{i}",
            )(h, context=context, cond=t_cond, deterministic=deterministic)

        # 5. LayerNorm + zero-init output head (prediction starts at zero)
        h = nn.LayerNorm(dtype=self.dtype, name="final_norm")(h)
        out = nn.Dense(
            cfg.n_mels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(h)
        return out.astype(jnp.float32)


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
