"""Semantic encoder: frozen HuBERT layer-9 features -> projection -> FSQ/VQ.

Reference behavior: edge_diffusion_tts/models/encoder.py:17-131
(SemanticEncoder) and train_v2.py:37-81 (FastSemanticEncoder, adds dropout in
the projection).  HuBERT runs under stop_gradient; freezing is enforced at
the optimizer level by masking the ``hubert`` param subtree
(see training/train_state.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CFG
from .fsq import FSQEncoder
from .hubert import HubertConfig, HubertEncoder
from .vq import VectorQuantizer

_gelu = partial(nn.gelu, approximate=False)


class SemanticEncoder(nn.Module):
    """wav [B, T] -> quantized semantic features + token indices.

    Returns the VQ-compatible 5-tuple (z_q, idx, vq_loss, perplexity, used).
    ``use_dropout`` enables the FastSemanticEncoder projection-dropout variant.
    """

    cfg: CFG
    hubert_cfg: HubertConfig = HubertConfig()
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32
    # Mesh axis the batch shards over, for global-batch VQ EMA statistics
    # under shard_map data parallelism (see VectorQuantizer.axis_name).
    vq_axis_name: "str | None" = None

    @property
    def codebook_size(self) -> int:
        return self.cfg.effective_codebook_size()

    def setup(self):
        cfg = self.cfg
        self.hubert = HubertEncoder(self.hubert_cfg, dtype=self.dtype)
        self.proj_fc1 = nn.Dense(cfg.semantic_dim, dtype=self.dtype, name="proj_fc1")
        self.proj_ln = nn.LayerNorm(dtype=self.dtype, name="proj_ln")
        self.proj_fc2 = nn.Dense(cfg.semantic_dim, dtype=self.dtype, name="proj_fc2")
        if self.use_dropout:
            self.proj_drop = nn.Dropout(cfg.dropout)
        if cfg.use_fsq:
            self.vq = FSQEncoder(
                cfg.semantic_dim, tuple(cfg.fsq_levels), dtype=self.dtype
            )
        else:
            self.vq = VectorQuantizer(
                cfg.semantic_dim, cfg.codebook_size, commit=cfg.vq_commit,
                axis_name=self.vq_axis_name,
            )

    def extract_hubert(
        self, wav_16k: jnp.ndarray, conv_feats=None, wav_len=None
    ) -> jnp.ndarray:
        """Frozen HuBERT hidden layer (cfg.hubert_layer, default 9).

        Clamped to the encoder depth so reduced test configs
        (HubertConfig.tiny) take their last layer.  ``conv_feats`` bypasses
        the conv frontend (ops/fused_frontend.py fast path).  ``wav_len``
        makes zero-padded (length-bucketed) inputs exact — see
        HubertEncoder.__call__.
        """
        layer = min(self.cfg.hubert_layer, self.hubert_cfg.num_layers)
        h = self.hubert.extract_layer(
            wav_16k, layer, conv_feats=conv_feats, wav_len=wav_len
        )
        return jax.lax.stop_gradient(h)

    def _project(self, h: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        z = self.proj_fc1(h)
        z = _gelu(z)
        z = self.proj_ln(z)
        if self.use_dropout:
            z = self.proj_drop(z, deterministic=deterministic)
        return self.proj_fc2(z)

    def __call__(
        self,
        wav_16k: jnp.ndarray,
        train: bool = False,
        deterministic: bool = True,
        wav_len=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``wav_len`` (true sample count) makes zero-padded length-bucketed
        inputs exact: the HuBERT forward masks the padded tail (see
        HubertEncoder), and the quantized features/indices at padded frame
        positions are zeroed here — the projection of a zeroed hidden state
        is NOT zero (biases), and downstream consumers (e.g. the long-form
        pipeline) zero-pad exact-length features, so padded rows must be 0
        to match bit for bit."""
        h = self.extract_hubert(wav_16k, wav_len=wav_len)
        z = self._project(h, deterministic)
        out = self.vq(z) if self.cfg.use_fsq else self.vq(z, train=train)
        if wav_len is None:
            return out
        from .hubert import conv_frame_lengths

        n_valid = conv_frame_lengths(self.hubert_cfg, jnp.asarray(wav_len))[-1]
        mask = (
            jnp.arange(h.shape[1])[None, :]
            < jnp.reshape(n_valid, (-1, 1))
        )
        z_q, idx, vq_loss, ppl, used = out
        z_q = jnp.where(mask[:, :, None], z_q, 0.0)
        idx = jnp.where(mask, idx, 0)
        return z_q, idx, vq_loss, ppl, used

    def from_features(
        self, feats: jnp.ndarray, train: bool = False, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Precomputed HuBERT features [B, S, 768] -> same 5-tuple as __call__.

        Skips the frozen 95M-param forward entirely (the reference's
        precomputed-features fast path, data/dataset_precomputed.py).
        """
        z = self._project(feats, deterministic)
        if self.cfg.use_fsq:
            return self.vq(z)
        return self.vq(z, train=train)

    def encode(
        self, wav_16k: jnp.ndarray, conv_feats=None
    ) -> jnp.ndarray:
        """wav -> discrete token indices [B, S]."""
        h = self.extract_hubert(wav_16k, conv_feats=conv_feats)
        z = self._project(h, deterministic=True)
        return self.vq.encode(z)

    def decode_tokens(self, idx: jnp.ndarray) -> jnp.ndarray:
        """token indices -> continuous semantic features."""
        return self.vq.decode(idx)


def is_hubert_param(path: Tuple, _=None) -> bool:
    """Predicate over flax param paths: True for the frozen HuBERT subtree."""
    return any(getattr(k, "key", k) == "hubert" for k in path)
