"""HuBERT-base speech encoder implemented natively in JAX/flax.

The reference consumes a frozen ``transformers.HubertModel`` and takes hidden
layer 9 (reference: edge_diffusion_tts/models/encoder.py:35-72).  There is no
Flax Hubert in modern transformers, so this is a from-scratch TPU-native
implementation of the same architecture (facebook/hubert-base-ls960,
do_stable_layer_norm=False, feat_extract_norm="group"):

  wav [B, T] ->
    7x strided Conv1d feature extractor (group-norm on the first layer) ->
    LayerNorm + Linear(512->768) feature projection ->
    grouped positional conv (k=128, groups=16, weight-normed) added in ->
    LayerNorm -> 12 post-LN transformer layers (12 heads, FFN 3072, GELU)

``hidden_states[i]`` indexing matches HF semantics: index 0 is the encoder
input (post pos-conv+LN), index i is the output of layer i, index 12 is final.

``load_hubert_params_from_torch`` converts a torch ``HubertModel`` state dict
(weight-norm tensors included) to this module's params for numeric parity.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """Architecture hyperparameters (defaults = hubert-base-ls960)."""

    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def total_stride(self) -> int:
        """Samples per output latent (320 for hubert-base: 20 ms at 16 kHz).

        The long-form pipeline's chunk->latent slicing follows this rate
        (LongFormPipeline.sem_stride); a mismatched rate silently reads the
        wrong features (discovered: HubertConfig.tiny has stride 20, so a
        serving test on it fetched 16x the latents AND sliced the wrong
        sixteenth — use tiny320 for anything that exercises the chunk
        geometry)."""
        return int(np.prod(self.conv_stride))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "HubertConfig":
        d = json.loads(s)
        return cls(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d.items()
        })

    @classmethod
    def tiny(cls) -> "HubertConfig":
        """Small config for tests (NOTE: total_stride 20, not the real 320 —
        fine for unit tests of the encoder itself; use ``tiny320`` where the
        20 ms latent rate matters, e.g. the long-form chunk pipeline)."""
        return cls(
            conv_dim=(16, 16, 16),
            conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2),
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )

    @classmethod
    def tiny320(cls) -> "HubertConfig":
        """Small config with the REAL 320-sample total stride: cheap encode
        at the production 20 ms latent rate (serving/long-form tests)."""
        return cls(
            conv_dim=(16, 16, 16, 16, 16),
            conv_kernel=(10, 4, 4, 2, 2),
            conv_stride=(5, 4, 4, 2, 2),
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )


_gelu = partial(nn.gelu, approximate=False)  # HF "gelu" is erf-based


def conv_frame_lengths(cfg: HubertConfig, length):
    """Valid frame count after each conv layer for a true sample ``length``.

    Works on Python ints or traced int scalars; returns the per-layer list
    (element i = frames out of conv i; the last entry is the feature-frame
    count the transformer sees)."""
    out = []
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
        out.append(length)
    return out


class _MaskedGroupNorm(nn.Module):
    """Per-channel instance norm over time with an optional valid length.

    flax's ``nn.GroupNorm(num_groups=C)`` computes statistics over the WHOLE
    time axis, so zero-padding a batched/bucketed input shifts every frame's
    normalization (HF Hubert has the same flaw even WITH attention_mask —
    its group-norm ignores the mask).  Passing ``length`` here computes the
    statistics over the true frames only, making padded encodes exact.
    Parameter names/shapes match ``nn.GroupNorm`` ("scale"/"bias" of [C])
    so existing checkpoints and the torch converter are unaffected.
    """

    channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, length=None) -> jnp.ndarray:
        scale = self.param(
            "scale", nn.initializers.ones, (self.channels,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.channels,), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        if length is None:
            mean = jnp.mean(x32, axis=1, keepdims=True)
            var = jnp.mean(
                jnp.square(x32 - mean), axis=1, keepdims=True
            )
        else:
            m = (
                jnp.arange(x.shape[1])[None, :, None]
                < jnp.asarray(length).reshape(-1, 1, 1)
            ).astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x32 * m, axis=1, keepdims=True) / cnt
            var = jnp.sum(
                jnp.square(x32 - mean) * m, axis=1, keepdims=True
            ) / cnt
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class _FeatureExtractor(nn.Module):
    """Strided conv stack: wav [B, T] -> features [B, frames, conv_dim[-1]].

    ``wav_len`` (true sample count, int scalar or [B]) makes the group-norm
    statistics ignore zero-padded tail samples; all convs are VALID, so
    frames within the true length are then bit-identical to an exact-length
    forward (the padding only appends extra frames)."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, wav_len=None) -> jnp.ndarray:
        x = wav[:, :, None].astype(self.dtype)  # [B, T, 1]
        l0 = (
            None if wav_len is None
            else conv_frame_lengths(self.cfg, jnp.asarray(wav_len))[0]
        )
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            x = nn.Conv(
                features=dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                # feat_extract_norm="group": GroupNorm(num_groups=dim) on the
                # first layer only == per-channel instance norm over time.
                x = _MaskedGroupNorm(
                    channels=dim, eps=1e-5, dtype=self.dtype, name="group_norm"
                )(x, length=l0)
            x = _gelu(x)
        return x


class _PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (the weight-normed 128-tap conv)."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(
            features=self.cfg.hidden_size,
            kernel_size=(k,),
            padding=[(pad, pad)],
            feature_group_count=self.cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1, :]  # HubertSamePadLayer trims one for even kernels
        return _gelu(h)


class _EncoderLayer(nn.Module):
    """Post-LN transformer layer: MHA -> +res -> LN -> FFN -> +res -> LN."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, key_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, T, H = x.shape

        q = nn.Dense(H, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(H, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(H, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        scale = head_dim**-0.5
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        if key_mask is not None:
            # Padded keys get a bias so negative that exp underflows to
            # exactly 0.0 in f32: valid-query rows then compute the same
            # softmax sums as an exact-length forward.
            logits = jnp.where(
                key_mask[:, None, None, :], logits, jnp.float32(-1e30)
            )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H)
        attn = nn.Dense(H, dtype=self.dtype, name="out_proj")(attn)

        x = x + attn
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(
            x
        )

        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(
            x
        )
        h = _gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(h)
        x = x + h
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)
        return x


class HubertEncoder(nn.Module):
    """Full HuBERT model; returns all hidden states (HF-compatible indices)."""

    cfg: HubertConfig = HubertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        output_hidden_states: bool = True,
        conv_feats: Optional[jnp.ndarray] = None,
        wav_len=None,
    ) -> List[jnp.ndarray]:
        """``conv_feats`` bypasses the conv feature extractor with
        precomputed features (e.g. ops/fused_frontend.py's fused Pallas
        kernel); init always takes the in-module path so the extractor's
        params exist either way.

        ``wav_len`` (true sample count; int scalar or [B], static or traced)
        makes a zero-padded forward EXACT up to float accumulation order
        (~1e-6; tests/test_hubert.py): group-norm statistics ignore the
        padded tail, padded feature positions are zeroed before the
        positional conv (so its spill-in equals the same-padding zeros an
        exact-length forward sees), and padded keys are masked out of every
        attention softmax.  Frames at index >= the true frame count are
        zeroed in every returned hidden state.  This is STRONGER than HF's
        attention_mask, whose group-norm ignores the mask (outputs shift by
        O(1) under padding); it is what makes compile-bounded
        length-bucketed serving exact.
        """
        c = self.cfg
        if conv_feats is None or self.is_initializing():
            # Called during init even when bypassed, purely to bind the
            # extractor's params so both apply paths share one tree.
            extracted = _FeatureExtractor(
                c, dtype=self.dtype, name="feature_extractor"
            )(wav, wav_len=wav_len)
        feats = conv_feats if conv_feats is not None else extracted

        frame_mask = None
        if wav_len is not None:
            n_valid = conv_frame_lengths(c, jnp.asarray(wav_len))[-1]
            frame_mask = (
                jnp.arange(feats.shape[1])[None, :]
                < jnp.reshape(n_valid, (-1, 1))
            )

        # Feature projection: LN -> Linear(conv_dim[-1] -> hidden)
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="fp_layer_norm"
        )(feats)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fp_projection")(h)
        if frame_mask is not None:
            h = jnp.where(frame_mask[:, :, None], h, 0.0)

        pos = _PositionalConvEmbedding(c, dtype=self.dtype, name="pos_conv_embed")(h)
        h = h + pos
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="encoder_layer_norm"
        )(h)

        def finalize(x):
            if frame_mask is None:
                return x
            return jnp.where(frame_mask[:, :, None], x, 0.0)

        hidden_states = [finalize(h)]
        for i in range(c.num_layers):
            h = _EncoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                h, key_mask=frame_mask
            )
            hidden_states.append(finalize(h))
        if output_hidden_states:
            return hidden_states
        return [hidden_states[-1]]

    def extract_layer(
        self, wav: jnp.ndarray, layer: int,
        conv_feats: Optional[jnp.ndarray] = None,
        wav_len=None,
    ) -> jnp.ndarray:
        """Hidden state at HF index ``layer`` (9 = standard semantic layer)."""
        return self(
            wav, output_hidden_states=True, conv_feats=conv_feats,
            wav_len=wav_len,
        )[layer]


# ---------------------------------------------------------------------------
# Torch -> JAX weight conversion
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def load_hubert_params_from_torch(state_dict: Dict, cfg: HubertConfig) -> Dict:
    """Convert a torch ``HubertModel.state_dict()`` to HubertEncoder params.

    Handles both the parametrized (weight_g/weight_v or parametrizations.*)
    and materialized forms of the weight-normed positional conv.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict = {}

    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]  # [out, in, k]
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}  # [k, in, out]
    fe["group_norm"] = {
        "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    p["feature_extractor"] = fe

    p["fp_layer_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["fp_projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }

    # Positional conv: materialize the weight-normed kernel.
    prefix = "encoder.pos_conv_embed.conv"
    if f"{prefix}.weight" in sd:
        w = sd[f"{prefix}.weight"]  # already materialized
    else:
        if f"{prefix}.weight_g" in sd:
            g = sd[f"{prefix}.weight_g"]
            v = sd[f"{prefix}.weight_v"]
        else:  # torch >= 2.1 parametrization naming
            g = sd[f"{prefix}.parametrizations.weight.original0"]
            v = sd[f"{prefix}.parametrizations.weight.original1"]
        # weight_norm with dim=2: norm over dims (0, 1) per kernel position
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        w = g * v / norm
    # torch grouped conv weight [out, in/groups, k] -> flax [k, in/groups, out]
    p["pos_conv_embed"] = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),
            "bias": sd[f"{prefix}.bias"],
        }
    }

    p["encoder_layer_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }

    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q_proj": {
                "kernel": sd[f"{pre}.attention.q_proj.weight"].T,
                "bias": sd[f"{pre}.attention.q_proj.bias"],
            },
            "k_proj": {
                "kernel": sd[f"{pre}.attention.k_proj.weight"].T,
                "bias": sd[f"{pre}.attention.k_proj.bias"],
            },
            "v_proj": {
                "kernel": sd[f"{pre}.attention.v_proj.weight"].T,
                "bias": sd[f"{pre}.attention.v_proj.bias"],
            },
            "out_proj": {
                "kernel": sd[f"{pre}.attention.out_proj.weight"].T,
                "bias": sd[f"{pre}.attention.out_proj.bias"],
            },
            "layer_norm": {
                "scale": sd[f"{pre}.layer_norm.weight"],
                "bias": sd[f"{pre}.layer_norm.bias"],
            },
            "intermediate_dense": {
                "kernel": sd[f"{pre}.feed_forward.intermediate_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.intermediate_dense.bias"],
            },
            "output_dense": {
                "kernel": sd[f"{pre}.feed_forward.output_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.output_dense.bias"],
            },
            "final_layer_norm": {
                "scale": sd[f"{pre}.final_layer_norm.weight"],
                "bias": sd[f"{pre}.final_layer_norm.bias"],
            },
        }

    return jax.tree.map(jnp.asarray, {"params": p})
