"""Tensor parallelism for the HuBERT semantic encoder over the "model" axis.

The diffusion decoder (~2.3M params) has nothing to gain from TP, but the
frozen HuBERT encoder (95M params, 12 heads, FFN 3072) does: its attention
heads and FFN intermediate dimension shard cleanly over the model axis, with
GSPMD inserting the all-reduces on ICI.  Megatron-style placement:

  q/k/v projections   kernel [H, H]      -> P(None, "model")   (split heads)
  attention out_proj  kernel [H, H]      -> P("model", None)   (row-parallel)
  FFN intermediate    kernel [H, 4H]     -> P(None, "model")   (column-par.)
  FFN output          kernel [4H, H]     -> P("model", None)   (row-parallel)
  biases of column-parallel layers       -> P("model")
  everything else (convs, norms, small)  -> replicated P()

Used for batched serving (encode) where a (data, model) mesh splits both the
utterance batch and the encoder weights.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "intermediate_dense")
_ROW_PARALLEL = ("out_proj", "output_dense")


def hubert_param_spec(path) -> P:
    """PartitionSpec for one HuBERT param, from its flax path."""
    keys = [getattr(k, "key", str(k)) for k in path]
    name = keys[-2] if len(keys) >= 2 else ""
    leaf = keys[-1]
    if name in _COL_PARALLEL:
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if name in _ROW_PARALLEL and leaf == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def encoder_param_shardings(enc_params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for SemanticEncoder params: HuBERT subtree gets the
    Megatron placement, the small projection/quantizer stays replicated."""

    def spec(path, _):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "hubert" in keys:
            hub_i = keys.index("hubert")
            return NamedSharding(mesh, hubert_param_spec(path[hub_i + 1:]))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, enc_params)


def shard_encoder_params(enc_params: Any, mesh: Mesh) -> Any:
    """device_put the encoder params with the TP placement."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        enc_params,
        encoder_param_shardings(enc_params, mesh),
    )


def make_tp_encode(encoder, mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Batched wav -> semantic token indices with model-parallel HuBERT.

    Params must be placed with ``shard_encoder_params`` (jit then respects
    the placement and GSPMD partitions the matmuls + inserts collectives);
    the batch shards over the data axis.
    """

    @jax.jit
    def encode(enc_params, wav):
        wav = jax.lax.with_sharding_constraint(
            wav, NamedSharding(mesh, P(axis))
        )
        return encoder.apply({"params": enc_params}, wav, method=encoder.encode)

    return encode
