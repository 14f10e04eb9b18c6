"""Model export for edge deployment: StableHLO via jax.export.

Capability parity with the reference's ONNX export (reference:
edge_diffusion_tts/utils/export.py:12-40, opset 14, dynamic batch/time):
``jax.export`` serializes the jitted decoder forward — inputs
(x_t, t, sem_idx, step_idx) -> prediction — with symbolic batch/time/context
dimensions, producing a portable StableHLO artifact that any XLA-backed
runtime (TPU, GPU, CPU, IREE) can load and run.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import CFG


def export_for_edge(
    cfg: CFG,
    decoder,
    decoder_params,
    out_path: str,
    dynamic: bool = True,
) -> str:
    """Serialize the decoder denoise forward as StableHLO; returns the path."""
    from jax import export as jexport

    def fwd(params, x_t, t, sem_idx, step_idx):
        return decoder.apply(
            {"params": params}, x_t, t, sem_idx=sem_idx, step_idx=step_idx
        )

    if dynamic:
        b, t_dim, s_dim = jexport.symbolic_shape("b, t, s")
    else:
        b, t_dim, s_dim = 1, 200, 100

    args = (
        decoder_params,
        jax.ShapeDtypeStruct((b, t_dim, cfg.n_mels), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, s_dim), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    exported = jexport.export(jax.jit(fwd))(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"Exported decoder ({len(blob) / 1e6:.2f} MB StableHLO) -> {out_path}")
    return out_path


def load_exported(path: str):
    """Deserialize an exported decoder; returns the jax.export.Exported."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
