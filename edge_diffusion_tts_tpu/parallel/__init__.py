"""Parallelism: device meshes, data-parallel steps, sharded inference."""

from .data_parallel import make_dp_diffusion_step, make_dp_generate
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_dp_diffusion_step",
    "make_dp_generate",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
