"""Device mesh construction and sharding helpers.

The reference has no parallelism at all (SURVEY §2.3); this subsystem is the
TPU-native scaling layer: a ``jax.sharding.Mesh`` over (data, model) axes,
NamedShardings for batches (sharded over "data") and params (replicated),
with XLA inserting ICI collectives.  Tested on a virtual multi-device CPU
platform (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Build a mesh; default = all devices on the data axis, model axis 1."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """device_put every array in the batch with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated across the mesh."""
    return jax.device_put(tree, replicated(mesh))
