"""Multi-host (pod-slice) scaffolding: process init, hybrid meshes, data feed.

The single-host paths (data_parallel/tensor_parallel/pipeline_parallel/
sequence_parallel) all operate on a ``jax.sharding.Mesh`` and are agnostic to
where its devices live; this module supplies the three pieces that differ on
a multi-host pod:

1. ``init_multihost()`` — ``jax.distributed.initialize`` wrapper (env-driven
   on Cloud TPU; explicit coordinator otherwise).  Must run before the first
   backend touch on every process.
2. ``make_pod_mesh()`` — hybrid DCN x ICI device mesh via
   ``mesh_utils.create_hybrid_device_mesh``: the (large, bandwidth-tolerant)
   data axis spans hosts over DCN while model/pipe axes stay inside a slice
   on ICI — the standard layout, since gradient allreduce amortizes over the
   step but TP/PP collectives sit on the critical path.  Falls back to
   ``create_device_mesh`` in a single-process run, so the same call works in
   tests and on a pod.
3. ``host_local_batch()`` — builds a globally-sharded array from each
   process's LOCAL batch shard (``jax.make_array_from_process_local_data``):
   every host reads only its slice of the dataset and the result behaves as
   the full global batch under jit.

The torch reference is single-device (SURVEY §2.3: no distributed code at
all); this extends the framework's scaling story beyond parity.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime; returns (process_id, count).

    Must run BEFORE the first backend touch (this function deliberately
    never queries the backend itself: doing so would both defeat the
    cluster auto-detection and make a later ``initialize`` raise).  With no
    arguments it attempts the Cloud TPU / SLURM environment auto-detection
    built into ``jax.distributed.initialize``; when no cluster environment
    is detected (ValueError: no coordinator) it degrades to single-process
    (0, 1).  Explicit arguments never degrade silently — errors propagate.
    """
    explicit = (
        coordinator_address is not None
        or num_processes not in (None, 1)
        or process_id is not None
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # No cluster environment detected (no coordinator address).
        if explicit:
            raise
        return 0, 1
    except RuntimeError as e:
        # Discriminate by TYPE: jax.distributed's own precondition checks
        # ("called more than once" / "backend already initialized") raise
        # plain RuntimeError before any network activity and may degrade to
        # reporting the existing topology; an actual runtime failure (e.g. a
        # coordinator connect timeout on a real pod) is an XlaRuntimeError —
        # a RuntimeError SUBCLASS — and must propagate, else this host would
        # silently bring up a single-process backend while the rest of the
        # pod hangs in collective setup.
        if explicit or isinstance(e, jax.errors.JaxRuntimeError):
            raise
        return jax.process_index(), jax.process_count()
    return jax.process_index(), jax.process_count()


def make_pod_mesh(
    ici_shape: Sequence[int],
    axis_names: Sequence[str],
    dcn_data_parallelism: int = 1,
    devices=None,
) -> Mesh:
    """Mesh whose FIRST axis multiplies over DCN (hosts), rest over ICI.

    ``ici_shape``/``axis_names`` describe the per-slice layout, e.g.
    ``make_pod_mesh((4, 2), ("data", "model"), dcn_data_parallelism=8)`` on
    an 8-slice pod gives mesh shape {"data": 32, "model": 2} with the model
    axis never crossing DCN.
    """
    ici_shape = tuple(ici_shape)
    if len(ici_shape) != len(tuple(axis_names)):
        raise ValueError(f"{ici_shape} vs axis names {tuple(axis_names)}")
    if dcn_data_parallelism > 1:
        # TPU pods carry slice_index (the DCN granule); CPU/GPU clusters
        # don't — there the granule is the OS process (multi-process CPU
        # smoke: tools/multihost_smoke.py).
        devs = list(devices) if devices is not None else jax.devices()
        slice_ids = {getattr(d, "slice_index", None) for d in devs}
        dev = mesh_utils.create_hybrid_device_mesh(
            ici_shape,
            (dcn_data_parallelism,) + (1,) * (len(ici_shape) - 1),
            devices=devices,
            process_is_granule=len(slice_ids) <= 1,
        )
    else:
        dev = mesh_utils.create_device_mesh(ici_shape, devices=devices)
    return Mesh(dev, tuple(axis_names))


def host_local_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = DATA_AXIS
) -> Dict[str, jax.Array]:
    """Assemble the global batch from this process's LOCAL shard.

    Each host passes only the examples it loaded; the returned arrays are
    globally sharded over ``axis`` (leading dim = local_dim x process_count
    along that axis) and drop into the same jitted/shard_map step functions
    as single-host batches.
    """
    sharding = NamedSharding(mesh, P(axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
