"""Sequence-parallel long-form generation over a device mesh.

The decoder's only mel-to-mel mixing op is windowed self-attention
(cfg.attn_window_size, layers/attention.py); cross-attention reads the
semantic context (replicated here) and AdaLN / SwiGLU / projections are
pointwise in time.  The mel receptive field of the whole stack is therefore
``layers * attn_window_size`` frames — so a shard that decodes an extended
window with margin M = layers * window produces BIT-EXACT values on its
interior crop (standard halo argument: after l layers, positions >= l*window
from a chunk edge equal the full computation; global-boundary shards shift
their window inward instead of padding, so band-mask clipping at sequence
ends also matches).

Per DDIM step every shard:
  1. slices its extended window [start, start + Te) from the replicated x
     (start clipped so edge shards stay inside [0, T));
  2. runs the decoder on the slice with ``pos_offset=start`` (true global
     positions) and applies the DDIM update;
  3. crops its T/n segment; a tiled ``all_gather`` over ICI reassembles x.

Compute and attention memory scale as (T/n + 2M) per chip; communication is
one (T, n_mels) mel all_gather per step (~tens of KB/frame-col — trivial on
ICI).  The reference has no long-form scaling story at all (its pipeline is
sequential host-side chunking); this is the TPU-native equivalent of
splitting one long utterance across a pod slice.

No new parity surface: output equals ``schedule.ddim_sample`` on one device
(tests/test_parallel.py::test_seq_parallel_generate_matches_single_device).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CFG
from ..schedule import DiffusionSchedule
from .mesh import DATA_AXIS


def seq_margin(cfg: CFG) -> int:
    """Receptive-field margin of the decoder stack in mel frames."""
    return cfg.layers * (cfg.attn_window_size or cfg.max_mel_positions)


def make_seq_parallel_generate(
    cfg: CFG,
    decoder,
    schedule: DiffusionSchedule,
    mesh: Mesh,
    num_steps: int,
    axis: str = DATA_AXIS,
    prediction: Optional[str] = None,
):
    """Build a jitted ``(params, sem_idx, x_T) -> x0`` that shards the mel
    TIME dimension of one long utterance over ``mesh.shape[axis]`` devices.

    ``x_T.shape[1]`` must divide by the axis size (checked at trace time —
    a silent remainder would drop frames and shift every shard's positional
    offsets after the first all_gather).  ``prediction`` defaults to the
    checkpoint's training objective (``cfg.use_v_prediction``), the same
    rule EdgeInference applies.  Semantics match ``schedule.ddim_sample``
    (same grid, eta=0, returns final x0).
    """
    n = mesh.shape[axis]
    stride = max(schedule.T // num_steps, 1)
    ts = schedule.get_schedule_for_steps(num_steps)
    if prediction is None:
        prediction = "v" if cfg.use_v_prediction else "eps"

    def shard_fn(params, sem_idx, x):
        B, T, D = x.shape
        if T % n:
            raise ValueError(
                f"sequence length {T} must divide by the {n}-device "
                f"'{axis}' axis (pad the mel frames to a multiple)"
            )
        T_loc = T // n
        M = seq_margin(cfg)
        Te = min(T, T_loc + 2 * M)
        i = jax.lax.axis_index(axis)
        start = jnp.clip(i * T_loc - M, 0, T - Te)
        crop_off = i * T_loc - start
        x0_loc = None
        for si, t in enumerate(ts):
            x_ext = jax.lax.dynamic_slice_in_dim(x, start, Te, 1)
            t_b = jnp.full((B,), t, jnp.int32)
            tp_b = jnp.full((B,), max(t - stride, 0), jnp.int32)
            i_b = jnp.full((B,), si, jnp.int32)
            out = decoder.apply(
                {"params": params}, x_ext, t_b, sem_idx=sem_idx,
                step_idx=i_b, pos_offset=start,
            )
            if prediction == "v":
                eps = schedule.predict_eps_from_v(x_ext, t_b, out)
            else:
                eps = out
            x_next, x0 = schedule.get_ddim_step(x_ext, t_b, tp_b, eps, eta=0.0)
            x_crop = jax.lax.dynamic_slice_in_dim(x_next, crop_off, T_loc, 1)
            x0_loc = jax.lax.dynamic_slice_in_dim(x0, crop_off, T_loc, 1)
            x = jax.lax.all_gather(x_crop, axis, axis=1, tiled=True)
        return jax.lax.all_gather(x0_loc, axis, axis=1, tiled=True)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),   # params/context/x replicated; activations
        out_specs=P(),              # inside shard_fn are the sharded load
        check_vma=False,
    )
    return jax.jit(sharded)


def seq_parallel_generate(
    cfg: CFG,
    decoder,
    schedule: DiffusionSchedule,
    params,
    sem_idx: jnp.ndarray,
    x_T: jnp.ndarray,
    num_steps: int,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    prediction: Optional[str] = None,
) -> jnp.ndarray:
    """One-shot convenience wrapper around make_seq_parallel_generate."""
    fn = make_seq_parallel_generate(
        cfg, decoder, schedule, mesh, num_steps, axis, prediction
    )
    return fn(params, sem_idx, x_T)
