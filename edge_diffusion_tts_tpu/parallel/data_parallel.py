"""Data-parallel training and inference over a device mesh.

Strategy (SURVEY §2.3 / BASELINE north star): the model is ~650K params, so
parameters and optimizer state replicate; the batch shards over the "data"
mesh axis; gradients allreduce with ``jax.lax.pmean`` — XLA lowers these to
ICI collectives on a real TPU slice.  Implemented with ``shard_map`` so the
collective placement is explicit, then jitted with the state donated.

VQ EMA statistics are NOT handled by averaging per-shard results (that would
dilute cluster counts by the shard count and falsely kill live codes):
the quantizer itself psums its raw batch statistics over the data axis
(models/vq.py ``axis_name``), which makes the update bit-equal to the
single-device big-batch step and leaves the resulting vq_state replicated.
The factories below clone the trainer's encoder with ``vq_axis_name`` set
so this happens automatically inside the sharded loss.
"""

from __future__ import annotations

import copy
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..training.state import TrainState, ema_update
from ..training.steps import Trainer
from .mesh import DATA_AXIS


def _mesh_trainer(trainer: Trainer, axis: str) -> Trainer:
    """Shallow trainer copy whose encoder computes global-batch VQ statistics
    over ``axis`` (no-op for FSQ encoders, which carry no EMA state)."""
    enc = trainer.encoder
    if enc is None or getattr(enc, "vq_axis_name", None) == axis:
        return trainer
    t = copy.copy(trainer)
    t.encoder = enc.clone(vq_axis_name=axis)
    return t


def _make_dp_step(
    trainer: Trainer,
    mesh: Mesh,
    make_loss: Callable[[Trainer], Callable],
    axis: str,
    uses_teacher: bool,
    teacher_ema_decay: Optional[float],
) -> Callable:
    """Shared shard_map step body for all three phases.

    ``make_loss(trainer)`` builds the phase loss from the mesh-aware trainer;
    ``uses_teacher`` selects the (params, teacher, vq_state, batch, rng) loss
    signature; ``teacher_ema_decay`` EMA-updates the teacher toward the new
    student params when set (and a teacher exists).
    """
    trainer = _mesh_trainer(trainer, axis)
    loss_fn = make_loss(trainer)
    tx = trainer.tx

    def local_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if uses_teacher:
            grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.teacher, state.vq_state, batch, rng
            )
        else:
            grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.vq_state, batch, rng
            )
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.tree.map(
            lambda x: jax.lax.pmean(x.astype(jnp.float32), axis), metrics
        )
        # Same metrics contract as the single-device step (grads are already
        # allreduced, so this equals the big-batch gradient norm).
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_teacher = (
            ema_update(
                state.teacher, new_params["decoder"],
                trainer._teacher_decay(new_opt_state, teacher_ema_decay),
            )
            if teacher_ema_decay is not None and state.teacher is not None
            else state.teacher
        )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                vq_state=new_vq_state,
                opt_state=new_opt_state,
                teacher=new_teacher,
            ),
            metrics,
        )

    sharded = shard_map(
        local_step, mesh=mesh, in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=0)


def make_dp_diffusion_step(
    trainer: Trainer,
    mesh: Mesh,
    vq_weight: Optional[float] = None,
    axis: str = DATA_AXIS,
) -> Callable:
    """Data-parallel phase-1 step: ``(state, batch, rng) -> (state, metrics)``.

    The batch's leading dim shards over ``axis``; state replicates.  Each
    shard draws an independent RNG stream (fold in the axis index), computes
    local grads, and allreduces grads/metrics/VQ statistics, so the update is
    identical on every shard — numerically the same as one big-batch step.
    """
    return _make_dp_step(
        trainer, mesh,
        lambda t: t.make_diffusion_loss(vq_weight),
        axis, uses_teacher=False, teacher_ema_decay=None,
    )


def make_dp_progressive_step(
    trainer: Trainer,
    mesh: Mesh,
    num_steps: int,
    vq_weight: float = 0.05,
    ema_decay: float = 0.999,
    exact: bool = False,
    axis: str = DATA_AXIS,
) -> Callable:
    """Data-parallel phase-2 (progressive distillation) step.

    ``exact=True`` uses the two-step-teacher objective
    (Trainer.make_pd_two_step_loss), mirroring the single-device step.
    """
    return _make_dp_step(
        trainer, mesh,
        lambda t: (
            t.make_pd_two_step_loss(num_steps, vq_weight)
            if exact
            else t.make_progressive_loss(num_steps, vq_weight)
        ),
        axis, uses_teacher=True, teacher_ema_decay=ema_decay,
    )


def make_dp_consistency_step(
    trainer: Trainer,
    mesh: Mesh,
    vq_weight: float = 0.05,
    exact: bool = False,
    ema_decay: float = 0.999,
    consistency_weight: float = 1.0,
    axis: str = DATA_AXIS,
) -> Callable:
    """Data-parallel phase-3 (consistency) step.

    ``exact=True`` uses the adjacent-timestep EMA-teacher objective
    (Trainer.make_consistency_exact_loss) with the teacher EMA-updated per
    step, mirroring the single-device step.
    """
    return _make_dp_step(
        trainer, mesh,
        lambda t: (
            t.make_consistency_exact_loss(
                vq_weight, consistency_weight=consistency_weight
            )
            if exact
            else t.make_consistency_loss(
                vq_weight, consistency_weight=consistency_weight
            )
        ),
        axis, uses_teacher=exact, teacher_ema_decay=ema_decay if exact else None,
    )


def make_dp_generate(
    inference_build: Callable,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    masked: bool = False,
) -> Callable:
    """Shard a batched generate program over the data axis.

    ``inference_build`` is e.g. ``EdgeInference._build_generate_mel(n)``'s
    underlying function ``(params, sem_idx, rng, temperature) -> mel``; the
    batched 32-utterance config (BASELINE.md) shards utterances over chips.
    ``masked=True`` expects the serving variant with a trailing ``sem_mask``
    [B, S] argument (serving.py ragged batches), sharded like the batch.
    """
    from jax.sharding import NamedSharding

    in_shardings = [
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P(axis)),
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P()),
    ]
    if masked:
        in_shardings.append(NamedSharding(mesh, P(axis)))
    return jax.jit(
        inference_build,
        in_shardings=tuple(in_shardings),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
