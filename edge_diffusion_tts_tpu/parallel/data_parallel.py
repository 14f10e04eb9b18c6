"""Data-parallel training and inference over a device mesh.

Strategy (SURVEY §2.3 / BASELINE north star): the model is ~650K params, so
parameters and optimizer state replicate; the batch shards over the "data"
mesh axis; gradients (and batch-statistics like the VQ EMA updates) allreduce
with ``jax.lax.pmean`` — XLA lowers these to ICI collectives on a real TPU
slice.  Implemented with ``shard_map`` so the collective placement is
explicit, then jitted with the state donated.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..training.state import TrainState
from ..training.steps import Trainer
from .mesh import DATA_AXIS


def _pmean_floats(tree, axis: str):
    """pmean float leaves; pass integer leaves through (identical per shard,
    e.g. the VQ update counter)."""
    return jax.tree.map(
        lambda x: jax.lax.pmean(x, axis)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


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
    loss_fn = trainer.make_diffusion_loss(vq_weight)
    tx = trainer.tx

    def local_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.vq_state, batch, rng
        )
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.tree.map(
            lambda x: jax.lax.pmean(x.astype(jnp.float32), axis), metrics
        )
        if new_vq_state:
            new_vq_state = _pmean_floats(new_vq_state, axis)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            vq_state=new_vq_state,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=0)


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
    from ..training.state import ema_update

    loss_fn = (
        trainer.make_pd_two_step_loss(num_steps, vq_weight)
        if exact
        else trainer.make_progressive_loss(num_steps, vq_weight)
    )
    tx = trainer.tx

    def local_step(state: TrainState, batch: Dict, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.teacher, state.vq_state, batch, rng
        )
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.tree.map(
            lambda x: jax.lax.pmean(x.astype(jnp.float32), axis), metrics
        )
        if new_vq_state:
            new_vq_state = _pmean_floats(new_vq_state, axis)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_teacher = (
            ema_update(state.teacher, new_params["decoder"], ema_decay)
            if state.teacher is not None
            else None
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
    from ..training.state import ema_update

    tx = trainer.tx
    if exact:
        loss_fn = trainer.make_consistency_exact_loss(
            vq_weight, consistency_weight=consistency_weight
        )
    else:
        loss_fn = trainer.make_consistency_loss(
            vq_weight, consistency_weight=consistency_weight
        )

    def local_step(state: TrainState, batch: Dict, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if exact:
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
        if new_vq_state:
            new_vq_state = _pmean_floats(new_vq_state, axis)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_teacher = (
            ema_update(state.teacher, new_params["decoder"], ema_decay)
            if exact and state.teacher is not None
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
