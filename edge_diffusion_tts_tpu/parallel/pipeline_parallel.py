"""Pipeline parallelism: the decoder backbone staged over a "pipe" mesh axis.

GPipe-style schedule, TPU-idiomatically: the decoder's ``cfg.layers``
transformer blocks are stacked into one [L, ...] params pytree and sharded
over the ``pipe`` axis (L/S blocks per stage).  Inside ``shard_map`` each
stage runs the same traced program: a ``lax.scan`` over (num_microbatches +
num_stages - 1) ticks; at tick ``k`` stage ``s`` processes microbatch
``k - s`` (bubble ticks are masked out), applies its local block stack with
an inner ``lax.scan``, and hands its activation to stage ``s+1`` with
``lax.ppermute`` — the collective rides ICI.  The last stage's outputs are
collected from the tick history and broadcast with a masked ``psum``.

Everything AROUND the backbone — mel frontend, frozen encoder, embeddings
prelude, loss, optimizer — runs replicated under plain ``jit``; XLA/GSPMD
propagates the stack's sharding into the backward pass, so the existing
optimizer (incl. ``clip_by_global_norm`` over the GLOBAL tree) is reused
unchanged and one PP step is numerically the single-device step (see
tests/test_pipeline_parallel.py).

The decoder model is small enough to replicate (~2.3M params), so PP here is
the capability/scale demonstration (it is what makes deep decoders with
many more layers trainable on a pod slice); data parallelism remains the
deployment default (parallel/data_parallel.py).

Reference: the torch reference is single-GPU and has no pipeline trainer;
this subsystem extends SURVEY §2.3's parallelism beyond parity scope.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import CFG
from ..models.decoder import backbone_block
from ..training.steps import Trainer

PIPE_AXIS = "pipe"


# ---------------------------------------------------------------------------
# params <-> stacked-stage layout
# ---------------------------------------------------------------------------


def stack_layer_params(dec_params: Dict) -> Tuple[Any, Dict]:
    """Split decoder params into (stacked layer pytree [L, ...], rest).

    The stack's leading axis is the layer index; sharding it over the pipe
    axis gives each stage its contiguous block of layers.
    """
    names = sorted(
        (k for k in dec_params if k.startswith("layers_")),
        key=lambda k: int(k.split("_")[-1]),
    )
    layers = [dec_params[k] for k in names]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in dec_params.items() if not k.startswith("layers_")}
    return stack, rest


def unstack_layer_params(stack: Any, rest: Dict) -> Dict:
    """Inverse of :func:`stack_layer_params`."""
    n_layers = jax.tree.leaves(stack)[0].shape[0]
    out = dict(rest)
    for i in range(n_layers):
        out[f"layers_{i}"] = jax.tree.map(lambda x: x[i], stack)
    return out


def pp_pack_decoder(dec_params: Dict) -> Dict:
    """Decoder tree -> {"pp_stack": [L, ...] pytree, "pp_rest": the rest}.

    The packed form REPLACES the decoder subtree inside the params pytree,
    so every existing step/loss factory (all phases, validation, the EMA
    teacher lerp) operates on it unchanged; ``PPTrainer._decode`` detects it
    and routes through the pipelined backbone.
    """
    stack, rest = stack_layer_params(dec_params)
    return {"pp_stack": stack, "pp_rest": rest}


def pp_unpack_decoder(dec_params: Dict) -> Dict:
    return unstack_layer_params(dec_params["pp_stack"], dec_params["pp_rest"])


def is_pp_packed(dec_params) -> bool:
    return isinstance(dec_params, dict) and "pp_stack" in dec_params


def pp_pack_params(params: Dict) -> Dict:
    """{"encoder", "decoder"} -> same tree with the decoder subtree packed."""
    out = dict(params)
    out["decoder"] = pp_pack_decoder(params["decoder"])
    return out


def pp_unpack_params(params: Dict) -> Dict:
    out = dict(params)
    out["decoder"] = pp_unpack_decoder(params["decoder"])
    return out


def pp_param_sharding(mesh: Mesh, packed: Dict, axis: str = PIPE_AXIS) -> Dict:
    """NamedShardings for a packed tree: stack over ``axis``, rest replicated."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    out = {
        k: jax.tree.map(lambda _: repl, v)
        for k, v in packed.items()
        if k != "decoder"
    }
    out["decoder"] = {
        "pp_stack": jax.tree.map(lambda _: shard, packed["decoder"]["pp_stack"]),
        "pp_rest": jax.tree.map(lambda _: repl, packed["decoder"]["pp_rest"]),
    }
    return out


# ---------------------------------------------------------------------------
# the pipelined backbone
# ---------------------------------------------------------------------------


def make_pp_backbone(
    cfg: CFG,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = PIPE_AXIS,
    dtype: jnp.dtype = jnp.float32,
    use_pallas: Optional[bool] = None,
    data_axis: Optional[str] = None,
) -> Callable:
    """Pipelined equivalent of ``EdgeDiffusionDecoder.backbone``.

    Returns ``fwd(stack, h0, context, t_cond, rng=None, deterministic=True)
    -> h`` where ``stack`` is the [L, ...] layer pytree (sharded over
    ``axis``) and the activations are full-batch [B, T, H].

    With ``data_axis`` set (2D ``(data, pipe)`` mesh) the microbatch
    examples additionally shard over the data axis — each data row of the
    mesh runs the same pipeline schedule on its batch shard, composing DP
    with PP; without it the activations replicate.
    """
    block = backbone_block(cfg, dtype, use_pallas)
    n_stages = mesh.shape[axis]
    n_mb = num_microbatches
    if cfg.layers % n_stages:
        raise ValueError(
            f"layers={cfg.layers} not divisible by pipe axis size {n_stages}"
        )
    perm = [(i, i + 1) for i in range(n_stages - 1)]
    act_spec = P(None, data_axis)  # [M, mb, T, H]: examples over data axis

    def local_pipeline(
        det, stack_local, h0_mb, ctx_mb, cond_mb, rng,
        mel_mask_mb=None, ctx_mask_mb=None,
    ):
        s = jax.lax.axis_index(axis)
        if data_axis is not None:
            # Distinct dropout streams per data shard.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def apply_stack(h, context, cond, key, mel_mask, ctx_mask):
            def body(carry, lp):
                h, i = carry
                rngs = (
                    None
                    if det
                    else {"dropout": jax.random.fold_in(key, i)}
                )
                h = block.apply(
                    {"params": lp},
                    h,
                    context=context,
                    cond=cond,
                    deterministic=det,
                    mel_mask=mel_mask,
                    ctx_mask=ctx_mask,
                    rngs=rngs,
                )
                return (h, i + 1), None

            (h, _), _ = jax.lax.scan(body, (h, jnp.int32(0)), stack_local)
            return h

        def tick(act, k):
            mb = jnp.clip(k - s, 0, n_mb - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, mb, 0, keepdims=False
            )
            h_in = jnp.where(s == 0, take(h0_mb), act)
            # Distinct dropout stream per (stage, tick); bubble ticks are
            # masked out of the output so their draws are inert.
            key = jax.random.fold_in(jax.random.fold_in(rng, k), s)
            y = apply_stack(
                h_in, take(ctx_mb), take(cond_mb), key,
                None if mel_mask_mb is None else take(mel_mask_mb),
                None if ctx_mask_mb is None else take(ctx_mask_mb),
            )
            act_next = jax.lax.ppermute(y, axis, perm)
            return act_next, y

        act0 = jnp.zeros_like(h0_mb[0])
        # The carry becomes device-varying after ppermute; mark the initial
        # zeros accordingly (JAX's varying-manual-axes check in shard_map).
        if hasattr(jax.lax, "pcast"):
            act0 = jax.lax.pcast(act0, (axis,), to="varying")
        elif hasattr(jax.lax, "pvary"):
            act0 = jax.lax.pvary(act0, (axis,))
        _, ys = jax.lax.scan(
            tick, act0, jnp.arange(n_mb + n_stages - 1)
        )
        # Stage S-1 emits microbatch m at tick m + S - 1; mask everything
        # else and broadcast the collected outputs to all stages.
        out_last = jax.lax.dynamic_slice_in_dim(ys, n_stages - 1, n_mb, 0)
        out = jnp.where(s == n_stages - 1, out_last, 0.0)
        return jax.lax.psum(out, axis)

    def fwd(stack, h0, context, t_cond, rng=None, deterministic=True,
            mel_mask=None, ctx_mask=None):
        B, T, H = h0.shape
        if B % n_mb:
            raise ValueError(f"batch {B} not divisible by microbatches {n_mb}")
        mb = B // n_mb
        split = lambda a: a.reshape((n_mb, mb) + a.shape[1:])
        if rng is None:
            rng = jax.random.PRNGKey(0)
        masked = mel_mask is not None or ctx_mask is not None
        if masked:
            # Attention key masks (variable-length serving batches) split per
            # microbatch exactly like the activations they gate; a missing
            # side is synthesized as all-valid so both cases share one
            # program shape.
            if mel_mask is None:
                mel_mask = jnp.ones((B, T), bool)
            if ctx_mask is None:
                ctx_mask = jnp.ones((B, context.shape[1]), bool)
            args = (
                stack, split(h0), split(context), split(t_cond), rng,
                split(mel_mask), split(ctx_mask),
            )
            specs = (P(axis), act_spec, act_spec, act_spec, P(),
                     act_spec, act_spec)
        else:
            args = (stack, split(h0), split(context), split(t_cond), rng)
            specs = (P(axis), act_spec, act_spec, act_spec, P())
        sharded = shard_map(
            functools.partial(local_pipeline, bool(deterministic)),
            mesh=mesh,
            in_specs=specs,
            out_specs=act_spec,
        )
        out_mb = sharded(*args)
        return out_mb.reshape(B, T, H)

    return fwd


# ---------------------------------------------------------------------------
# the pipeline-parallel trainer
# ---------------------------------------------------------------------------


class PPTrainer(Trainer):
    """Trainer whose decoder forward pipelines over the ``pipe`` mesh axis.

    Every loss, phase step, and the DPM++/epsilon validation funnel through
    ``Trainer._decode``; this subclass overrides ONLY that method, detecting
    :func:`pp_pack_decoder`-packed trees (student params AND the EMA
    teacher) and routing them through the pipelined backbone — so all three
    training phases, both exact-objective variants, and validation pipeline
    with zero duplicated loss math.  With dropout off, a PP step matches
    the single-device step to f32 tolerance (tests/test_pipeline_parallel).
    """

    def __init__(
        self,
        cfg: CFG,
        encoder,
        decoder,
        schedule,
        tx,
        mesh: Mesh,
        num_microbatches: int,
        axis: str = PIPE_AXIS,
        data_axis: Optional[str] = None,
    ):
        super().__init__(cfg, encoder, decoder, schedule, tx)
        self.mesh = mesh
        self.pipe_axis = axis
        self.data_axis = data_axis
        self.num_microbatches = num_microbatches
        self._pp_fwd = make_pp_backbone(
            cfg, mesh, num_microbatches, axis=axis,
            dtype=decoder.dtype, use_pallas=decoder.use_pallas,
            data_axis=data_axis,
        )

    def _context_pair(self, params, sem_idx, sem_features):
        # token_emb/sem_proj live prelude-side: in pp_rest on a packed tree.
        if is_pp_packed(params):
            params = params["pp_rest"]
        return super()._context_pair(params, sem_idx, sem_features)

    def _decode(self, params, x_t, t, rng=None, deterministic=True, **cond):
        if not is_pp_packed(params):
            return super()._decode(
                params, x_t, t, rng=rng, deterministic=deterministic, **cond
            )
        # Attention key masks (variable-length serving batches) thread into
        # the staged backbone per microbatch; the prelude is maskless like
        # the non-PP decoder (padded context rows embed but are excluded
        # from attention inside the blocks).
        sem_mask = cond.pop("sem_mask", None)
        mel_mask = cond.pop("mel_mask", None)
        rest = {"params": params["pp_rest"]}
        h0, context, t_cond = self.decoder.apply(
            rest, x_t, t, method=self.decoder.prelude, **cond
        )
        h = self._pp_fwd(
            params["pp_stack"], h0, context, t_cond,
            rng=rng, deterministic=deterministic or rng is None,
            mel_mask=mel_mask, ctx_mask=sem_mask,
        )
        return self.decoder.apply(rest, h, method=self.decoder.postlude)


def make_pp_trainer(
    trainer: Trainer,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> PPTrainer:
    """Lift an existing Trainer's modules into a PPTrainer."""
    return PPTrainer(
        trainer.cfg, trainer.encoder, trainer.decoder, trainer.schedule,
        trainer.tx, mesh, num_microbatches, axis=axis, data_axis=data_axis,
    )


def make_pp_diffusion_step(
    trainer: Trainer,
    mesh: Mesh,
    num_microbatches: int,
    vq_weight: Optional[float] = None,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> Callable:
    """Phase-1 step with the decoder backbone pipelined over ``axis``.

    ``(state, batch, rng) -> (state, metrics)`` on a TrainState whose
    params are :func:`pp_pack_params`-packed.  This is
    ``Trainer.make_diffusion_step`` verbatim — only the decode inside the
    loss is pipelined — so with dropout disabled one PP step matches the
    single-device step to float32 tolerance.

    ``data_axis`` composes DP×PP on a 2D mesh: shard the incoming batch
    with ``NamedSharding(mesh, P(data_axis))``; everything outside the
    backbone's shard_map — encoder, loss reduction, gradient allreduce of
    the replicated params — is partitioned by GSPMD from the argument
    shardings.
    """
    return make_pp_trainer(
        trainer, mesh, num_microbatches, axis=axis, data_axis=data_axis
    ).make_diffusion_step(vq_weight)


def create_pp_state(cfg: CFG, params: Dict, vq_state, tx, mesh: Mesh,
                    axis: str = PIPE_AXIS):
    """Pack params, place them on the mesh, and build a fresh TrainState.

    Optimizer moments start at zero (pack at phase start or step 0; a
    mid-run conversion would need the moments restacked the same way).
    """
    from ..training.state import TrainState

    packed = pp_pack_params(params)
    sh = pp_param_sharding(mesh, packed, axis)
    packed = jax.tree.map(jax.device_put, packed, sh)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=packed,
        vq_state=vq_state,
        opt_state=tx.init(packed),
        teacher=None,
    )
