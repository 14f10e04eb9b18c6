"""Train state and optimizer construction.

The state is one flax.struct pytree carrying params, mutable VQ statistics,
optimizer state, the EMA teacher (distillation phases), and the step counter —
everything a jitted step needs, everything a checkpoint must hold.  This
improves on the reference, which loses optimizer and schedule state across
resume (reference: edge_diffusion_tts/train.py:117-123).

Optimizer: AdamW with cosine LR + linear warmup (reference:
train_v2.py:84-94), global-norm clipping (train.py:167), the frozen HuBERT
subtree masked out via optax.multi_transform, and optional gradient
accumulation via optax.MultiSteps (reference: config.py:136).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import CFG


@flax.struct.dataclass
class TrainState:
    """All mutable training state as one pytree."""

    step: jnp.ndarray
    params: Any  # {"encoder": ..., "decoder": ...}
    vq_state: Any  # mutable VQ collections ({} for FSQ)
    opt_state: Any
    teacher: Optional[Any] = None  # EMA copy of params["decoder"]

    def with_teacher(self) -> "TrainState":
        """Initialize the EMA teacher from the current decoder params.

        Reference: ConsistencyTrainer.init_teacher (consistency.py:37-42).
        """
        return self.replace(teacher=jax.tree.map(jnp.copy, self.params["decoder"]))


def ema_update(teacher: Any, student: Any, decay: float = 0.999) -> Any:
    """teacher <- decay * teacher + (1 - decay) * student (tree lerp).

    Reference: ConsistencyTrainer.update_teacher (consistency.py:44-50).
    """
    return jax.tree.map(
        lambda t, s: t * decay + s.astype(t.dtype) * (1.0 - decay), teacher, student
    )


def make_lr_schedule(
    cfg: CFG, total_steps: int, base_lr: Optional[float] = None
) -> optax.Schedule:
    """Cosine decay with linear warmup (reference: train_v2.py:84-94)."""
    base_lr = base_lr if base_lr is not None else cfg.lr
    warmup = max(int(total_steps * cfg.warmup_frac), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=1e-6,
    )


def _is_frozen(path) -> bool:
    """True for params that must not train (the HuBERT subtree)."""
    return any(getattr(k, "key", str(k)) == "hubert" for k in path)


def make_optimizer(
    cfg: CFG,
    total_steps: int,
    base_lr: Optional[float] = None,
    learning_rate: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Masked AdamW: clip -> adamw(cosine+warmup); HuBERT subtree frozen."""
    lr = learning_rate or make_lr_schedule(cfg, total_steps, base_lr)
    adamw = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay),
    )
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze" if _is_frozen(path) else "train", params
        ),
    )
    if cfg.grad_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation)
    return tx


def create_train_state(
    cfg: CFG,
    params: Any,
    vq_state: Any,
    tx: optax.GradientTransformation,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        vq_state=vq_state,
        opt_state=tx.init(params),
        teacher=None,
    )
