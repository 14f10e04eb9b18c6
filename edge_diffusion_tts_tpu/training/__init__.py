"""Training: state, jitted phase steps, 3-phase driver, checkpointing."""

from .checkpoint import (
    restore_checkpoint,
    restore_final_model,
    restore_hubert_config,
    save_checkpoint,
    save_final_model,
)
from .state import (
    TrainState,
    create_train_state,
    ema_update,
    make_lr_schedule,
    make_optimizer,
)
from .steps import Trainer
from .train import init_models, progressive_step_schedule, train, train_v2

__all__ = [
    "TrainState",
    "Trainer",
    "create_train_state",
    "ema_update",
    "init_models",
    "make_lr_schedule",
    "make_optimizer",
    "progressive_step_schedule",
    "restore_checkpoint",
    "restore_final_model",
    "restore_hubert_config",
    "save_checkpoint",
    "save_final_model",
    "train",
    "train_v2",
]
