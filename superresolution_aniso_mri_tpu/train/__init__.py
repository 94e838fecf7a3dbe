"""Training layer: functional steps, state, checkpointing, orchestration."""
from .state import SRTrainState, create_train_state, make_optimizer
from .steps import (LossConfig, FAMILY_OF_MODEL, make_train_step,
                    make_eval_step, make_multi_train_step)
from .checkpoint import save_checkpoint, load_checkpoint, load_checkpoint_raw
from .trainer import Trainer, get_trainer, loss_config_from_args, \
    weight_annealing_schedule

__all__ = [
    "SRTrainState", "create_train_state", "make_optimizer",
    "LossConfig", "FAMILY_OF_MODEL", "make_train_step", "make_eval_step",
    "make_multi_train_step",
    "save_checkpoint", "load_checkpoint", "load_checkpoint_raw",
    "Trainer", "get_trainer", "loss_config_from_args",
    "weight_annealing_schedule",
]
