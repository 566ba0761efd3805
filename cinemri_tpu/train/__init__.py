"""Training system (reference layer L3, pl_modules/)."""

from cinemri_tpu.train.optim import make_optimizer, step_decay_schedule
from cinemri_tpu.train.step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from cinemri_tpu.train.metrics_agg import MetricsAggregator
from cinemri_tpu.train.checkpoint import CheckpointManager
from cinemri_tpu.train.logging import TrainLogger
from cinemri_tpu.train.loader import Loader, collate
from cinemri_tpu.train.loop import Trainer, TrainerConfig

__all__ = [
    "make_optimizer",
    "step_decay_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "MetricsAggregator",
    "CheckpointManager",
    "TrainLogger",
    "Loader",
    "collate",
    "Trainer",
    "TrainerConfig",
]
