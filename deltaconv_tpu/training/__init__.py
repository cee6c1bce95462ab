"""Training layer: losses, metrics, train state, jitted steps,
checkpointing."""

from .checkpoint import (latest_step, restore_any, restore_checkpoint,
                         save_checkpoint)
from .logging import MetricsLogger, make_run_dir
from .loop import (
    FitConfig,
    evaluate_classification,
    evaluate_segmentation,
    evaluate_voting,
    fit,
)
from .losses import cross_entropy, smooth_cross_entropy
from .metrics import accuracy, balanced_accuracy, shape_iou
from .steps import make_eval_step, make_train_step
from .train_state import (
    TrainState,
    adam_steplr,
    cosine_epoch_schedule,
    create_train_state,
    sgd_momentum,
)

__all__ = [
    "FitConfig",
    "MetricsLogger",
    "TrainState",
    "evaluate_classification",
    "evaluate_segmentation",
    "evaluate_voting",
    "fit",
    "make_run_dir",
    "accuracy",
    "adam_steplr",
    "balanced_accuracy",
    "cosine_epoch_schedule",
    "create_train_state",
    "cross_entropy",
    "latest_step",
    "restore_any",
    "make_eval_step",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
    "sgd_momentum",
    "shape_iou",
    "smooth_cross_entropy",
]
