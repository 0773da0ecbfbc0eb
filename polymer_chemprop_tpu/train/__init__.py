"""Training / inference orchestration layer."""

from .cross_validate import TEST_SCORES_FILE_NAME, chemprop_train, cross_validate
from .evaluate import evaluate
from .loss import get_loss_fn, masked_loss
from .metrics import evaluate_predictions, get_metric_fn, minimize_score
from .predict import predict
from .scheduler import build_optimizer, build_schedule, noam_schedule
from .step import (
    batch_pytree,
    make_embed_step,
    make_loss_fn,
    make_predict_step,
    make_train_step,
)
from .trainer import build_model_config, run_training

__all__ = [
    "TEST_SCORES_FILE_NAME", "batch_pytree", "build_model_config",
    "build_optimizer", "build_schedule", "chemprop_train", "cross_validate",
    "evaluate", "evaluate_predictions", "get_loss_fn", "get_metric_fn",
    "make_embed_step", "make_loss_fn", "make_predict_step", "make_train_step",
    "masked_loss", "minimize_score", "noam_schedule", "predict",
    "run_training",
]
