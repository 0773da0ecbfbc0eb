"""Shared utilities: checkpointing, logging."""

from .checkpoint import load_checkpoint, load_opt_state, save_checkpoint
from .logging import get_logger, timeit

__all__ = ["get_logger", "load_checkpoint", "load_opt_state",
           "save_checkpoint", "timeit"]
