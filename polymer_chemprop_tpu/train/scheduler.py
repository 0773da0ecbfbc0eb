"""Optimizers and LR schedules under optax.

The reference builds Adam/AdamW/SGD (utils.py:295-310, fork addition
args.py:403-408) and a per-step Noam scheduler (nn_utils.py:115-195) plus
constant/cosine/cyclic alternatives (utils.py:490-541). Here schedules are
pure functions of the step count, composed into optax gradient transforms.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import optax


def noam_schedule(init_lr: float, max_lr: float, final_lr: float,
                  warmup_steps: int, total_steps: int) -> Callable:
    """Linear warmup init->max over warmup_steps, then exponential decay
    max->final over the remaining steps (reference nn_utils.py:115-195)."""
    warmup_steps = max(1, int(warmup_steps))
    total_steps = max(warmup_steps + 1, int(total_steps))
    increment = (max_lr - init_lr) / warmup_steps
    gamma = (final_lr / max_lr) ** (1.0 / (total_steps - warmup_steps))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + step * increment
        decay = max_lr * gamma ** (step - warmup_steps)
        return jnp.where(step <= warmup_steps, warm,
                         jnp.where(step <= total_steps, decay, final_lr))

    return schedule


def build_schedule(scheduler: str, *, init_lr: float, max_lr: float,
                   final_lr: float, warmup_epochs: float, epochs: int,
                   steps_per_epoch: int) -> Callable:
    """(reference utils.py:490-541)."""
    total_steps = epochs * steps_per_epoch
    if scheduler == "noam":
        return noam_schedule(init_lr, max_lr, final_lr,
                             int(warmup_epochs * steps_per_epoch), total_steps)
    if scheduler == "constant":
        return optax.constant_schedule(max_lr)
    if scheduler == "cosine":
        return optax.cosine_decay_schedule(max_lr, max(total_steps, 1),
                                           alpha=final_lr / max_lr)
    if scheduler == "cyclic":
        return optax.cosine_onecycle_schedule(max(total_steps, 1), max_lr)
    if scheduler == "exponential":
        return optax.exponential_decay(max_lr, max(steps_per_epoch, 1),
                                       decay_rate=0.95)
    raise ValueError(f'Scheduler "{scheduler}" not supported.')


def build_optimizer(optimizer: str = "adam",
                    schedule: Callable = None,
                    weight_decay: float = 0.0,
                    grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """(reference utils.py:295-310 + train.py:80-81 grad clipping)."""
    if optimizer == "adam":
        tx = optax.adam(learning_rate=schedule)
    elif optimizer == "adamw":
        tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    elif optimizer == "sgd":
        tx = optax.sgd(learning_rate=schedule)
    else:
        raise ValueError(f'Optimizer "{optimizer}" not supported.')
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
