"""Jitted train/predict step factories.

Each factory closes over the static ModelConfig and returns a pure,
``jax.jit``-compiled function over fixed-shape batch pytrees — the whole
reference per-batch loop (train.py:39-88: forward, masked loss, backward,
clip, optimizer step, per-step Noam LR) compiles into ONE XLA executable,
with the LR schedule folded in as a function of the optax step count.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import ModelConfig, apply_model, postprocess_preds
from .loss import get_loss_fn, masked_loss


def batch_pytree(device_batch) -> Dict:
    """DeviceBatch -> plain dict pytree for jit."""
    d = {
        "graphs": device_batch.graph_arrays,
        "targets": device_batch.targets,
        "mask": device_batch.mask,
        "weights": device_batch.data_weights,
    }
    if device_batch.features is not None:
        d["features"] = device_batch.features
    if device_batch.atom_descriptors is not None:
        d["atom_descriptors"] = device_batch.atom_descriptors
    return d


def make_loss_fn(cfg: ModelConfig,
                 target_weights: Optional[jnp.ndarray] = None,
                 alternative_loss_function: Optional[str] = None,
                 spectra_target_floor: Optional[float] = None) -> Callable:
    elementwise = get_loss_fn(cfg.dataset_type, alternative_loss_function)

    def loss_fn(params, batch, rng):
        preds = apply_model(
            params, batch["graphs"], cfg,
            features=batch.get("features"),
            atom_descriptors=batch.get("atom_descriptors"),
            dropout_key=rng, deterministic=rng is None)
        targets, mask = batch["targets"], batch["mask"]
        if cfg.dataset_type == "multiclass":
            preds3 = preds.reshape(preds.shape[0], -1, cfg.multiclass_num_classes)
            elem = elementwise(preds3, targets)
        elif cfg.dataset_type == "spectra":
            elem = elementwise(preds, targets, mask, spectra_target_floor)
        else:
            elem = elementwise(preds, targets)
        return masked_loss(elem, mask, target_weights, batch["weights"])

    return loss_fn


def make_train_step(cfg: ModelConfig,
                    tx: optax.GradientTransformation,
                    target_weights: Optional[jnp.ndarray] = None,
                    alternative_loss_function: Optional[str] = None,
                    spectra_target_floor: Optional[float] = None) -> Callable:
    loss_fn = make_loss_fn(cfg, target_weights, alternative_loss_function,
                           spectra_target_floor)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng))(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return new_params, new_opt_state, loss, gnorm

    return train_step


@functools.lru_cache(maxsize=32)
def make_predict_step(cfg: ModelConfig) -> Callable:
    """ModelConfig is hashable, so repeated calls (e.g. MCTS interpret
    scoring thousands of fragment batches) reuse one jitted function and
    its compilation cache instead of re-tracing per call."""
    @jax.jit
    def predict_step(params, batch):
        preds = apply_model(params, batch["graphs"], cfg,
                            features=batch.get("features"),
                            atom_descriptors=batch.get("atom_descriptors"),
                            deterministic=True)
        return postprocess_preds(preds, cfg)

    return predict_step


@functools.lru_cache(maxsize=32)
def make_embed_step(cfg: ModelConfig) -> Callable:
    """Forward returning (postprocessed preds, graph embeddings) — the fork's
    return_embeddings path (reference model.py:152-194, predict.py:41-66)."""

    @jax.jit
    def embed_step(params, batch):
        preds, emb = apply_model(params, batch["graphs"], cfg,
                                 features=batch.get("features"),
                                 atom_descriptors=batch.get("atom_descriptors"),
                                 deterministic=True, return_embeddings=True)
        return postprocess_preds(preds, cfg), emb

    return embed_step
