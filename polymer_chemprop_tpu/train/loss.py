"""Loss functions (reference utils.py:338-364 registry + train.py:67-74
masked aggregation).

All losses are elementwise with explicit mask/weight multiplication and
``sum / mask.sum()`` reduction, exactly as the reference trains. Spectra
losses (SID / Wasserstein) follow reference spectra_utils.py:9-159.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def bce_with_logits(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on logits (torch BCEWithLogitsLoss)."""
    return jnp.maximum(preds, 0) - preds * targets + jnp.log1p(jnp.exp(-jnp.abs(preds)))


def mse(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return (preds - targets) ** 2


def cross_entropy_multiclass(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """preds (M, tasks, classes) logits; targets (M, tasks) int class ids.
    Returns (M, tasks) elementwise CE (torch CrossEntropyLoss reduction=none)."""
    logp = jax.nn.log_softmax(preds, axis=-1)
    t = targets.astype(jnp.int32)
    return -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]


def sid_loss(preds: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray,
             threshold: Optional[float] = None) -> jnp.ndarray:
    """Spectral information divergence (reference spectra_utils.py:9-40):
    predictions are thresholded, masked, normalized to sum 1; excluded
    positions are set to 1 on both sides so their log(1/1) term is zero."""
    if threshold is not None:
        preds = jnp.maximum(preds, threshold)
    preds = jnp.where(mask > 0, preds, 0.0)
    norm = jnp.sum(preds, axis=1, keepdims=True)
    preds = preds / jnp.where(norm == 0, 1.0, norm)
    targets_ = jnp.where(mask > 0, targets, 1.0)
    preds = jnp.where(mask > 0, preds, 1.0)
    return preds * jnp.log(preds / targets_) + \
        targets_ * jnp.log(targets_ / preds)


def wasserstein_loss(preds: jnp.ndarray, targets: jnp.ndarray,
                     mask: jnp.ndarray,
                     threshold: Optional[float] = None) -> jnp.ndarray:
    """1-D earth-mover loss on normalized spectra via CDF differences
    (reference spectra_utils.py:86-128)."""
    if threshold is not None:
        preds = jnp.maximum(preds, threshold)
    preds = jnp.where(mask > 0, preds, 0.0)
    targets_ = jnp.where(mask > 0, targets, 0.0)
    norm = jnp.sum(preds, axis=1, keepdims=True)
    preds = preds / jnp.where(norm == 0, 1.0, norm)
    cdf_p = jnp.cumsum(preds, axis=1)
    cdf_t = jnp.cumsum(targets_, axis=1)
    return jnp.abs(cdf_p - cdf_t)


def get_loss_fn(dataset_type: str,
                alternative_loss_function: Optional[str] = None) -> Callable:
    """(reference utils.py get_loss_func:338-364)."""
    if alternative_loss_function is not None:
        if dataset_type == "spectra" and alternative_loss_function == "wasserstein":
            return wasserstein_loss
        raise ValueError(
            f"Alternative loss function {alternative_loss_function} not "
            f"supported with dataset type {dataset_type}.")
    if dataset_type == "classification":
        return bce_with_logits
    if dataset_type == "regression":
        return mse
    if dataset_type == "multiclass":
        return cross_entropy_multiclass
    if dataset_type == "spectra":
        return sid_loss
    raise ValueError(f'Dataset type "{dataset_type}" not supported.')


def masked_loss(elementwise: jnp.ndarray, mask: jnp.ndarray,
                target_weights: Optional[jnp.ndarray],
                data_weights: jnp.ndarray) -> jnp.ndarray:
    """loss = sum(elem * target_w * data_w * mask) / sum(mask)
    (reference train.py:67-74)."""
    x = elementwise * mask * data_weights
    if target_weights is not None:
        x = x * target_weights
    return x.sum() / jnp.maximum(mask.sum(), 1.0)
