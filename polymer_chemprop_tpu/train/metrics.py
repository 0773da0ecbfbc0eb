"""Evaluation metric registry (reference utils.py:367-487) and
evaluate_predictions (reference train/evaluate.py:11-80)."""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    auc,
    log_loss,
    mean_absolute_error,
    mean_squared_error,
    precision_recall_curve,
    r2_score,
    roc_auc_score,
)


def prc_auc(targets, preds) -> float:
    precision, recall, _ = precision_recall_curve(targets, preds)
    return auc(recall, precision)


def bce_metric(targets, preds) -> float:
    eps = 1e-7
    p = np.clip(np.asarray(preds, dtype=float), eps, 1 - eps)
    t = np.asarray(targets, dtype=float)
    return float(np.mean(-(t * np.log(p) + (1 - t) * np.log(1 - p))))


def rmse(targets, preds) -> float:
    return math.sqrt(mean_squared_error(targets, preds))


def mse_metric(targets, preds) -> float:
    return mean_squared_error(targets, preds)


def accuracy(targets, preds, threshold: float = 0.5) -> float:
    if isinstance(preds[0], (list, np.ndarray)):
        hard = [int(np.argmax(p)) for p in preds]
    else:
        hard = [1 if p > threshold else 0 for p in preds]
    return accuracy_score(targets, hard)


def sid_metric(model_spectra, target_spectra, threshold: Optional[float] = None) -> float:
    """(reference spectra_utils.py:42-83) — mean summed SID per spectrum.
    Note: the reference averages only the final batch (`np.mean(loss)` on
    the last chunk, spectra_utils.py:81); we average over all spectra,
    which is the evident intent."""
    losses = []
    preds = np.array(model_spectra, dtype=float)
    masks = np.array([[x is not None for x in b] for b in target_spectra])
    targets = np.array([[1.0 if x is None else x for x in b] for b in target_spectra])
    if threshold is not None:
        preds[preds < threshold] = threshold
    preds[~masks] = 0
    preds = preds / np.sum(preds, axis=1, keepdims=True)
    preds[~masks] = 1
    loss = preds * np.log(preds / targets) + targets * np.log(targets / preds)
    losses = np.sum(loss, axis=1)
    return float(np.mean(losses))


def wasserstein_metric(model_spectra, target_spectra,
                       threshold: Optional[float] = None) -> float:
    """(reference spectra_utils.py:131-159)."""
    preds = np.array(model_spectra, dtype=float)
    masks = np.array([[x is not None for x in b] for b in target_spectra])
    targets = np.array([[0.0 if x is None else x for x in b] for b in target_spectra])
    if threshold is not None:
        preds[preds < threshold] = threshold
    preds[~masks] = 0
    preds = preds / np.sum(preds, axis=1, keepdims=True)
    loss = np.abs(np.cumsum(preds, axis=1) - np.cumsum(targets, axis=1))
    return float(np.mean(np.sum(loss, axis=1)))


def roundrobin_sid(spectra: np.ndarray,
                   threshold: Optional[float] = None) -> List[float]:
    """Average pairwise SID across ensemble members per spectrum — the
    spectra-ensemble uncertainty measure (reference spectra_utils.py:211-241).

    spectra: (num_spectra, spectrum_length, ensemble_size)."""
    out = []
    for spectrum in np.array(spectra, dtype=float):
        nan_mask = np.isnan(spectrum[:, 0])
        if threshold is not None:
            spectrum[spectrum < threshold] = threshold
        spectrum[nan_mask, :] = 1
        ensemble_size = spectrum.shape[1]
        pair_losses = []
        for a in range(ensemble_size):
            for b in range(a + 1, ensemble_size):
                pa, pb = spectrum[:, a], spectrum[:, b]
                loss = pa * np.log(pa / pb) + pb * np.log(pb / pa)
                loss[nan_mask] = 0
                pair_losses.append(loss.sum())
        out.append(float(np.mean(pair_losses)) if pair_losses else 0.0)
    return out


METRICS: Dict[str, Callable] = {
    "auc": roc_auc_score,
    "prc-auc": prc_auc,
    "rmse": rmse,
    "mse": mse_metric,
    "mae": mean_absolute_error,
    "r2": r2_score,
    "accuracy": accuracy,
    "cross_entropy": log_loss,
    "binary_cross_entropy": bce_metric,
    "sid": sid_metric,
    "wasserstein": wasserstein_metric,
}


def get_metric_fn(metric: str) -> Callable:
    if metric not in METRICS:
        raise ValueError(f'Metric "{metric}" not supported.')
    return METRICS[metric]


def minimize_score(metric: str) -> bool:
    """Whether lower is better (reference args.py:456-460)."""
    return metric in {"rmse", "mae", "mse", "cross_entropy",
                      "binary_cross_entropy", "sid", "wasserstein"}


def evaluate_predictions(preds: List[List[float]],
                         targets: List[List[Optional[float]]],
                         num_tasks: int,
                         metrics: List[str],
                         dataset_type: str) -> Dict[str, List[float]]:
    """Per-task metric evaluation with None filtering and degenerate-class
    guards (reference train/evaluate.py:11-80)."""
    if len(preds) == 0:
        return {metric: [float("nan")] * num_tasks for metric in metrics}

    if dataset_type == "spectra":
        results: Dict[str, List[float]] = {}
        for metric in metrics:
            fn = get_metric_fn(metric)
            results[metric] = [fn(preds, targets)]
        return results

    valid_preds: List[List] = [[] for _ in range(num_tasks)]
    valid_targets: List[List] = [[] for _ in range(num_tasks)]
    for i in range(len(preds)):
        for j in range(num_tasks):
            if targets[i][j] is not None:
                valid_preds[j].append(preds[i][j])
                valid_targets[j].append(targets[i][j])

    results = {metric: [] for metric in metrics}
    for j in range(num_tasks):
        if dataset_type == "classification":
            nan = False
            if all(t == 0 for t in valid_targets[j]) or \
                    all(t == 1 for t in valid_targets[j]):
                nan = True
            if all(p == 0 for p in valid_preds[j]) or \
                    all(p == 1 for p in valid_preds[j]):
                nan = True
            if nan:
                for metric in metrics:
                    results[metric].append(float("nan"))
                continue
        if len(valid_targets[j]) == 0:
            for metric in metrics:
                results[metric].append(float("nan"))
            continue
        for metric in metrics:
            fn = get_metric_fn(metric)
            if dataset_type == "multiclass" and metric == "cross_entropy":
                results[metric].append(fn(valid_targets[j], valid_preds[j],
                                          labels=list(range(len(valid_preds[j][0])))))
            else:
                results[metric].append(fn(valid_targets[j], valid_preds[j]))
    return results
