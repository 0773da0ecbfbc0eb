"""Batch prediction over a data loader (reference train/predict.py:10-68)."""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from ..data import MoleculeDataLoader, StandardScaler
from .step import batch_pytree


def predict(params,
            predict_step: Callable,
            data_loader: MoleculeDataLoader,
            scaler: Optional[StandardScaler] = None,
            return_embeddings: bool = False,
            embed_step: Optional[Callable] = None
            ) -> Tuple[List[List[float]], Optional[np.ndarray]]:
    """Run eval-mode forward over all batches; trims padding rows and
    inverse-transforms targets when a scaler is given
    (reference predict.py:54-55)."""
    all_preds: List[np.ndarray] = []
    all_embeddings: List[np.ndarray] = []
    for batch in data_loader:
        pt = batch_pytree(batch)
        if return_embeddings:
            preds, emb = embed_step(params, pt)
            all_embeddings.append(np.asarray(emb)[:batch.size])
        else:
            preds = predict_step(params, pt)
        all_preds.append(np.asarray(preds)[:batch.size])
    preds = np.concatenate(all_preds, axis=0) if all_preds else np.zeros((0, 0))
    if scaler is not None:
        preds = scaler.inverse_transform(preds)
    emb = np.concatenate(all_embeddings, axis=0) if all_embeddings else None
    return preds.tolist(), emb
