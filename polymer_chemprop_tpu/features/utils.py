"""Feature file I/O (reference features/utils.py:11-107).

Supports .npz (key 'features'), .npy, .csv, and pickled sparse formats for
molecule-level features, and .npz/.pkl for per-atom/bond features.
"""

from __future__ import annotations

import csv
import os
import pickle
from typing import List

import numpy as np


def save_features(path: str, features: List[np.ndarray]) -> None:
    np.savez_compressed(path, features=features)


def load_features(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1]
    if ext == ".npz":
        return np.load(path)["features"]
    if ext == ".npy":
        return np.load(path)
    if ext in (".csv", ".txt"):
        with open(path) as f:
            reader = csv.reader(f)
            next(reader)
            return np.array([[float(v) for v in row] for row in reader])
    if ext in (".pkl", ".pckl", ".pickle"):
        with open(path, "rb") as f:
            feats = pickle.load(f)
        return np.array([np.squeeze(np.array(feat.todense())) for feat in feats])
    raise ValueError(f'Features path extension "{ext}" not supported.')


def load_valid_atom_or_bond_features(path: str, smiles: List[str]) -> List[np.ndarray]:
    """Per-molecule atom/bond feature arrays keyed by position or SMILES
    (reference features/utils.py:60-107)."""
    ext = os.path.splitext(path)[1]
    if ext == ".npz":
        container = np.load(path)
        features = [container[key] for key in container]
    elif ext in (".pkl", ".pckl", ".pickle"):
        import pandas as pd
        features_df = pd.read_pickle(path)
        if features_df.iloc[0, 0].ndim == 1:
            features = features_df.apply(lambda x: np.stack(x.tolist(), axis=1),
                                         axis=1).tolist()
        elif features_df.iloc[0, 0].ndim == 2:
            features = features_df.apply(lambda x: np.concatenate(x.tolist(), axis=1),
                                         axis=1).tolist()
        else:
            raise ValueError("Atom/bond descriptors input format not supported")
    else:
        raise ValueError(f'Extension "{ext}" is not supported.')
    if len(features) != len(smiles):
        raise ValueError("The number of molecules/features mismatch")
    return features
