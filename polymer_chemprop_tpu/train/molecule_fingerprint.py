"""Latent-representation extraction CLI
(reference train/molecule_fingerprint.py:16-190).

Computes MPN graph embeddings or last-FFN activations per molecule from one
or more checkpoints, stacked side by side in the output CSV.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import List, Optional

import jax
import numpy as np

from ..config import PredictConfig, find_checkpoints
from ..data import MoleculeDataLoader, get_data
from ..models import fingerprint as model_fingerprint
from .make_predictions import _num_tasks, load_model
from .step import batch_pytree
from .trainer import build_model_config


@dataclasses.dataclass
class FingerprintConfig(PredictConfig):
    fingerprint_type: str = "MPN"  # MPN | last_FFN (reference args.py:731-735)


def molecule_fingerprint(args: FingerprintConfig) -> np.ndarray:
    ckpts = find_checkpoints(args.checkpoint_dir, args.checkpoint_path,
                             args.checkpoint_paths)
    best = [c for c in ckpts if os.path.basename(c) == "best_model.ckpt"]
    if best:
        ckpts = best

    params0, tcfg, _ = load_model(ckpts[0])
    fcfg = tcfg.featurization()
    # keep unparseable rows so the output preserves every input row with
    # 'Invalid SMILES' placeholders (reference molecule_fingerprint.py:44-60)
    from ..data.csv_io import partition_valid
    full_data = get_data(args.test_path, args.smiles_columns, target_columns=[],
                         number_of_molecules=args.number_of_molecules,
                         config=fcfg,
                         skip_invalid_smiles=False,
                         features_path=args.features_path,
                         features_generators=args.features_generator or
                         tcfg.features_generator,
                         store_row=True)
    full_to_valid, test_data = partition_valid(full_data, fcfg)
    model_cfg = build_model_config(
        tcfg, _num_tasks(tcfg), features_size=test_data.features_size(),
        data_smiles=(s for dp in test_data for s in dp.smiles))
    if len(test_data) == 0:
        # all rows unparseable: placeholder CSV at the fingerprint width
        width = (model_cfg.ffn_hidden_size if args.fingerprint_type ==
                 "last_FFN" else model_cfg.first_linear_dim) * len(ckpts)
        if args.preds_path:
            os.makedirs(os.path.dirname(args.preds_path) or ".",
                        exist_ok=True)
            with open(args.preds_path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["smiles"] + [f"fp_{i}" for i in range(width)])
                for d in full_data:
                    w.writerow([".".join(d.smiles)] +
                               ["Invalid SMILES"] * width)
        return np.zeros((0, width))
    loader = MoleculeDataLoader(test_data, fcfg, batch_size=args.batch_size,
                                num_workers=args.num_workers,
                                use_pallas=None)

    all_fps = []
    for ckpt in ckpts:
        params, tcfg_i, scalers = load_model(ckpt)
        if any(scalers.get(k) is not None for k in
               ("features_scaler", "atom_descriptor_scaler",
                "bond_feature_scaler")):
            test_data.reset_features_and_targets()
            if test_data.features() is not None and \
                    scalers.get("features_scaler") is not None:
                test_data.normalize_features(scalers["features_scaler"])
            if scalers.get("atom_descriptor_scaler") is not None:
                test_data.normalize_features(
                    scalers["atom_descriptor_scaler"],
                    scale_atom_descriptors=True)
            if scalers.get("bond_feature_scaler") is not None:
                test_data.normalize_features(
                    scalers["bond_feature_scaler"], scale_bond_features=True)

        @jax.jit
        def fp_step(p, batch):
            return model_fingerprint(p, batch["graphs"], model_cfg,
                                     features=batch.get("features"),
                                     fingerprint_type=args.fingerprint_type)

        fps = []
        for batch in loader:
            out = fp_step(params, batch_pytree(batch))
            fps.append(np.asarray(out)[:batch.size])
        all_fps.append(np.concatenate(fps, axis=0))
    stacked = np.concatenate(all_fps, axis=1)

    if args.preds_path:
        os.makedirs(os.path.dirname(args.preds_path) or ".", exist_ok=True)
        with open(args.preds_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["smiles"] + [f"fp_{i}" for i in range(stacked.shape[1])])
            for i, d in enumerate(full_data):
                v = full_to_valid.get(i)
                row = list(stacked[v]) if v is not None \
                    else ["Invalid SMILES"] * stacked.shape[1]
                w.writerow([".".join(d.smiles)] + row)
    return stacked


def chemprop_fingerprint(argv: Optional[List[str]] = None) -> None:
    """CLI entry (reference molecule_fingerprint.py:185-190)."""
    import argparse
    from ..config import _add_field_args
    parser = argparse.ArgumentParser(prog="polymer_chemprop_tpu fingerprint")
    _add_field_args(parser, FingerprintConfig)
    ns = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(FingerprintConfig)}
    molecule_fingerprint(FingerprintConfig(
        **{k: v for k, v in vars(ns).items() if k in known}))
