"""Reconstructed polymer EA/IP benchmark (the fork's headline capability;
reference README.md:1-14, Aldeghi & Coley Chem. Sci. 2022, 13, 10486).

The paper's xTB-labelled dataset is unobtainable offline (docs/parity.md),
so scripts/make_eaip_benchmark.py reconstructs the benchmark's structure
— real photocatalyst monomer pairs x {alternating, block, random}
architecture x stoichiometry x Xn as reference-grammar ensemble strings —
with surrogate EA/IP labels carrying explicit composition, interface
(architecture) and Xn terms. The paper's central claim is then testable:
the weighted ensemble graph (wD-MPNN) must learn the architecture signal
that an architecture-blind representation provably cannot (its inputs are
identical across architectures while the labels differ)."""

import csv
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "EA", "IP"])
        for s, ea, ip in rows:
            w.writerow([s, f"{ea:.6f}", f"{ip:.6f}"])


def _run(tmp_path, rows, name):
    from polymer_chemprop_tpu.config import TrainConfig
    from polymer_chemprop_tpu.train import cross_validate
    path = str(tmp_path / f"{name}.csv")
    _write(path, rows)
    cfg = TrainConfig(data_path=path, dataset_type="regression",
                      polymer=True, epochs=60, num_folds=1, seed=0,
                      pytorch_seed=0, batch_size=50,
                      save_dir=str(tmp_path / name), quiet=True,
                      metric="rmse", extra_metrics=["r2"])
    cross_validate(cfg)
    import json
    with open(tmp_path / name / "fold_0" / "test_scores.json") as f:
        scores = json.load(f)
    return (float(np.mean(scores["rmse"])), float(np.mean(scores["r2"])))


@pytest.mark.golden
def test_eaip_weighted_beats_architecture_blind(tmp_path):
    from make_eaip_benchmark import generate
    rmse_w, r2_w = _run(tmp_path, generate(blind_weights=False), "weighted")
    rmse_b, r2_b = _run(tmp_path, generate(blind_weights=True), "blind")
    # the wD-MPNN must resolve architecture/stoichiometry/Xn well
    assert r2_w > 0.90, (rmse_w, r2_w)
    # and must beat the architecture-blind representation decisively
    assert rmse_w < rmse_b * 0.85, (rmse_w, rmse_b)


def test_eaip_generator_strings_valid():
    """Every generated ensemble string featurizes warning-free (weights
    sum to 1 at every attachment point) in both arms."""
    import warnings
    from make_eaip_benchmark import generate
    from polymer_chemprop_tpu.features import FeaturizationConfig, MolGraph
    fcfg = FeaturizationConfig(polymer=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for blind in (False, True):
            rows = generate(blind_weights=blind)
            assert len(rows) == 972
            for s, _, _ in rows[::97]:
                MolGraph(s, fcfg)
