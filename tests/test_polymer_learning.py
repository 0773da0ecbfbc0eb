"""Polymer wD-MPNN learning test.

The reference's headline --polymer feature has no test at all (SURVEY.md
§4) and its paper benchmark (EA/IP DFT dataset) is not in the repo. This
test builds a synthetic copolymer dataset whose target depends on exactly
the polymer-specific machinery — monomer stoichiometry, stochastic
connectivity weights, and degree of polymerization — and requires the
model to recover it (test R^2 well above chance), which a model ignoring
the polymer channels cannot do.
"""

import math
import os

import numpy as np
import pytest

from polymer_chemprop_tpu.config import TrainConfig
from polymer_chemprop_tpu.data import get_data
from polymer_chemprop_tpu.train import run_training


MONOMERS = {
    "ethylene": ("[*:1]CC[*:2]", 0.0),
    "styrene": ("[*:1]c1ccc([*:2])cc1", 1.0),
    "peg": ("[*:1]CO[*:2]", -0.5),
    "propylene": ("[*:1]C(C)C[*:2]", 0.3),
}


def _make_dataset(path: str, n: int = 240, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    names = list(MONOMERS)
    rows = ["smiles,target"]
    for _ in range(n):
        a, b = rng.choice(names, size=2, replace=False)
        (sa, va), (sb, vb) = MONOMERS[a], MONOMERS[b]
        sb = sb.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        w = float(rng.choice([0.1, 0.25, 0.5, 0.75, 0.9]))
        xn = float(rng.choice([1, 5, 20, 100, 400]))
        # target depends on stoichiometry-weighted monomer identity AND the
        # degree of polymerization channel — exactly what the polymer
        # readout (w_atoms weighting + (1+log10 Xn) scaling) must capture
        target = (w * va + (1 - w) * vb) * (1 + math.log10(xn)) \
            + rng.normal(0, 0.02)
        s = (f"{sa}.{sb}|{w}|{1 - w}|"
             f"<1-3:0.5:0.5<2-4:0.5:0.5~{xn}")
        rows.append(f'"{s}",{target:.4f}')
    with open(path, "w") as f:
        f.write("\n".join(rows))


class TestPolymerLearning:
    def test_wdmpnn_recovers_polymer_structure_property(self, tmp_path):
        csv_path = str(tmp_path / "poly.csv")
        _make_dataset(csv_path)
        cfg = TrainConfig(data_path=csv_path, dataset_type="regression",
                          polymer=True, epochs=15, batch_size=25, seed=0,
                          hidden_size=64, ffn_hidden_size=64,
                          metric="r2", extra_metrics=["rmse"],
                          save_dir=str(tmp_path / "run"), quiet=True,
                          num_workers=2)
        data = get_data(csv_path, config=cfg.featurization())
        import logging
        log = logging.getLogger("poly")
        log.addHandler(logging.NullHandler())
        log.propagate = False
        scores = run_training(cfg, data, logger=log)
        r2 = float(np.nanmean(scores["r2"]))
        assert r2 > 0.8, f"polymer model failed to learn: test R^2 = {r2:.3f}"
