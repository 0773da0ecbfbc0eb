"""Run reference golden configs end-to-end ON THE TPU CHIP (axon).

Re-validates the golden-score configurations (reference
tests/test_integration.py golden values; see tests/test_integration.py
TestGoldenScores here) through the Pallas rev-fused band kernels instead
of the CPU/XLA oracle path the pytest golden suite uses. Results are
recorded in docs/parity.md ("TPU-hardware goldens").

Usage: python scripts/tpu_goldens.py <config> [<config> ...]
Configs: reg_rdkit cls_morgan reaction_morgan spectra_exclusions
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "data")

REFS = {
    "reg_rdkit": 0.807828,
    "cls_morgan": 0.619021,
    "reaction_morgan": 2.846405,
    "spectra_exclusions": 0.001617717,
}


def cfg_for(name, tmp):
    from polymer_chemprop_tpu.config import TrainConfig
    base = dict(data_path=os.path.join(DATA, "regression.csv"),
                dataset_type="regression", epochs=10, num_folds=3, seed=0,
                save_dir=tmp, quiet=True, num_workers=2)
    if name == "reg_rdkit":
        base.update(features_path=[os.path.join(DATA, "regression.npz")],
                    no_features_scaling=True)
    elif name == "cls_morgan":
        base.update(data_path=os.path.join(DATA, "classification.csv"),
                    dataset_type="classification",
                    features_generator=["morgan"])
    elif name == "reaction_morgan":
        base.update(data_path=os.path.join(DATA, "reaction_regression.csv"),
                    reaction=True, reaction_mode="reac_diff",
                    features_generator=["morgan"])
    elif name == "spectra_exclusions":
        base.update(data_path=os.path.join(DATA, "spectra_exclusions.csv"),
                    dataset_type="spectra",
                    split_type="random_with_repeated_smiles",
                    features_path=[os.path.join(DATA,
                                                "spectra_features.csv")])
    else:
        raise SystemExit(f"unknown config {name}")
    return TrainConfig(**base)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    from polymer_chemprop_tpu.train import cross_validate
    for name in sys.argv[1:]:
        with tempfile.TemporaryDirectory() as tmp:
            cfg = cfg_for(name, tmp)
            mean, std = cross_validate(cfg)
            ref = REFS[name]
            print(f"GOLDEN {name}: {mean:.6g} ref={ref:.6g} "
                  f"dev={100 * (mean - ref) / ref:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
