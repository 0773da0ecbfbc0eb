"""Optimizes hyperparameters via TPE (reference hyperparameter_optimization.py)."""

from polymer_chemprop_tpu.cli import chemprop_hyperopt


if __name__ == "__main__":
    chemprop_hyperopt()
