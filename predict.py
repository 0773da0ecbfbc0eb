"""Loads a trained model checkpoint and makes predictions (reference predict.py)."""

from polymer_chemprop_tpu.cli import chemprop_predict


if __name__ == "__main__":
    chemprop_predict()
