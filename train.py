"""Trains a model on a dataset (reference train.py)."""

from polymer_chemprop_tpu.cli import chemprop_train


if __name__ == "__main__":
    chemprop_train()
