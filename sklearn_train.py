"""Trains a scikit-learn RF/SVM baseline on Morgan fingerprints (reference sklearn_train.py)."""

from polymer_chemprop_tpu.sklearn_train import sklearn_train


if __name__ == "__main__":
    sklearn_train()
