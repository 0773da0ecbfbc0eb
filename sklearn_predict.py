"""Predicts with a trained scikit-learn baseline (reference sklearn_predict.py)."""

from polymer_chemprop_tpu.sklearn_predict import sklearn_predict


if __name__ == "__main__":
    sklearn_predict()
