"""Computes learned molecular fingerprints (reference fingerprint.py)."""

from polymer_chemprop_tpu.cli import chemprop_fingerprint


if __name__ == "__main__":
    chemprop_fingerprint()
