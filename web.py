"""Runs the web interface (reference web.py)."""

from polymer_chemprop_tpu.web.app import chemprop_web


if __name__ == "__main__":
    chemprop_web()
