"""Interprets model predictions via MCTS rationales (reference interpret.py)."""

from polymer_chemprop_tpu.interpret import chemprop_interpret


if __name__ == "__main__":
    chemprop_interpret()
