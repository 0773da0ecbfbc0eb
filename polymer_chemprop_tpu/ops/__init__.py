"""Compute ops: XLA segment primitives and Pallas TPU kernels."""

from .segment import (
    atom_readout,
    bond_message_step,
    molecule_readout,
    segment_sum,
    weighted_segment_sum,
)

__all__ = [
    "atom_readout", "bond_message_step", "molecule_readout",
    "segment_sum", "weighted_segment_sum",
]
