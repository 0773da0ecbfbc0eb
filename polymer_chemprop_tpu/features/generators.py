"""Molecule-level features generators (reference features_generators.py).

Name registry with decorator registration; Morgan/ECFP fingerprints are
computed on the standalone chemistry runtime (circular substructure hashing
with the standard ECFP invariants). Bit positions differ from RDKit's
hashes, but the representational content — radius-2 circular environments
folded to n bits — is the same, which is what the downstream consumers
(FFN input features, sklearn baselines) rely on.

``rdkit_2d``/``rdkit_2d_normalized`` require descriptastorus+rdkit; like
the reference's ImportError mocks (features_generators.py:92-133) they
raise a clear error when unavailable.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, List, Union

import numpy as np

from ..chem import Molecule, parse_smiles
from ..chem.mol import AROMATIC

Mol = Union[str, Molecule]

FEATURES_GENERATOR_REGISTRY: Dict[str, Callable] = {}


def register_features_generator(name: str) -> Callable:
    def decorator(fn):
        FEATURES_GENERATOR_REGISTRY[name] = fn
        return fn
    return decorator


def get_features_generator(name: str) -> Callable:
    if name not in FEATURES_GENERATOR_REGISTRY:
        raise ValueError(f'Features generator "{name}" could not be found.')
    return FEATURES_GENERATOR_REGISTRY[name]


def get_available_features_generators() -> List[str]:
    return list(FEATURES_GENERATOR_REGISTRY.keys())


MORGAN_RADIUS = 2
MORGAN_NUM_BITS = 2048


def _as_mol(mol: Mol) -> Molecule:
    if isinstance(mol, str):
        m = parse_smiles(mol, strict=False)
        if m is None:
            return Molecule()
        return m
    return mol


def _hash(*vals) -> int:
    h = hashlib.sha1(repr(vals).encode()).digest()
    return int.from_bytes(h[:8], "little")


def morgan_environments(mol: Molecule, radius: int) -> List[int]:
    """Circular environment identifiers for every atom at radii 0..radius."""
    ids = []
    inv = {}
    for a in mol.atoms:
        inv[a.idx] = _hash(a.atomic_num, mol.degree(a.idx), a.num_hs,
                           a.formal_charge, a.in_ring, a.is_aromatic)
    ids.extend(inv.values())
    for _ in range(radius):
        new = {}
        for a in mol.atoms:
            nbrs = []
            for b in mol.atom_bonds(a.idx):
                order = "ar" if (b.order == AROMATIC or b.is_aromatic) else b.order
                nbrs.append((_hash(order), inv[b.other(a.idx)]))
            new[a.idx] = _hash(inv[a.idx], tuple(sorted(nbrs)))
        inv = new
        ids.extend(inv.values())
    return ids


@register_features_generator("morgan")
def morgan_binary_features_generator(mol: Mol,
                                     radius: int = MORGAN_RADIUS,
                                     num_bits: int = MORGAN_NUM_BITS) -> np.ndarray:
    """Binary Morgan fingerprint (reference features_generators.py:52-69)."""
    m = _as_mol(mol)
    fp = np.zeros((num_bits,), dtype=float)
    for e in morgan_environments(m, radius):
        fp[e % num_bits] = 1.0
    return fp


@register_features_generator("morgan_count")
def morgan_counts_features_generator(mol: Mol,
                                     radius: int = MORGAN_RADIUS,
                                     num_bits: int = MORGAN_NUM_BITS) -> np.ndarray:
    """Count-based Morgan fingerprint (reference features_generators.py:72-89)."""
    m = _as_mol(mol)
    fp = np.zeros((num_bits,), dtype=float)
    for e in morgan_environments(m, radius):
        fp[e % num_bits] += 1.0
    return fp


@register_features_generator("rdkit_2d")
def rdkit_2d_features_generator(mol: Mol) -> np.ndarray:
    raise ImportError(
        "Failed to import descriptastorus/rdkit. The rdkit_2d generator is "
        "unavailable in this environment; precompute features with "
        "--features_path instead (reference features_generators.py:92-112 "
        "raises the same way without descriptastorus).")


@register_features_generator("rdkit_2d_normalized")
def rdkit_2d_normalized_features_generator(mol: Mol) -> np.ndarray:
    raise ImportError(
        "Failed to import descriptastorus/rdkit. The rdkit_2d_normalized "
        "generator is unavailable in this environment; precompute features "
        "with --features_path instead.")
