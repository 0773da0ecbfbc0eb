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

_U32 = 0xFFFFFFFF


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


# -- RDKit-compatible ECFP hashing ------------------------------------------
# Replicates RDKit's Morgan fingerprint bit assignment so fingerprints (and
# the sklearn baselines built on them) match the reference numerically:
# boost-style uint32 hash_combine over the connectivity invariants
# (MorganFingerprints.cpp getConnectivityInvariants + calcFingerprint),
# layer-seeded neighbour hashing with sorted (bondType, invariant) pairs,
# and environment deduplication by unique bond sets.

def _hash_combine(seed: int, v: int) -> int:
    seed ^= (v + 0x9E3779B9 + ((seed << 6) & _U32) + (seed >> 2)) & _U32
    return seed & _U32


def _hash_range(values) -> int:
    seed = 0
    for v in values:
        seed = _hash_combine(seed, v & _U32)
    return seed


def _connectivity_invariants(mol: Molecule) -> List[int]:
    from ..chem.periodic import ATOMIC_MASS
    invars = []
    for a in mol.atoms:
        delta_mass = int(a.mass - ATOMIC_MASS.get(a.atomic_num, a.mass))
        components = [a.atomic_num, mol.total_degree(a.idx), a.num_hs,
                      a.formal_charge, delta_mass]
        if a.in_ring:
            components.append(1)
        invars.append(_hash_range(components))
    return invars


def morgan_environments(mol: Molecule, radius: int) -> List[int]:
    """RDKit-compatible circular environment identifiers (layer 0..radius)
    with unique-bond-set deduplication."""
    n = mol.n_atoms
    if n == 0:
        return []
    invariants = _connectivity_invariants(mol)
    ids = list(invariants)
    # neighborhood[a] = set of bond ids covered by a's environment so far
    neighborhoods = [set() for _ in range(n)]
    seen_envs = set()
    for layer in range(1, radius + 1):
        round_ids = []
        round_nbrhoods = []
        round_invariants = list(invariants)
        for a in range(n):
            bonds = mol.atom_bonds(a)
            if not bonds:
                continue
            nbrs = []
            env = set(neighborhoods[a])
            for b in bonds:
                order = 12 if (b.order == AROMATIC or b.is_aromatic) \
                    else int(b.order)
                nbrs.append((order, invariants[b.other(a)]))
                env.add(b.idx)
                env |= neighborhoods[b.other(a)]
            nbrs.sort()
            invar = layer & _U32
            invar = _hash_combine(invar, invariants[a])
            for order, nbr_inv in nbrs:
                invar = _hash_combine(invar, order)
                invar = _hash_combine(invar, nbr_inv)
            round_invariants[a] = invar
            round_nbrhoods.append((tuple(sorted(env)), invar, a))
        # dedup: one id per unique bond set, smallest invariant wins
        round_nbrhoods.sort()
        new_neighborhoods = list(neighborhoods)
        for env, invar, a in round_nbrhoods:
            new_neighborhoods[a] = set(env)
            if env not in seen_envs:
                seen_envs.add(env)
                round_ids.append(invar)
        invariants = round_invariants
        neighborhoods = new_neighborhoods
        ids.extend(round_ids)
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
