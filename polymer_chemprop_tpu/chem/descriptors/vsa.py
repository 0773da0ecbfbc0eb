"""Labute approximate surface areas and the MOE-type VSA descriptor bins.

Standalone replacement for ``rdkit.Chem.MolSurf`` / the ``PEOE_VSA`` /
``SMR_VSA`` / ``SlogP_VSA`` / ``EState_VSA`` / ``VSA_EState`` families.

Per-atom accessible-area contributions follow Labute, J. Mol. Graph.
Model. 2000 ("An approximation to molecular surface areas"): each atom
is a Bondi-radius sphere; each bonded neighbour removes a spherical cap
computed from an idealized bond length (sum of covalent radii with a
bond-order correction); implicit hydrogens cut their caps but their own
surface is accumulated separately (RDKit ``getLabuteAtomContribs``
hContrib).

Bin boundaries are the published RDKit values.
"""

from __future__ import annotations

import math
from typing import List

from ..mol import AROMATIC, Molecule
from .crippen import atom_contribs as crippen_contribs
from .estate import estate_indices
from .gasteiger import gasteiger_charges

# Bondi van der Waals radii (Å) as in RDKit's periodic table
_RVDW = {
    1: 1.2, 5: 2.13, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 14: 2.1,
    15: 1.8, 16: 1.8, 17: 1.75, 35: 1.85, 53: 1.98, 33: 1.85, 34: 1.9,
    50: 2.17, 11: 2.27, 19: 2.75, 3: 1.82, 12: 1.73, 20: 2.0, 30: 1.39,
    26: 1.94, 29: 1.4, 13: 1.84,
}
# single-bond covalent radii (Å), RDKit Rb0
_RCOV = {
    1: 0.33, 5: 0.84, 6: 0.77, 7: 0.7, 8: 0.66, 9: 0.611, 14: 1.17,
    15: 1.1, 16: 1.04, 17: 0.997, 35: 1.167, 53: 1.336, 33: 1.21,
    34: 1.17, 50: 1.4, 11: 1.54, 19: 1.96, 3: 1.23, 12: 1.36, 20: 1.74,
    30: 1.25, 26: 1.24, 29: 1.28, 13: 1.25,
}
_DEFAULT_RVDW = 1.8
_DEFAULT_RCOV = 1.1


def _bond_length(mol: Molecule, b) -> float:
    """Idealized bond length: covalent-radii sum with order correction."""
    r1 = _RCOV.get(mol.atoms[b.a1].atomic_num, _DEFAULT_RCOV)
    r2 = _RCOV.get(mol.atoms[b.a2].atomic_num, _DEFAULT_RCOV)
    d = r1 + r2
    if b.is_aromatic or b.order == AROMATIC:
        d -= 0.14
    elif b.order == 2:
        d -= 0.21
    elif b.order == 3:
        d -= 0.38
    return d


def _cap_area(ri: float, rj: float, d: float) -> float:
    """Spherical-cap area removed from sphere i by neighbour j at
    distance d (clamped into the geometrically valid range)."""
    d = min(max(d, abs(ri - rj)), ri + rj)
    if d <= 0:
        return 0.0
    h = ri - (d * d + ri * ri - rj * rj) / (2.0 * d)
    h = min(max(h, 0.0), 2.0 * ri)
    return 2.0 * math.pi * ri * h


def labute_asa_contribs(mol: Molecule):
    """Returns (per-heavy-atom contributions, total H contribution).

    RDKit's getLabuteAtomContribs uses the COVALENT radii (Rb0) as the
    sphere radii, so single bonds at the idealized length (covalent sum)
    remove a vanishing cap and only multiple/aromatic-bond corrections
    bite — this is what produces the canonical per-environment values
    the published VSA bin boundaries (4.78..11) are built around
    (sp3 C 7.45, aromatic CH 6.77, N 6.16, O 5.47, F 4.69, S 13.6)."""
    n = mol.n_atoms
    out = [0.0] * n
    rh = _RCOV[1]
    h_total = 0.0
    for i in range(n):
        a = mol.atoms[i]
        ri = _RCOV.get(a.atomic_num, _DEFAULT_RCOV)
        area = 4.0 * math.pi * ri * ri
        for b in mol.atom_bonds(i):
            j = b.other(i)
            rj = _RCOV.get(mol.atoms[j].atomic_num, _DEFAULT_RCOV)
            area -= _cap_area(ri, rj, _bond_length(mol, b))
        # implicit hydrogens (bond at exact covalent sum -> zero cap on
        # the heavy atom; the H sphere itself goes to hContrib)
        nh = a.num_hs
        if nh:
            dh = ri + rh
            area -= nh * _cap_area(ri, rh, dh)
            h_area = 4.0 * math.pi * rh * rh - _cap_area(rh, ri, dh)
            h_total += nh * max(h_area, 0.0)
        out[i] = max(area, 0.0)
    return out, h_total


def labute_asa(mol: Molecule) -> float:
    contribs, h = labute_asa_contribs(mol)
    return sum(contribs) + h


# ---------------------------------------------------------------------------
# VSA bins (published RDKit boundaries)
# ---------------------------------------------------------------------------

_SLOGP_BINS = [-0.4, -0.2, 0.0, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6]
_SMR_BINS = [1.29, 1.82, 2.24, 2.45, 2.75, 3.05, 3.63, 3.8, 4.0]
_PEOE_BINS = [-0.3, -0.25, -0.2, -0.15, -0.1, -0.05, 0.0, 0.05, 0.1,
              0.15, 0.2, 0.25, 0.3]
_ESTATE_BINS = [-0.39, 0.29, 0.717, 1.165, 1.54, 1.807, 2.05, 4.69,
                9.17, 15.0]
_VSA_BINS = [4.78, 5.0, 5.41, 5.74, 6.0, 6.07, 6.45, 7.0, 11.0]


def _binned_sum(props: List[float], values: List[float],
                bins: List[float]) -> List[float]:
    out = [0.0] * (len(bins) + 1)
    for p, v in zip(props, values):
        k = 0
        while k < len(bins) and p >= bins[k]:
            k += 1
        out[k] += v
    return out


def slogp_vsa(mol: Molecule) -> List[float]:
    asa, _ = labute_asa_contribs(mol)
    logp = [lp for lp, _ in crippen_contribs(mol, include_hs=False)]
    return _binned_sum(logp, asa, _SLOGP_BINS)


def smr_vsa(mol: Molecule) -> List[float]:
    asa, _ = labute_asa_contribs(mol)
    mr = [m for _, m in crippen_contribs(mol, include_hs=False)]
    return _binned_sum(mr, asa, _SMR_BINS)


def peoe_vsa(mol: Molecule) -> List[float]:
    asa, _ = labute_asa_contribs(mol)
    q, _h = gasteiger_charges(mol)
    return _binned_sum(q, asa, _PEOE_BINS)


def estate_vsa(mol: Molecule) -> List[float]:
    """EState_VSA: ASA contributions binned by EState index."""
    asa, _ = labute_asa_contribs(mol)
    es = estate_indices(mol)
    return _binned_sum(es, asa, _ESTATE_BINS)


def vsa_estate(mol: Molecule) -> List[float]:
    """VSA_EState: EState indices binned by ASA contribution."""
    asa, _ = labute_asa_contribs(mol)
    es = estate_indices(mol)
    return _binned_sum(asa, es, _VSA_BINS)
