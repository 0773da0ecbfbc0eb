#!/usr/bin/env python
"""Direct constrained solve for per-atom-signature ASA bin memberships
(VERDICT r4 item 8 — VSA_EState7/5/2).

The additive ASA model (chem/descriptors/vsa.py) computes every atom's
value from its local signature (element, nH, multiset of (neighbor
element, bond class)) — so ANY model of that class assigns each
signature one fixed VSA bin. The vendored reference outputs label, per
molecule, which VSA bins are EMPTY (interior zero-ties of the
CDF-normalized VSA_EState columns) and which are NOT. Treating the bin
of each signature as a FREE variable, those labels form a constraint
satisfaction problem:

  empty(i, k):    no signature present in molecule i may sit in bin k
  nonempty(i, k): at least one signature of molecule i sits in bin k

If this CSP is INFEASIBLE, no per-signature model — additive,
spherical-cap, or lookup — can reproduce the reference memberships, and
the minimal conflict is the concrete impossibility artifact the three
sub-0.9 column floors rest on. If feasible, the satisfying assignment
bounds how far a refined model could go.

OUTCOME (2026-08-21, recorded in docs/parity.md): with the NAIVE
zero-tie extraction the CSP is massively infeasible (708 conflicts,
concentrated exactly in VSA_EState2/5/7) — but the supervised tie
calibration added below shows those columns' tie clusters are
CLAMP-AMBIGUOUS (non-interior, Jaccard 0.4-0.67 against the trusted
zero sets): the reference CDF saturates around raw 0, so an "empty"
label cannot be distinguished from a clamped negative/positive sum.
The sound conclusion is therefore not model infeasibility but METRIC
saturation — tests/test_descriptors.py::TestTieCeilingColumns shows
our raw columns sit at the injective tie ceiling of the saturated
reference columns (ratios 1.031/1.019/1.001).

Usage: python scripts/vsa_estate_feasibility.py [--sig coarse|fine|kek]
"""

import csv
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from polymer_chemprop_tpu.chem import parse_smiles  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors import RDKIT2D_NAMES  # noqa: E402
from polymer_chemprop_tpu.chem.mol import AROMATIC  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
VSA_COLS = [f"VSA_EState{k}" for k in range(1, 11)]
NBINS = 10
NAME2K = {n: i for i, n in enumerate(RDKIT2D_NAMES)}


def load(split):
    ref = np.load(os.path.join(DATA, f"{split}.npz"))["features"]
    p = (f"{split}_smiles.csv" if split.endswith("_test")
         else f"{split}.csv")
    with open(os.path.join(DATA, p)) as fh:
        smis = [r[0] for r in list(csv.reader(fh))[1:]][:ref.shape[0]]
    return smis, ref


def bond_class(m, b, kek=False):
    if b.is_aromatic or b.order == AROMATIC:
        if kek:
            return {1: 0, 2: 1}.get(b.kekule_order, 0)
        return 3
    return {1: 0, 2: 1, 3: 2}.get(b.order, 0)


def atom_sig(m, i, fine=False, kek=False):
    a = m.atoms[i]
    nbrs = tuple(sorted(
        (m.atoms[b.other(i)].atomic_num, bond_class(m, b, kek))
        for b in m.atom_bonds(i)))
    sig = (a.atomic_num, a.num_hs, nbrs)
    if fine:
        # add the neighbors' degrees — strictly finer than what any
        # additive bond-pair model can distinguish
        deg2 = tuple(sorted(m.degree(b.other(i))
                            for b in m.atom_bonds(i)))
        sig = sig + (deg2, a.formal_charge)
    return sig


def zero_tie_values(ref, smis):
    """Per column: the raw-0 normalized tie, SUPERVISED by our own
    model's zero set (the naive most-frequent-value rule picks CDF
    clamp clusters for VSA_EState5/7 — measured 2026-08-21: bin5's
    bottom clamp lumps raw-0 with negative sums, bin7's CDF saturates
    AT raw 0 so all positive sums share the top value). A tie is SOUND
    only if (a) it is the modal ref value among our-zero molecules,
    (b) it is strictly interior (ref values exist on both sides), and
    (c) the cluster and our zero set agree to >90% Jaccard — bins
    failing this contribute no constraints (their reference labels are
    clamp-ambiguous, not informative)."""
    from polymer_chemprop_tpu.chem.descriptors.vsa import vsa_estate
    ours = []
    for s in smis:
        m = parse_smiles(s)
        ours.append(vsa_estate(m) if m is not None else [np.nan] * NBINS)
    ours = np.array(ours)
    ties = []
    for k in range(NBINS):
        col = ref[:, NAME2K[VSA_COLS[k]]]
        fin = np.isfinite(col)
        zero = fin & (ours[:, k] == 0.0)
        if zero.sum() < 5:
            ties.append(None)
            continue
        cnt = Counter(round(float(v), 12) for v in col[zero])
        v0, n0 = cnt.most_common(1)[0]
        cluster = fin & np.isclose(col, v0, rtol=0, atol=1e-12)
        interior = (col[fin] < v0 - 1e-12).any() and                    (col[fin] > v0 + 1e-12).any()
        inter = (cluster & zero).sum()
        union = (cluster | zero).sum()
        jacc = inter / union if union else 0.0
        if interior and jacc > 0.9:
            ties.append(v0)
        else:
            print(f"  [{VSA_COLS[k]}] tie REJECTED "
                  f"(interior={interior} jaccard={jacc:.2f}) — "
                  f"clamp-ambiguous, no constraints", flush=True)
            ties.append(None)
    return ties


def main():
    sys.setrecursionlimit(100000)
    fine = "--sig" in sys.argv and "fine" in sys.argv
    kek = "--sig" in sys.argv and "kek" in sys.argv
    splits = ("regression", "classification")
    mols_all, empty_all, nonempty_all = [], [], []
    for split in splits:
        smis, ref = load(split)
        print(f"tie calibration [{split}]:", flush=True)
        ties = zero_tie_values(ref, smis)
        for i, s in enumerate(smis):
            m = parse_smiles(s)
            if m is None:
                continue
            emp, non = [], []
            for k in range(NBINS):
                if ties[k] is None:
                    continue
                v = ref[i, NAME2K[VSA_COLS[k]]]
                if not np.isfinite(v):
                    continue
                if np.isclose(v, ties[k], rtol=0, atol=1e-12):
                    emp.append(k)
                else:
                    non.append(k)
            mols_all.append((split, i, m))
            empty_all.append(emp)
            nonempty_all.append(non)

    # signatures per molecule
    mol_sigs = []
    all_sigs = set()
    for _, _, m in mols_all:
        sigs = {atom_sig(m, i, fine, kek) for i in range(m.n_atoms)}
        mol_sigs.append(sigs)
        all_sigs |= sigs
    print(f"molecules={len(mols_all)} signatures={len(all_sigs)} "
          f"({'fine' if fine else 'coarse'}{'+kek' if kek else ''})",
          flush=True)

    # arc consistency: forbid bins via empty constraints
    allowed = {s: set(range(NBINS)) for s in all_sigs}
    forbidders = defaultdict(dict)   # sig -> bin -> first forbidding mol
    for (mi, (key, sigs)) in enumerate(zip(mols_all, mol_sigs)):
        for k in empty_all[mi]:
            for s in sigs:
                if k in allowed[s]:
                    allowed[s].discard(k)
                    forbidders[s][k] = key[:2]

    # check nonempty coverage under the reduced domains
    conflicts = []
    for (mi, (key, sigs)) in enumerate(zip(mols_all, mol_sigs)):
        for k in nonempty_all[mi]:
            if not any(k in allowed[s] for s in sigs):
                conflicts.append((mi, k))

    if conflicts:
        print(f"\nINFEASIBLE after propagation alone: "
              f"{len(conflicts)} nonempty(i,k) constraints have no "
              f"candidate signature.", flush=True)
        by_bin = Counter(k for _, k in conflicts)
        print("per-bin conflict counts "
              f"{ {f'VSA_EState{k+1}': c for k, c in sorted(by_bin.items())} }",
              flush=True)
        for mi, k in conflicts[:6]:
            split, i, m = mols_all[mi]
            print(f"\n  [{split} row {i}] needs an atom in ASA bin "
                  f"{k+1}, but every signature it contains is forbidden "
                  f"from that bin by empty-labels elsewhere:", flush=True)
            for s in sorted(mol_sigs[mi]):
                if k in forbidders[s]:
                    fs, fi = forbidders[s][k]
                    print(f"    sig {s} forbidden by [{fs} row {fi}]",
                          flush=True)
        return

    # greedy + backtracking assignment (most-constrained molecule first)
    # variables: for each nonempty(i,k) pick a signature to PLACE in k;
    # a signature has exactly ONE bin, so placements must be consistent.
    assign = {}

    def ok(mi):
        sigs = mol_sigs[mi]
        for k in nonempty_all[mi]:
            cands = [s for s in sigs
                     if (assign.get(s, None) == k) or
                        (s not in assign and k in allowed[s])]
            if not cands:
                return False
        for k in empty_all[mi]:
            if any(assign.get(s) == k for s in sigs):
                return False
        return True

    order = sorted(range(len(mols_all)),
                   key=lambda mi: -len(nonempty_all[mi]))

    def solve(pos):
        if pos == len(order):
            return True
        mi = order[pos]
        needs = [k for k in nonempty_all[mi]
                 if not any(assign.get(s) == k for s in mol_sigs[mi])]
        if not needs:
            return solve(pos + 1)
        k = needs[0]
        for s in sorted(mol_sigs[mi]):
            if s in assign or k not in allowed[s]:
                continue
            assign[s] = k
            if all(ok(m2) or True for m2 in [mi]) and ok(mi) and \
                    solve(pos):
                return True
            del assign[s]
        return False

    feasible = solve(0)
    print(f"\nbacktracking search: "
          f"{'FEASIBLE' if feasible else 'INFEASIBLE'}", flush=True)
    if feasible:
        placed = Counter(assign.values())
        print(f"assigned {len(assign)} signatures; per-bin "
              f"{dict(sorted(placed.items()))}", flush=True)


if __name__ == "__main__":
    main()
