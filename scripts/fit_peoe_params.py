#!/usr/bin/env python
"""Calibrate the Gasteiger (PEOE) parameter tail against the vendored
reference outputs (VERDICT r4 item 3 — the ASA playbook applied to the
charge model).

The 1980 Gasteiger-Marsili paper parameterizes H/C/N/O/F/Cl/Br/I/S;
RDKit's shipped table additionally covers P and decides hybridization
fallbacks we cannot read offline. The four partial-charge descriptor
columns (Max/Min(Abs)PartialCharge) are pure functions of the charge
vector — no ASA involvement — so their cross-molecule RANKS in the
vendored CDF-normalized outputs (tests/data/*.npz; the CDF transform is
monotone) are direct evidence about the true parameters. The PEOE_VSA
bins add per-molecule EMPTY-BIN constraints via interior zero-ties
(an exact raw 0 maps every molecule to one shared normalized value —
same evidence chain as scripts/fit_labute_asa.py).

Usage:
    python scripts/fit_peoe_params.py diagnose   # per-subset ranks
    python scripts/fit_peoe_params.py candidates # score hypotheses
    python scripts/fit_peoe_params.py fit        # coordinate descent
"""

import csv
import os
import sys

import numpy as np
from scipy.stats import spearmanr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from polymer_chemprop_tpu.chem import parse_smiles  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors import RDKIT2D_NAMES  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors import gasteiger as GG  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors.vsa import (  # noqa: E402
    _PEOE_BINS,
    labute_asa_contribs,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")

CHARGE_COLS = ["MaxAbsPartialCharge", "MaxPartialCharge",
               "MinAbsPartialCharge", "MinPartialCharge"]
PEOE_COLS = [f"PEOE_VSA{k}" for k in range(1, 15)]


def load(split):
    ref = np.load(os.path.join(DATA, f"{split}.npz"))["features"]
    p = (f"{split}_smiles.csv" if split.endswith("_test")
         else f"{split}.csv")
    with open(os.path.join(DATA, p)) as fh:
        smis = [r[0] for r in list(csv.reader(fh))[1:]][:ref.shape[0]]
    return smis, ref


def charge_vec(mol):
    q, _ = GG.gasteiger_charges(mol)
    return q


def charge_cols(mol):
    q = charge_vec(mol)
    if not q:
        return [0.0, 0.0, 0.0, 0.0]
    mx, mn = max(q), min(q)
    return [max(abs(mx), abs(mn)), mx, min(abs(mx), abs(mn)), mn]


def peoe_cols(mol):
    q = charge_vec(mol)
    asa, _h = labute_asa_contribs(mol)
    out = [0.0] * (len(_PEOE_BINS) + 1)
    for qi, ai in zip(q, asa):
        k = 0
        while k < len(_PEOE_BINS) and qi >= _PEOE_BINS[k]:
            k += 1
        out[k] += ai
    return out


def mol_subsets(mols):
    sub = {"P": [], "S": [], "N+": [], "clean": [], "all": []}
    for i, m in enumerate(mols):
        zs = {a.atomic_num for a in m.atoms}
        charged = any(a.formal_charge for a in m.atoms)
        sub["all"].append(i)
        if 15 in zs:
            sub["P"].append(i)
        if 16 in zs:
            sub["S"].append(i)
        if charged:
            sub["N+"].append(i)
        if 15 not in zs and 16 not in zs and not charged:
            sub["clean"].append(i)
    return sub


def col_idx(name):
    return RDKIT2D_NAMES.index(name)


def rank_table(mols, ref, cols, subsets):
    ours = np.array([charge_cols(m) for m in mols])
    print(f"{'column':22s} " + " ".join(f"{k:>7s}" for k in subsets))
    for ci, name in enumerate(cols):
        refs = ref[:, col_idx(name)]
        row = []
        for k, idx in subsets.items():
            if len(idx) < 3:
                row.append(float("nan"))
                continue
            rho = spearmanr(ours[idx, ci], refs[idx]).statistic
            row.append(rho)
        print(f"{name:22s} " + " ".join(f"{r:7.3f}" for r in row),
              flush=True)


def diagnose():
    for split in ("regression", "classification"):
        smis, ref = load(split)
        mols = [parse_smiles(s) for s in smis]
        subs = mol_subsets(mols)
        print(f"\n== {split} (n per subset: "
              + ", ".join(f"{k}={len(v)}" for k, v in subs.items()) + ")")
        rank_table(mols, ref, CHARGE_COLS, subs)
        # PEOE_VSA summary: mean rho over the 14 bins, all-mol
        ours = np.array([peoe_cols(m) for m in mols])
        rhos = []
        for k in range(14):
            refs = ref[:, col_idx(PEOE_COLS[k])]
            if np.std(refs) == 0 or np.std(ours[:, k]) == 0:
                continue
            rhos.append(spearmanr(ours[:, k], refs).statistic)
        print(f"PEOE_VSA mean rho (varying bins): {np.mean(rhos):.4f} "
              f"min {np.min(rhos):.4f}", flush=True)
        # charge-only bin-membership violations + element attribution
        empty = empty_bin_matrix(ref)
        p, miss, detail = membership_violations(mols, empty)
        print(f"membership violations: phantom={p} missing={miss} "
              f"(columns with constraints: "
              f"{[k+1 for k in range(14) if empty[:, k].any()]})",
              flush=True)
        from collections import Counter
        attr = Counter()
        for i, k, kind in detail:
            zs = {a.atomic_num for a in mols[i].atoms}
            key = ("P" if 15 in zs else
                   "S" if 16 in zs else
                   "chg" if any(a.formal_charge for a in mols[i].atoms)
                   else "clean")
            attr[key, kind] += 1
        print(f"violation attribution: {dict(attr)}", flush=True)


def score(mols_by_split, refs_by_split):
    """Mean Spearman of the 4 charge columns over all molecules of both
    train splits (the fitting objective)."""
    tot = []
    for split, mols in mols_by_split.items():
        ref = refs_by_split[split]
        ours = np.array([charge_cols(m) for m in mols])
        for ci, name in enumerate(CHARGE_COLS):
            tot.append(spearmanr(ours[:, ci],
                                 ref[:, col_idx(name)]).statistic)
    return float(np.mean(tot))


def with_params(overrides):
    """Context: temporarily override GG._PARAMS entries."""
    class _Ctx:
        def __enter__(self):
            self.saved = dict(GG._PARAMS)
            GG._PARAMS.update(overrides)

        def __exit__(self, *a):
            GG._PARAMS.clear()
            GG._PARAMS.update(self.saved)
    return _Ctx()


def empty_bin_matrix(ref):
    """(n_mols, 14) bool: True where the vendored normalized PEOE_VSA
    value equals the column's shared raw-0 tie (descriptastorus's CDF is
    monotone, so every molecule with an exactly-empty bin lands on ONE
    normalized value — the column minimum, since the bin sums are
    non-negative). Columns whose minimum is not a tie (fewer than 5
    molecules share it) yield no constraints."""
    out = np.zeros((ref.shape[0], 14), dtype=bool)
    for k in range(14):
        col = ref[:, col_idx(PEOE_COLS[k])]
        lo = col.min()
        tie = np.isclose(col, lo, rtol=0, atol=1e-12)
        if tie.sum() >= 5:
            out[:, k] = tie
    return out


def bin_of(q):
    k = 0
    while k < len(_PEOE_BINS) and q >= _PEOE_BINS[k]:
        k += 1
    return k


def membership_violations(mols, empty):
    """Charge-only bin-membership violations vs the reference labels —
    ASA plays no role (a bin is nonempty iff >=1 atom's charge falls in
    it; per-atom ASA is strictly positive):
      phantom: one of our atoms sits in a reference-EMPTY bin
      missing: a reference-NONEMPTY bin (in a constraint-bearing
               column) that none of our atoms occupies
    Returns (phantom, missing, per-molecule detail list)."""
    has_constraints = empty.any(axis=0)
    phantom = missing = 0
    detail = []
    for i, m in enumerate(mols):
        q = charge_vec(m)
        occupied = {bin_of(qi) for qi in q}
        for k in range(14):
            if not has_constraints[k]:
                continue
            if empty[i, k] and k in occupied:
                phantom += 1
                detail.append((i, k, "phantom"))
            elif not empty[i, k] and k not in occupied:
                missing += 1
                detail.append((i, k, "missing"))
    return phantom, missing, detail


def constraint_score(mols_by, empty_by):
    tot = 0
    for split, mols in mols_by.items():
        p, m, _ = membership_violations(mols, empty_by[split])
        tot += p + m
    return tot


def calibrated_empty(mols_by, refs_by):
    """Per-column raw-0 normalized tie value v0, calibrated from CLEAN
    molecules (whose charges the exact 1980 parameters pin — regression
    clean subset: rho 1.000, zero violations): v0[k] = the ref value
    shared by clean molecules whose bin k is empty per OUR computation.
    This sidesteps the min-tie ambiguity (a bin holding one identical
    single-atom contribution in many molecules also ties without being
    empty)."""
    from collections import Counter
    v0 = [None] * 14
    for split, mols in mols_by.items():
        ref = refs_by[split]
        for i, m in enumerate(mols):
            zs = {a.atomic_num for a in m.atoms}
            if 15 in zs or 16 in zs or any(a.formal_charge
                                           for a in m.atoms):
                continue
            occupied = {bin_of(qi) for qi in charge_vec(m)}
            for k in range(14):
                if k not in occupied:
                    v = ref[i, col_idx(PEOE_COLS[k])]
                    if v0[k] is None:
                        v0[k] = Counter()
                    v0[k][round(float(v), 12)] += 1
    out = []
    for k in range(14):
        if v0[k] is None:
            out.append(None)
            continue
        (val, cnt), = v0[k].most_common(1)
        total = sum(v0[k].values())
        # consistency: the clean-empty value must be (nearly) unanimous
        out.append(val if cnt / total > 0.98 else None)
        if cnt / total <= 0.98:
            print(f"  [warn] bin {k+1}: clean-empty tie not unanimous "
                  f"({cnt}/{total}) {v0[k].most_common(3)}", flush=True)
    return out


def empty_from_v0(ref, v0):
    out = np.zeros((ref.shape[0], 14), dtype=bool)
    for k in range(14):
        if v0[k] is None:
            continue
        out[:, k] = np.isclose(ref[:, col_idx(PEOE_COLS[k])], v0[k],
                               rtol=0, atol=1e-12)
    return out


def sp_idx(mols):
    return [i for i, m in enumerate(mols)
            if {15, 16} & {a.atomic_num for a in m.atoms}]


def sp_objective(mols_by, refs_by, empty_by):
    """(violations on S/P molecules, -mean rho of the 4 charge columns
    on the S/P subset) — the fitting objective."""
    viol = 0
    rhos = []
    for split, mols in mols_by.items():
        ref = refs_by[split]
        idx = sp_idx(mols)
        sub = [mols[i] for i in idx]
        p, m, _ = membership_violations(sub, empty_by[split][idx])
        viol += p + m
        ours = np.array([charge_cols(mo) for mo in sub])
        for ci, name in enumerate(CHARGE_COLS):
            r = spearmanr(ours[:, ci], ref[idx, col_idx(name)]).statistic
            if np.isfinite(r):
                rhos.append(r)
    return viol, float(np.mean(rhos))


def load_all():
    mols_by, refs_by = {}, {}
    for split in ("regression", "classification"):
        smis, ref = load(split)
        mols_by[split] = [parse_smiles(s) for s in smis]
        refs_by[split] = ref
    return mols_by, refs_by


def candidates():
    mols_by, refs_by = load_all()
    v0 = calibrated_empty(mols_by, refs_by)
    print("calibrated v0:", ["-" if v is None else "ok" for v in v0],
          flush=True)
    empty_by = {s: empty_from_v0(refs_by[s], v0) for s in refs_by}
    cands = {
        "current": {},
        "P=(8.90,8.24,0.96)": {("P", "sp3"): (8.90, 8.24, 0.96)},
        "S sp3=(10.14,9.13,1.38) [paper] both": {},
    }
    for name, ov in cands.items():
        with with_params(ov):
            viol, rho = sp_objective(mols_by, refs_by, empty_by)
        print(f"{name:40s} viol={viol:4d} rho_SP={rho:.4f}", flush=True)


def s_class(mol, idx):
    """Environment class for a sulfur atom (atom-level inspection of
    the reference bin memberships shows these behave differently):
      SO2 — sulfone/sulfonamide (two =O)
      SO  — sulfoxide (one =O)
      S2  — double-bonded terminal/thiocarbonyl S (C=S, P=S)
      Sar — aromatic (thiophene/thiazole)
      S   — divalent single-bonded (1980-paper parameters fit these)"""
    a = mol.atoms[idx]
    ndbo = ndb = 0
    for b in mol.atom_bonds(idx):
        if b.order == 2:
            ndb += 1
            if mol.atoms[b.other(idx)].atomic_num == 8:
                ndbo += 1
    if ndbo >= 2:
        return "SO2"
    if ndbo == 1:
        return "SO"
    if ndb:
        return "S2"
    if a.is_aromatic:
        return "Sar"
    return "S"


def p_class(mol, idx):
    """P with a double-bonded S (thiophosphate) vs the rest."""
    for b in mol.atom_bonds(idx):
        if b.order == 2 and mol.atoms[b.other(idx)].atomic_num == 16:
            return "PS"
    return "P"


def make_classifier(table):
    """A drop-in _atom_params consulting an extended class table:
    keys 'P', 'PS', 'S', 'S2', 'Sar', 'SO', 'SO2' override stock."""
    orig = GG._atom_params.__wrapped__ if hasattr(GG._atom_params,
                                                  "__wrapped__") \
        else _ORIG_ATOM_PARAMS

    def fn(mol, idx):
        z = mol.atoms[idx].atomic_num
        if z == 15:
            k = p_class(mol, idx)
            if k in table:
                return table[k]
            if "P" in table:
                return table["P"]
        if z == 16:
            k = s_class(mol, idx)
            if k in table:
                return table[k]
        return orig(mol, idx)
    return fn


_ORIG_ATOM_PARAMS = GG._atom_params


def fit():
    mols_by, refs_by = load_all()
    v0 = calibrated_empty(mols_by, refs_by)
    empty_by = {s: empty_from_v0(refs_by[s], v0) for s in refs_by}

    import json
    table = {
        "P": list(GG._PARAMS[("P", "sp3")]),
        "S2": [12.0, 10.8, 1.2],   # init: between S sp3 and O sp2
        "Sar": [11.0, 9.5, 1.4],
        "SO": list(GG._PARAMS[("S", "sp3")]),
        "SO2": list(GG._PARAMS[("S", "sp3")]),
    }
    if len(sys.argv) > 2:  # warm start from a JSON table
        table = {k: list(v) for k, v in
                 json.load(open(sys.argv[2])).items()}
    if "PS" not in table:
        table["PS"] = list(table["P"])

    def evaluate():
        GG._atom_params = make_classifier(
            {k: tuple(v) for k, v in table.items()})
        try:
            return sp_objective(mols_by, refs_by, empty_by)
        finally:
            GG._atom_params = _ORIG_ATOM_PARAMS

    def scalar(v):
        # balanced: 1 membership violation == 0.0025 rank points
        return v[0] + 400.0 * (1.0 - v[1])

    best = evaluate()
    print(f"start: viol={best[0]} rho={best[1]:.4f} "
          f"scalar={scalar(best):.1f}", flush=True)

    steps = [4.0, 2.0, 1.0, 0.5, 0.25, 0.1, 0.05, 0.02]
    improved = True
    sweep = 0
    while improved and sweep < 60:
        improved = False
        sweep += 1
        for key in table:
            for pi in range(3):
                for st in steps:
                    for sign in (1, -1):
                        old = table[key][pi]
                        table[key][pi] = old + sign * st
                        cur = evaluate()
                        if scalar(cur) < scalar(best) - 1e-9:
                            best = cur
                            improved = True
                            print(f"  sweep {sweep}: {key}[{pi}] -> "
                                  f"{table[key][pi]:+.2f} viol={cur[0]} "
                                  f"rho={cur[1]:.4f}", flush=True)
                        else:
                            table[key][pi] = old
    print(f"\nlocal fit: viol={best[0]} rho={best[1]:.4f}", flush=True)

    # basin hopping: perturb + short descent, keep the best basin
    rng = np.random.default_rng(0)
    best_table = {k: list(v) for k, v in table.items()}
    for hop in range(int(os.environ.get("PEOE_HOPS", "8"))):
        table = {k: [x + rng.normal(0, 0.4) for x in v]
                 for k, v in best_table.items()}
        cur = evaluate()
        improved2 = True
        sw = 0
        while improved2 and sw < 6:
            improved2 = False
            sw += 1
            for key in table:
                for pi in range(3):
                    for st in (1.0, 0.5, 0.25, 0.1, 0.05):
                        for sign in (1, -1):
                            old = table[key][pi]
                            table[key][pi] = old + sign * st
                            c2 = evaluate()
                            if scalar(c2) < scalar(cur) - 1e-9:
                                cur = c2
                                improved2 = True
                            else:
                                table[key][pi] = old
        mark = ""
        if scalar(cur) < scalar(best) - 1e-9:
            best = cur
            best_table = {k: list(v) for k, v in table.items()}
            mark = "  <-- new best"
        print(f"hop {hop}: viol={cur[0]} rho={cur[1]:.4f}{mark}",
              flush=True)
    table = best_table
    print(f"\nfitted: viol={best[0]} rho={best[1]:.4f}", flush=True)
    for k, v in table.items():
        print(f"  {k}: ({v[0]:.2f}, {v[1]:.2f}, {v[2]:.2f})", flush=True)
    json.dump({k: list(v) for k, v in table.items()},
              open("/tmp/peoe_table.json", "w"))
    return table


def inspect(limit=40):
    """Atom-level view of the S/P membership violations: which of our
    atoms sits in a reference-empty bin (phantom) and which
    reference-nonempty bins we fail to occupy (missing), with the S/P
    environment of the molecule — looking for systematic class errors
    (P=S thiophosphate, terminal =S, thiophene, sulfone...)."""
    mols_by, refs_by = load_all()
    v0 = calibrated_empty(mols_by, refs_by)
    shown = 0
    for split, mols in mols_by.items():
        smis, _ = load(split)
        empty = empty_from_v0(refs_by[split], v0)
        for i, m in enumerate(mols):
            zs = {a.atomic_num for a in m.atoms}
            if not ({15, 16} & zs) or shown >= limit:
                continue
            q = charge_vec(m)
            occupied = {}
            for ai, qi in enumerate(q):
                occupied.setdefault(bin_of(qi), []).append(ai)
            over, under = [], []
            for k in range(14):
                if empty[i, k] and k in occupied:
                    over.append(k)
                elif not empty[i, k] and k not in occupied:
                    under.append(k)
            if not over and not under:
                continue
            shown += 1
            env = []
            for ai, a in enumerate(m.atoms):
                if a.atomic_num == 16:
                    dbl = [m.atoms[b.other(ai)].atomic_num
                           for b in m.atom_bonds(ai) if b.order == 2]
                    env.append(f"S{ai}(deg{m.degree(ai)}"
                               f"{'=' + str(dbl) if dbl else ''}"
                               f"{'ar' if a.is_aromatic else ''}"
                               f" q={q[ai]:+.3f})")
                elif a.atomic_num == 15:
                    dbl = [m.atoms[b.other(ai)].atomic_num
                           for b in m.atom_bonds(ai) if b.order == 2]
                    env.append(f"P{ai}(deg{m.degree(ai)}"
                               f"{'=' + str(dbl) if dbl else ''}"
                               f" q={q[ai]:+.3f})")
            print(f"[{split} {i}] {smis[i][:60]}", flush=True)
            print(f"   {' '.join(env)}", flush=True)
            for k in over:
                ats = occupied[k]
                desc = ",".join(
                    f"{m.atoms[a].atomic_num}@{a}(q={q[a]:+.3f})"
                    for a in ats[:4])
                print(f"   phantom bin{k+1}: ours {desc}", flush=True)
            if under:
                print(f"   missing bins: {[k+1 for k in under]}",
                      flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "diagnose"
    if cmd == "diagnose":
        diagnose()
    elif cmd == "candidates":
        candidates()
    elif cmd == "fit":
        fit()
    elif cmd == "inspect":
        inspect(int(sys.argv[2]) if len(sys.argv) > 2 else 40)
