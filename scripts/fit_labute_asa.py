"""Calibration of the per-atom Labute ASA contribution model.

RDKit's exact ``getLabuteAtomContribs`` (MolSurf.cpp, behind
``rdMolDescriptors._CalcLabuteASAContribs``) is unavailable offline, and
the Labute-paper spherical-cap formula cannot reproduce the per-
environment VSA-bin memberships the vendored reference outputs pin down
(tests/data/*.npz, 1,020 molecules of CDF-normalized rdkit_2d vectors).

This script re-derives the additive model shipped in
``chem/descriptors/vsa.py`` (``_ASA_BASE`` / ``_ASA_DELTA`` /
``_ASA_DELTA_H``):

    A(atom) = BASE[element]
              - sum over bonds of DELTA[element, nbr_element, bond_class]
              - nH * DELTA_H[element]

The evidence chain (see docs/parity.md "VSA_EState calibration"):

1. descriptastorus CDF normalization is monotone, so an exact raw value
   of 0 maps every molecule onto one shared normalized value.  The
   interior zero-ties of the VSA_EState columns therefore label, per
   molecule, which ASA bins are EMPTY — hard membership constraints.
   (Bottom/top ties are CDF clamps and carry no such information.
   r5 caveat, scripts/vsa_estate_feasibility.py: supervised tie
   calibration shows only bins 2/8/9 yield clamp-unambiguous labels on
   the regression fixtures — for most other columns the raw-0 tie
   coincides with a CDF clamp cluster, which is why the r4 fit's
   reliable gains concentrated in bins 8/9/10 and why the residual
   VSA_EState2/5/7 "deviation" is metric saturation, not model error —
   see tests/test_descriptors.py::TestTieCeilingColumns.)
2. Those labels pin memberships no cap-formula parameterization can
   reach (CH3-C in [6.45,7) but CH3-O/N in [7,11); S/Cl/Br/I >= 11;
   aromatic CH NOT in [6.07,6.45)); hence the additive model.
3. The fit: coordinate descent over BASE/DELTA/DELTA_H maximizing
   Spearman rank agreement of the varying VSA_EState + EState_VSA +
   LabuteASA columns on the regression+classification fixture sets,
   validated on the held-out *_test sets.  A per-signature discrete
   refinement was tried and REJECTED (train up, validation down —
   overfit to unfalsifiable bins).

Usage:
    python scripts/fit_labute_asa.py        # re-run the fit, print the
                                            # fitted tables + scores
"""

import csv
import math
import os
import sys
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from polymer_chemprop_tpu.chem import parse_smiles  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors import RDKIT2D_NAMES  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors.estate import (  # noqa: E402
    estate_indices,
)
from polymer_chemprop_tpu.chem.mol import AROMATIC  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
VSA_BINS = np.array([4.78, 5.0, 5.41, 5.74, 6.0, 6.07, 6.45, 7.0, 11.0])
ESTATE_BINS = np.array([-0.39, 0.29, 0.717, 1.165, 1.54, 1.807, 2.05,
                        4.69, 9.17, 15.0])
RB0 = {1: 0.33, 5: 0.84, 6: 0.77, 7: 0.7, 8: 0.66, 9: 0.611, 14: 1.17,
       15: 1.1, 16: 1.04, 17: 0.997, 35: 1.167, 53: 1.336, 33: 1.21,
       34: 1.17, 50: 1.4, 11: 1.54, 19: 1.96, 3: 1.23, 12: 1.36,
       20: 1.74, 30: 1.25, 26: 1.24, 29: 1.28, 13: 1.25}


def load(split):
    ref = np.load(os.path.join(DATA, f"{split}.npz"))["features"]
    p = (f"{split}_smiles.csv" if split.endswith("_test")
         else f"{split}.csv")
    with open(os.path.join(DATA, p)) as fh:
        smis = [r[0] for r in list(csv.reader(fh))[1:]][:ref.shape[0]]
    return smis, ref


def flatten(smis):
    mol_id, e_a, es_a, nh_a, b_src, b_pair = [], [], [], [], [], []
    for mi, smi in enumerate(smis):
        m = parse_smiles(smi)
        es = estate_indices(m)
        for i, a in enumerate(m.atoms):
            mol_id.append(mi)
            e_a.append(a.atomic_num)
            es_a.append(es[i])
            nh_a.append(a.num_hs)
            for b in m.atom_bonds(i):
                if b.is_aromatic or b.order == AROMATIC:
                    bc = 3
                elif b.order == 2:
                    bc = 1
                elif b.order == 3:
                    bc = 2
                else:
                    bc = 0
                b_src.append(len(e_a) - 1)
                b_pair.append((a.atomic_num,
                               m.atoms[b.other(i)].atomic_num, bc))
    return dict(mol_id=np.array(mol_id), e=e_a, es=np.array(es_a),
                nh=np.array(nh_a, float), b_src=np.array(b_src),
                b_pair=b_pair, nmol=len(smis))


def init_delta(p, params=None):
    e, ej, bc = p
    if params is not None and ("d", (e, 6, bc)) in params:
        return params[("d", (e, 6, bc))]
    c = {0: 0.22, 1: 0.30, 2: 0.45, 3: 0.27}[bc]
    ri, rj = RB0.get(e, 1.1), RB0.get(ej, 1.1)
    d = max(abs(ri - rj), ri + rj - c)
    return math.pi * ri * max(0.0, (rj * rj - (ri - d) ** 2) / d)


def main():
    from scipy.stats import rankdata
    warnings.filterwarnings("ignore")
    name2k = {n: i for i, n in enumerate(RDKIT2D_NAMES)}

    def lexperm(n):
        return [int(x) - 1 for x in sorted(str(k) for k in range(1, n + 1))]
    P10, P11 = lexperm(10), lexperm(11)

    flat = {}
    for s in ("regression", "regression_test", "classification",
              "classification_test"):
        print(f"featurizing {s}...", flush=True)
        smis, ref = load(s)
        flat[s] = flatten(smis)
        flat[s]["ref"] = ref

    from collections import Counter
    pairs = Counter()
    for s in flat:
        pairs.update(flat[s]["b_pair"])
    COMMON = [p for p, c in pairs.items() if c >= 8]
    ELEMS = sorted({int(e) for s in flat for e in flat[s]["e"]} | {1})
    params = {}
    for e in ELEMS:
        params[("base", e)] = 4 * math.pi * RB0.get(e, 1.1) ** 2
    for p in COMMON:
        params[("d", p)] = init_delta(p)
    for e in (6, 7, 8, 16):
        params[("h", e)] = 0.10
    params[("hbase",)] = 1.368

    pre = {}
    for s, d in flat.items():
        pre[s] = dict(d)
        pre[s]["b_keys"] = [("d", p) if ("d", p) in params else None
                            for p in d["b_pair"]]
        rc = {}
        for fam, perm, base in (("VSA_EState", P10, 10),
                                ("EState_VSA", P11, 11)):
            names = sorted(f"{fam}{k}" for k in range(1, base + 1))
            for ci, nm in enumerate(names):
                r = d["ref"][:, name2k[nm]]
                f = np.isfinite(r)
                if np.all(r[f] == r[f][0]):
                    continue
                rc[(fam, perm[ci], nm)] = (f, rankdata(r[f]))
        rl = d["ref"][:, name2k["LabuteASA"]]
        fl = np.isfinite(rl)
        pre[s]["rc"] = rc
        pre[s]["labr"] = (fl, rankdata(rl[fl]))

    def spear(a, b):
        c = np.corrcoef(a, b)[0, 1]
        return c if np.isfinite(c) else 0.0

    def score_set(s, w_vsa=2.0):
        d = pre[s]
        nmol = d["nmol"]
        asa = np.array([params[("base", e)] for e in d["e"]])
        dl = np.array([params[k] if k else init_delta(p, params)
                       for k, p in zip(d["b_keys"], d["b_pair"])])
        np.add.at(asa, d["b_src"], -dl)
        hd = np.array([params.get(("h", e), 0.08) for e in d["e"]])
        asa -= d["nh"] * hd
        abin = np.searchsorted(VSA_BINS, asa, side="right")
        ebin = np.searchsorted(ESTATE_BINS, d["es"], side="right")
        v1 = np.zeros((nmol, 10))
        np.add.at(v1, (d["mol_id"], abin), d["es"])
        v2 = np.zeros((nmol, 11))
        np.add.at(v2, (d["mol_id"], ebin), asa)
        sc = 0.0
        for (fam, b, nm), (f, rr) in d["rc"].items():
            col = v1[:, b] if fam == "VSA_EState" else v2[:, b]
            sc += (w_vsa if fam == "VSA_EState" else 1.0) * \
                spear(rankdata(col[f]), rr)
        lab = np.zeros(nmol)
        np.add.at(lab, d["mol_id"], asa)
        hs = np.zeros(nmol)
        np.add.at(hs, d["mol_id"], d["nh"])
        lab += hs * params[("hbase",)]
        f, rr = d["labr"]
        sc += spear(rankdata(lab[f]), rr)
        sc -= 0.002 * (np.abs(v1[:, [0, 2, 3, 5]]) > 8.0).sum()
        return sc

    TRAIN = ["regression", "classification"]
    VAL = ["regression_test", "classification_test"]

    def total(sets):
        return sum(score_set(s) for s in sets)

    cur = total(TRAIN)
    print(f"start train {cur:.4f} val {total(VAL):.4f}", flush=True)
    for sweep in range(8):
        changed = 0
        for k in list(params):
            v0 = params[k]
            if k[0] == "base":
                grid = np.arange(v0 - 0.8, v0 + 0.8001, 0.05)
            elif k[0] == "d":
                grid = np.arange(max(0, v0 - 0.6), v0 + 0.6001, 0.04)
            elif k[0] == "h":
                grid = np.arange(0.0, 0.425, 0.025)
            else:
                grid = np.arange(0.8, 2.01, 0.1)
            best = (cur, v0)
            for g in grid:
                params[k] = float(g)
                sc = total(TRAIN)
                if sc > best[0]:
                    best = (sc, float(g))
            if best[1] != v0:
                changed += 1
            params[k] = best[1]
            cur = best[0]
        print(f"sweep {sweep}: train {cur:.4f} val {total(VAL):.4f} "
              f"changed {changed}", flush=True)
        if not changed:
            break

    print("\n_ASA_BASE =", {k[1]: round(v, 4) for k, v in params.items()
                            if k[0] == "base"})
    print("_ASA_DELTA =", {k[1]: round(v, 4) for k, v in params.items()
                           if k[0] == "d"})
    print("_ASA_DELTA_H =", {k[1]: round(v, 4) for k, v in params.items()
                             if k[0] == "h"})
    print("_ASA_H_SPHERE =", round(params[("hbase",)], 4))


if __name__ == "__main__":
    main()
