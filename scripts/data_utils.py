"""Data-hygiene utilities: avg_dups, overlap, sanitize, class_balance,
split_data, examine_split_balance (reference scripts/ of the same names,
merged into one multi-command tool).

Usage:
    python scripts/data_utils.py avg_dups --data_path in.csv --save_path out.csv
    python scripts/data_utils.py overlap --data_path_1 a.csv --data_path_2 b.csv
    python scripts/data_utils.py sanitize --data_path in.csv --save_path out.csv
    python scripts/data_utils.py class_balance --data_path in.csv
    python scripts/data_utils.py split_data --data_path in.csv --save_dir out/ \
        --split_type scaffold_balanced --split_sizes 0.8 0.1 0.1
    python scripts/data_utils.py examine_split_balance --data_path in.csv
"""

import argparse
import csv
import os
import pickle
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polymer_chemprop_tpu.chem import parse_smiles  # noqa: E402
from polymer_chemprop_tpu.data import get_data, split_data as split_fn  # noqa: E402


def read_rows(path):
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [r for r in reader if r]
    return header, rows


def cmd_avg_dups(args):
    header, rows = read_rows(args.data_path)
    by_smiles = defaultdict(list)
    for r in rows:
        by_smiles[r[0]].append(r[1:])
    with open(args.save_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        n_dups = 0
        for smi, targets in by_smiles.items():
            if len(targets) > 1:
                n_dups += 1
            arr = np.array([[np.nan if v in ("", "nan") else float(v)
                             for v in t] for t in targets])
            avg = np.nanmean(arr, axis=0)
            w.writerow([smi] + ["" if np.isnan(v) else v for v in avg])
    print(f"{len(by_smiles)} unique molecules, {n_dups} had duplicates")


def cmd_overlap(args):
    _, rows1 = read_rows(args.data_path_1)
    _, rows2 = read_rows(args.data_path_2)
    s1 = {r[0] for r in rows1}
    s2 = {r[0] for r in rows2}
    inter = s1 & s2
    print(f"set 1: {len(s1)} | set 2: {len(s2)} | overlap: {len(inter)} "
          f"({100 * len(inter) / max(len(s1), 1):.1f}% of set 1)")
    if args.save_intersection_path:
        with open(args.save_intersection_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["smiles"])
            for s in sorted(inter):
                w.writerow([s])


def cmd_sanitize(args):
    header, rows = read_rows(args.data_path)
    kept = [r for r in rows if parse_smiles(r[0], strict=False) is not None]
    with open(args.save_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(kept)
    print(f"kept {len(kept)}/{len(rows)} rows "
          f"({len(rows) - len(kept)} invalid SMILES removed)")


def cmd_class_balance(args):
    header, rows = read_rows(args.data_path)
    for t, name in enumerate(header[1:]):
        vals = [r[t + 1] for r in rows if r[t + 1] not in ("", "nan")]
        ones = sum(1 for v in vals if float(v) == 1)
        print(f"{name}: {len(vals)} labelled, "
              f"{100 * ones / max(len(vals), 1):.1f}% positive")


def cmd_split_data(args):
    data = get_data(args.data_path)
    train, val, test = split_fn(data, args.split_type,
                                tuple(args.split_sizes), args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    header, _ = read_rows(args.data_path)
    for name, ds in [("train", train), ("val", val), ("test", test)]:
        with open(os.path.join(args.save_dir, f"{name}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            for d in ds:
                w.writerow(list(d.smiles) +
                           ["" if t is None else t for t in (d.targets or [])])
    print(f"train {len(train)} | val {len(val)} | test {len(test)} "
          f"-> {args.save_dir}")


def cmd_create_crossval_splits(args):
    """Create k-fold index files for --split_type index_predetermined /
    predetermined (reference scripts/create_crossval_splits.py +
    create_crossval_index_files.py)."""
    import pickle
    from random import Random

    from polymer_chemprop_tpu.data import scaffold_to_indices

    _, rows = read_rows(args.data_path)
    n = len(rows)
    os.makedirs(args.save_dir, exist_ok=True)
    k = args.num_folds
    if args.split_type == "random":
        idx = list(range(n))
        Random(args.seed).shuffle(idx)
        folds = [sorted(idx[i::k]) for i in range(k)]
    elif args.split_type == "scaffold":
        sti = scaffold_to_indices([r[0] for r in rows])
        sets = sorted(sti.values(), key=len, reverse=True)
        folds = [[] for _ in range(k)]
        for s in sets:  # greedy bin packing to the smallest fold
            folds.sort(key=len)
            folds[0].extend(s)
        folds = [sorted(f) for f in folds]
    elif args.split_type == "time":
        # time-window splits: contiguous chunks in file order
        per = -(-n // k)
        folds = [list(range(i * per, min((i + 1) * per, n)))
                 for i in range(k)]
    else:
        raise ValueError(f"unknown split_type {args.split_type}")

    # folds file for --split_type predetermined
    with open(os.path.join(args.save_dir, "folds.pckl"), "wb") as f:
        pickle.dump(folds, f)
    # per-seed (train, val, test) index sets for index_predetermined
    index_sets = []
    for s in range(k):
        test = folds[s]
        val = folds[(s + 1) % k]
        train = [i for j, fold in enumerate(folds)
                 if j not in (s, (s + 1) % k) for i in fold]
        index_sets.append([train, val, test])
    with open(os.path.join(args.save_dir, "index_sets.pckl"), "wb") as f:
        pickle.dump(index_sets, f)
    print(f"wrote {k} folds ({[len(f) for f in folds]}) to {args.save_dir}")


def cmd_create_crossval_index_files(args):
    """Meta index files naming which folds act as train/val/test per trial
    (reference scripts/create_crossval_index_files.py:16-45): for each chosen
    test fold i, dump a list of [train_folds, val_fold, test_fold] index-set
    triples to {i}_opt.pkl (val==test, for hyperopt) and {i}_test.pkl."""
    import random as _random
    _random.seed(0)
    n = args.num_folds
    test_k = args.test_folds_to_test or n
    val_k = args.val_folds_per_test or n - 1
    folds = list(range(n))
    _random.shuffle(folds)
    os.makedirs(args.save_dir, exist_ok=True)
    for i in folds[:test_k]:
        rest = [f for f in folds if f != i]
        _random.shuffle(rest)
        opt_sets, test_sets = [], []
        for val in rest[:val_k]:
            train = [f for f in rest if f != val]
            opt_sets.append([train, [val], [val]])
            test_sets.append([train, [val], [i]])
        with open(os.path.join(args.save_dir, f"{i}_opt.pkl"), "wb") as f:
            pickle.dump(opt_sets, f)
        with open(os.path.join(args.save_dir, f"{i}_test.pkl"), "wb") as f:
            pickle.dump(test_sets, f)
        print(f"fold {i}: {len(opt_sets)} trials")


def cmd_lsc_to_our_format(args):
    """Convert LSC-benchmark HDF5 fold dumps into this package's fold layout
    (reference scripts/lsc_to_our_format.py). Requires h5py, which is an
    optional dependency — the command degrades with a clear error."""
    try:
        import h5py  # noqa: F401
    except ImportError:
        sys.exit("lsc_to_our_format requires h5py (not installed in this "
                 "environment); install h5py to use this converter")
    import shutil
    os.makedirs(args.save_dir, exist_ok=True)
    for name in os.listdir(args.lsc_dir):
        src = os.path.join(args.lsc_dir, name)
        if not name.endswith(".h5"):
            continue
        with h5py.File(src, "r") as h5:
            folds = [np.asarray(h5[k]) for k in sorted(h5.keys())]
        out = os.path.join(args.save_dir, name.replace(".h5", ".pckl"))
        with open(out, "wb") as f:
            pickle.dump([fold.tolist() for fold in folds], f)
        print(f"{name} -> {out}")
    if args.ckpt_dir:
        for name in os.listdir(args.ckpt_dir):
            if name.endswith(".csv"):
                shutil.copy(os.path.join(args.ckpt_dir, name), args.save_dir)


def cmd_examine_split_balance(args):
    data = get_data(args.data_path)
    for split_type in ("random", "scaffold_balanced"):
        train, val, test = split_fn(data, split_type, (0.8, 0.1, 0.1),
                                    args.seed)
        stats = []
        for ds in (train, val, test):
            t = np.array([[np.nan if x is None else x for x in d.targets]
                          for d in ds], dtype=float)
            stats.append(np.nanmean(t))
        print(f"{split_type}: target means train/val/test = "
              f"{stats[0]:.3f}/{stats[1]:.3f}/{stats[2]:.3f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("avg_dups")
    s.add_argument("--data_path", required=True)
    s.add_argument("--save_path", required=True)
    s = sub.add_parser("overlap")
    s.add_argument("--data_path_1", required=True)
    s.add_argument("--data_path_2", required=True)
    s.add_argument("--save_intersection_path")
    s = sub.add_parser("sanitize")
    s.add_argument("--data_path", required=True)
    s.add_argument("--save_path", required=True)
    s = sub.add_parser("class_balance")
    s.add_argument("--data_path", required=True)
    s = sub.add_parser("split_data")
    s.add_argument("--data_path", required=True)
    s.add_argument("--save_dir", required=True)
    s.add_argument("--split_type", default="random")
    s.add_argument("--split_sizes", nargs=3, type=float,
                   default=[0.8, 0.1, 0.1])
    s.add_argument("--seed", type=int, default=0)
    s = sub.add_parser("create_crossval_splits")
    s.add_argument("--data_path", required=True)
    s.add_argument("--save_dir", required=True)
    s.add_argument("--split_type", default="random",
                   choices=["random", "scaffold", "time"])
    s.add_argument("--num_folds", type=int, default=10)
    s.add_argument("--seed", type=int, default=0)
    s = sub.add_parser("create_crossval_index_files")
    s.add_argument("--save_dir", required=True)
    s.add_argument("--num_folds", type=int, default=10)
    s.add_argument("--test_folds_to_test", type=int)
    s.add_argument("--val_folds_per_test", type=int)
    s = sub.add_parser("lsc_to_our_format")
    s.add_argument("--lsc_dir", required=True)
    s.add_argument("--ckpt_dir")
    s.add_argument("--save_dir", required=True)
    s = sub.add_parser("examine_split_balance")
    s.add_argument("--data_path", required=True)
    s.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    globals()[f"cmd_{args.cmd}"](args)
