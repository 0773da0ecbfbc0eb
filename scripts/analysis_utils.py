"""Analysis utilities: similarity, find_similar_mols, tsne, significance
tests, results aggregation, hyperopt inspection (reference scripts/
similarity.py, find_similar_mols.py, tsne.py, wilcoxon_significance.py,
welchs.py, aggregate_results*.py, check_hyperopt.py — merged into one
multi-command tool).

Usage:
    python scripts/analysis_utils.py similarity --data_path_1 a.csv --data_path_2 b.csv
    python scripts/analysis_utils.py find_similar_mols --test_path t.csv --train_path tr.csv
    python scripts/analysis_utils.py tsne --data_paths a.csv b.csv --save_path out.csv
    python scripts/analysis_utils.py wilcoxon --results_a dirA --results_b dirB
    python scripts/analysis_utils.py welchs --results_a dirA --results_b dirB
    python scripts/analysis_utils.py aggregate --results_dirs d1 d2 d3
    python scripts/analysis_utils.py check_hyperopt --hyperopt_dir dir
"""

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polymer_chemprop_tpu.features.generators import (  # noqa: E402
    morgan_binary_features_generator,
)


def _fps(path, n=None):
    with open(path) as f:
        reader = csv.reader(f)
        next(reader)
        smiles = [row[0] for row in reader if row]
    if n:
        smiles = smiles[:n]
    return smiles, np.stack([morgan_binary_features_generator(s)
                             for s in smiles])


def _tanimoto(fp1, fp2):
    inter = fp1 @ fp2.T
    n1 = fp1.sum(1, keepdims=True)
    n2 = fp2.sum(1, keepdims=True)
    return inter / np.maximum(n1 + n2.T - inter, 1)


def cmd_similarity(args):
    _, fps1 = _fps(args.data_path_1, args.max_mols)
    _, fps2 = _fps(args.data_path_2, args.max_mols)
    sims = _tanimoto(fps1, fps2)
    print(f"mean nearest-neighbour Tanimoto (1->2): {sims.max(1).mean():.4f}")
    print(f"mean pairwise Tanimoto: {sims.mean():.4f}")


def cmd_find_similar_mols(args):
    test_smiles, test_fps = _fps(args.test_path, args.max_mols)
    train_smiles, train_fps = _fps(args.train_path, args.max_mols)
    sims = _tanimoto(test_fps, train_fps)
    top = np.argsort(-sims, axis=1)[:, :args.num_neighbors]
    out = args.save_path or "/dev/stdout"
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles"] + [f"neighbor_{i}|sim"
                                 for i in range(args.num_neighbors)])
        for i, smi in enumerate(test_smiles):
            row = [smi]
            for j in top[i]:
                row.append(f"{train_smiles[j]}|{sims[i, j]:.3f}")
            w.writerow(row)


def cmd_tsne(args):
    from sklearn.manifold import TSNE
    all_smiles, all_fps, labels = [], [], []
    for path in args.data_paths:
        smiles, fps = _fps(path, args.max_mols)
        all_smiles += smiles
        all_fps.append(fps)
        labels += [os.path.basename(path)] * len(smiles)
    X = np.concatenate(all_fps, 0)
    emb = TSNE(n_components=2, random_state=0,
               init="random", perplexity=min(30, len(X) - 1)).fit_transform(X)
    with open(args.save_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "dataset", "x", "y"])
        for s, l, (x, y) in zip(all_smiles, labels, emb):
            w.writerow([s, l, x, y])
    print(f"saved t-SNE of {len(X)} molecules to {args.save_path}")


def _fold_scores(results_dir):
    path = os.path.join(results_dir, "test_scores.csv")
    scores = []
    with open(path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            folds = [float(v) for k, v in row.items()
                     if k and k.startswith("Fold") and v not in ("", "nan")]
            scores.append(folds)
    return np.array(scores).mean(axis=0)  # mean over tasks, per fold


def cmd_wilcoxon(args):
    from scipy.stats import wilcoxon
    a, b = _fold_scores(args.results_a), _fold_scores(args.results_b)
    stat, p = wilcoxon(a, b)
    print(f"A folds: {a}\nB folds: {b}\nWilcoxon p = {p:.4f}")


def cmd_welchs(args):
    from scipy.stats import ttest_ind
    a, b = _fold_scores(args.results_a), _fold_scores(args.results_b)
    stat, p = ttest_ind(a, b, equal_var=False)
    print(f"A: {a.mean():.4f}±{a.std():.4f}  B: {b.mean():.4f}±{b.std():.4f}"
          f"  Welch's p = {p:.4f}")


def cmd_aggregate(args):
    print(f"{'dir':40s} {'mean':>10s} {'std':>10s}")
    for d in args.results_dirs:
        try:
            folds = _fold_scores(d)
            print(f"{d:40s} {folds.mean():10.4f} {folds.std():10.4f}")
        except (OSError, ValueError) as e:
            print(f"{d:40s} <error: {e}>")


def cmd_depict(args):
    """Render a CSV of SMILES (or polymer ensemble strings) to SVG files."""
    import csv
    import os
    from polymer_chemprop_tpu.chem.depict import depict_smiles_svg
    os.makedirs(args.save_dir, exist_ok=True)
    with open(args.data_path) as fh:
        reader = csv.reader(fh)
        first = next(reader, None)
        if first is None:
            print("empty CSV")
            return
        rows = [r[0] for r in reader if r]
        # keep a headerless file's first molecule (a header cell never
        # parses as SMILES-ish: it has no atoms we recognise)
        from polymer_chemprop_tpu.chem.smiles import parse_smiles
        if first and parse_smiles(first[0].split("|")[0],
                                  strict=False) is not None:
            rows.insert(0, first[0])
    if args.max_mols:
        rows = rows[:args.max_mols]
    n_ok = 0
    for i, smiles in enumerate(rows):
        svg = depict_smiles_svg(smiles, width=args.width, height=args.height)
        if svg is None:
            print(f"  [skip] unparseable: {smiles}")
            continue
        with open(os.path.join(args.save_dir, f"mol_{i}.svg"), "w") as fh:
            fh.write(svg)
        n_ok += 1
    print(f"wrote {n_ok}/{len(rows)} SVGs to {args.save_dir}")


def cmd_check_hyperopt(args):
    from polymer_chemprop_tpu.hyperparameter_optimization import load_trials
    trials = load_trials(args.hyperopt_dir)
    done = [t for t in trials if t.get("loss") is not None]
    print(f"{len(trials)} trials ({len(done)} scored)")
    for t in sorted(done, key=lambda t: t["loss"])[:10]:
        print(f"  loss={t['loss']:.4f} params={t['params']}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("similarity")
    s.add_argument("--data_path_1", required=True)
    s.add_argument("--data_path_2", required=True)
    s.add_argument("--max_mols", type=int, default=2000)
    s = sub.add_parser("find_similar_mols")
    s.add_argument("--test_path", required=True)
    s.add_argument("--train_path", required=True)
    s.add_argument("--save_path")
    s.add_argument("--num_neighbors", type=int, default=5)
    s.add_argument("--max_mols", type=int, default=5000)
    s = sub.add_parser("tsne")
    s.add_argument("--data_paths", nargs="+", required=True)
    s.add_argument("--save_path", required=True)
    s.add_argument("--max_mols", type=int, default=1000)
    s = sub.add_parser("wilcoxon")
    s.add_argument("--results_a", required=True)
    s.add_argument("--results_b", required=True)
    s = sub.add_parser("welchs")
    s.add_argument("--results_a", required=True)
    s.add_argument("--results_b", required=True)
    s = sub.add_parser("aggregate")
    s.add_argument("--results_dirs", nargs="+", required=True)
    s = sub.add_parser("check_hyperopt")
    s.add_argument("--hyperopt_dir", required=True)
    s = sub.add_parser("depict")
    s.add_argument("--data_path", required=True)
    s.add_argument("--save_dir", required=True)
    s.add_argument("--max_mols", type=int, default=0)
    s.add_argument("--width", type=int, default=320)
    s.add_argument("--height", type=int, default=240)
    args = p.parse_args()
    globals()[f"cmd_{args.cmd}"](args)
