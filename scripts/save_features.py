"""Precompute molecule-level features in parallel with restartable shards
(reference scripts/save_features.py)."""

import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polymer_chemprop_tpu.data import get_data  # noqa: E402
from polymer_chemprop_tpu.features.generators import get_features_generator  # noqa: E402
from polymer_chemprop_tpu.features.utils import load_features, save_features  # noqa: E402


def generate_and_save_features(args):
    data = get_data(args.data_path, max_data_size=None)
    fg = get_features_generator(args.features_generator)
    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)

    # restart from saved shards
    temp_dir = args.save_path + "_temp"
    os.makedirs(temp_dir, exist_ok=True)
    done = 0
    shards = []
    if args.restart:
        for f in sorted(os.listdir(temp_dir)):
            if f.endswith(".npz"):
                shard = load_features(os.path.join(temp_dir, f))
                shards.append(shard)
                done += len(shard)

    smiles = [d.smiles[0] for d in data][done:]

    def featurize_chunk(pool, chunk):
        # rdkit_2d generators: one native batch call (C++ engine,
        # ~2.4k mol/s multithreaded, bit-identical to the Python path —
        # native/src/pcp_descriptors.inc) instead of per-molecule workers
        if args.features_generator in ("rdkit_2d", "rdkit_2d_normalized"):
            from polymer_chemprop_tpu import native_ext
            if native_ext.rdkit2d_available():
                vals, ok = native_ext.rdkit2d_batch_native(
                    chunk, n_threads=args.num_workers)
                if not ok.all():
                    # the Python engine directly: routing through the
                    # generator would retry the native parse that just
                    # failed for these exact SMILES
                    from polymer_chemprop_tpu.chem import parse_smiles
                    from polymer_chemprop_tpu.chem.descriptors import (
                        rdkit2d_raw,
                    )
                    for j in np.nonzero(~ok)[0]:
                        vals[j] = rdkit2d_raw(parse_smiles(chunk[j]))
                if args.features_generator == "rdkit_2d_normalized":
                    from polymer_chemprop_tpu.features.generators import (
                        rdkit2d_normalize_batch,
                    )
                    return rdkit2d_normalize_batch(vals)
                return vals
        return np.array(pool.map(fg, chunk))

    with Pool(args.num_workers) as pool:
        batch_size = args.shard_size
        for i in range(0, len(smiles), batch_size):
            chunk = smiles[i:i + batch_size]
            shard = featurize_chunk(pool, chunk)
            save_features(os.path.join(temp_dir, f"shard_{done + i:09d}.npz"),
                          shard)
            shards.append(shard)
            print(f"featurized {done + i + len(chunk)}/{done + len(smiles)}")

    features = np.concatenate(shards, axis=0) if shards else np.zeros((0, 0))
    save_features(args.save_path, features)
    print(f"saved {len(features)} feature vectors to {args.save_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--features_generator", default="morgan")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--shard_size", type=int, default=1000)
    p.add_argument("--restart", action="store_true",
                   help="resume from saved shards")
    generate_and_save_features(p.parse_args())
