"""Batch loader: dataset -> fixed-shape device-ready arrays.

Replaces the reference's torch DataLoader + collate pipeline
(reference data/data.py:594-680). Featurization runs on host (optionally
on a thread pool, overlapped with device compute via one-batch prefetch);
every emitted batch shares a single padding envelope so the jitted train
step compiles once.

Sampling mirrors MoleculeSampler (reference data.py:537-591): seeded
shuffle and optional class_balance interleaving of positive/negative pairs.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from random import Random
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..features import FeaturizationConfig, batch_graphs, round_up
from .datapoint import MoleculeDataset


class DeviceBatch:
    """Host-side arrays for one training step."""

    def __init__(self, graph_arrays: List[Dict[str, np.ndarray]],
                 targets: np.ndarray, mask: np.ndarray,
                 data_weights: np.ndarray,
                 features: Optional[np.ndarray],
                 mol_mask: np.ndarray,
                 size: int,
                 atom_descriptors: Optional[np.ndarray] = None):
        self.graph_arrays = graph_arrays  # one dict per molecule position
        self.targets = targets            # (M, T) float32, 0 where missing
        self.mask = mask                  # (M, T) float32, 1 where present
        self.data_weights = data_weights  # (M, 1) float32
        self.features = features          # (M, F) float32 or None
        self.mol_mask = mol_mask          # (M,) padding rows are 0
        self.size = size                  # real datapoints in this batch
        self.atom_descriptors = atom_descriptors


class MoleculeDataLoader:
    """Iterable over DeviceBatches with a stable padding envelope."""

    def __init__(self,
                 dataset: MoleculeDataset,
                 config: FeaturizationConfig,
                 batch_size: int = 50,
                 shuffle: bool = False,
                 seed: int = 0,
                 class_balance: bool = False,
                 num_workers: int = 8,
                 pad_atoms: Optional[int] = None,
                 pad_bonds: Optional[int] = None,
                 align: int = 256,
                 use_native: Optional[bool] = None,
                 use_pallas: "bool | None" = False):
        self.dataset = dataset
        self.config = config
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.class_balance = class_balance
        self._random = Random(seed)
        self.num_workers = num_workers
        self._pad_atoms = pad_atoms
        self._pad_bonds = pad_bonds
        self._align = align
        self._length: Optional[int] = None
        self.number_of_molecules = (len(dataset[0].smiles) if len(dataset) else 1)
        # native C++ featurization: standard molecules (incl. explicit-H
        # retention and AddHs), wD-MPNN polymer ensembles, and atom-mapped
        # reactions (extra per-atom/bond features stay on the Python path).
        # None = auto: use the C++ featurizer whenever it is built and the
        # config is native-eligible (bit-identical to the Python path)
        if use_native is None:
            use_native = True
        self._native_polymer = False
        self._native_reaction: Optional[str] = None
        self._native_keep_h = False
        self._native_add_h = False
        self._native_atom_extras = False
        self._native_bond_extras = False
        if use_native:
            from ..native_ext import (available, hydrogens_available,
                                      polymer_available, reaction_available)
            atom_extras = (len(dataset) > 0 and
                           dataset[0].atom_features is not None)
            bond_extras = (len(dataset) > 0 and
                           dataset[0].bond_features is not None)
            # extra per-ATOM/per-BOND feature files widen the native arrays
            # through a vectorized post-concat (standard single-molecule
            # configs only); bond extras additionally need the native
            # parse-order bond-index export
            if bond_extras:
                from ..native_ext import bond_parse_available
                bond_extras_ok = bond_parse_available()
            else:
                bond_extras_ok = True
            standard = (not config.reaction and not config.polymer
                        and self.number_of_molecules == 1)
            extras_ok = bond_extras_ok and (
                not (atom_extras or bond_extras) or standard)
            no_extras = not atom_extras and not bond_extras
            if config.reaction:
                # reaction supports keep_h (explicit_h) and add_h natively
                use_native = reaction_available() and no_extras
                if config.adding_h:
                    from ..native_ext import reaction_hydrogens_available
                    use_native = use_native and reaction_hydrogens_available()
                if use_native:
                    self._native_reaction = config.reaction_mode
                    self._native_keep_h = config.explicit_h
                    self._native_add_h = config.adding_h
            elif config.polymer:
                if config.explicit_h or config.adding_h:
                    from ..native_ext import polymer_hydrogens_available
                    use_native = polymer_hydrogens_available() and no_extras
                    if use_native:
                        self._native_keep_h = config.explicit_h
                        self._native_add_h = config.adding_h
                else:
                    use_native = polymer_available() and no_extras
                self._native_polymer = use_native
            elif config.explicit_h or config.adding_h:
                use_native = hydrogens_available() and extras_ok
                if use_native:
                    self._native_keep_h = config.explicit_h
                    self._native_add_h = config.adding_h
            else:
                use_native = available() and extras_ok
            self._native_atom_extras = use_native and atom_extras
            self._native_bond_extras = use_native and bond_extras
        self.use_native = use_native
        # Pallas band kernel needs TILE_B-multiple, >= EXT bond envelopes,
        # and a TPU backend (CPU would need interpreter mode)
        if use_pallas or use_pallas is None:
            import jax
            if jax.default_backend() not in ("tpu", "axon"):
                if use_pallas:  # explicit request on a non-TPU backend
                    import warnings
                    warnings.warn("use_pallas requires a TPU backend; "
                                  "falling back to the XLA segment-sum path")
                use_pallas = False
            else:
                use_pallas = True  # None = auto: on for TPU backends
        self.use_pallas = use_pallas
        if use_pallas:
            from ..ops.pallas_mpnn import EXT, TILE_B
            self._align = max(self._align, TILE_B)
            # the EXT floor must itself be TILE_B-aligned, or a small
            # dataset whose computed envelope is below it would get a
            # non-multiple-of-TILE_B pad (kernel asserts on that)
            self._pad_bonds = max(self._pad_bonds or 0,
                                  round_up(EXT, TILE_B))

    # -- sampling (reference MoleculeSampler, data.py:537-591) --------------
    def _indices(self) -> List[int]:
        n = len(self.dataset)
        if self.class_balance:
            indices = list(range(n))
            has_active = [any(t == 1 for t in self.dataset[i].targets if t is not None)
                          for i in indices]
            positives = [i for i in indices if has_active[i]]
            negatives = [i for i in indices if not has_active[i]]
            if self.shuffle:
                self._random.shuffle(positives)
                self._random.shuffle(negatives)
            indices = [idx for pair in zip(positives, negatives) for idx in pair]
            return indices
        indices = list(range(n))
        if self.shuffle:
            self._random.shuffle(indices)
        return indices

    def __len__(self) -> int:
        if self.class_balance:
            return math.ceil(len(self._indices()) / self.batch_size)
        return math.ceil(len(self.dataset) / self.batch_size)

    @property
    def iter_size(self) -> int:
        """Datapoints per epoch (reference data.py:670-676)."""
        return len(self._indices()) if self.class_balance else len(self.dataset)

    def targets(self) -> List[List[Optional[float]]]:
        if self.class_balance or self.shuffle:
            raise ValueError("Cannot safely extract targets when class_balance "
                             "or shuffle are enabled.")
        return [d.targets for d in self.dataset]

    # -- envelope -----------------------------------------------------------
    def estimated_pad_bonds(self) -> int:
        """Bond envelope under the identity order (the sticky envelope can
        only grow from here). Used by the trainer's graph-parallel auto
        rule; the per-datapoint counts it computes are cached for reuse."""
        self._compute_envelope(list(range(len(self.dataset))))
        return int(self._pad_bonds)

    def estimated_pad_atoms(self) -> int:
        """Current atom envelope (computing it first if needed) — the
        trainer's graph-parallel path sizes its fixed halo atom window
        from this each epoch."""
        if self._pad_atoms is None:
            self._compute_envelope(list(range(len(self.dataset))))
        return int(self._pad_atoms)

    def _compute_envelope(self, order: List[int]) -> None:
        """Choose pad sizes covering every batch under the current order.
        Sticky (monotone non-decreasing) and aligned, so reshuffles reuse
        the cached executable almost always. Per-datapoint counts are
        computed once and cached across epochs."""
        counts = getattr(self, "_counts", None)
        if counts is None:
            if self.use_native:
                from ..native_ext import count_native
                a = np.zeros(len(self.dataset), np.int64)
                b = np.zeros(len(self.dataset), np.int64)
                for pos in range(self.number_of_molecules):
                    ap, bp = count_native(
                        [d.smiles[pos] for d in self.dataset],
                        n_threads=self.num_workers,
                        polymer=self._native_polymer,
                        reaction_mode=self._native_reaction,
                        keep_h=self._native_keep_h,
                        add_h=self._native_add_h)
                    a += np.maximum(ap, 0)
                    b += np.maximum(bp, 0)
                counts = list(zip(a.tolist(), b.tolist()))
            else:
                counts = []
                for d in self.dataset:
                    graphs = d.mol_graphs(self.config)
                    counts.append((sum(g.n_atoms for g in graphs),
                                   sum(g.n_bonds for g in graphs)))
            self._counts = counts
        max_a = max_b = 0
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            max_a = max(max_a, 1 + sum(counts[j][0] for j in chunk))
            max_b = max(max_b, 1 + sum(counts[j][1] for j in chunk))
        pa = round_up(max(max_a, 1), self._align)
        pb = round_up(max(max_b, 1), self._align)
        self._pad_atoms = max(self._pad_atoms or 0, pa)
        self._pad_bonds = max(self._pad_bonds or 0, pb)

    def _apply_extras(self, gb, points, valid, b2parse=None):
        """Widen a native GraphBatch with per-atom and/or per-bond extra
        features exactly like MolGraph._build_standard (extend or
        overwrite): atom extras land on the packed atom slots, bond extras
        are gathered through the native parse-order index (aligned to the
        parser's bond.idx, like the reference's bond.GetIdx()), and every
        f_bonds row re-copies its SOURCE atom's widened vector through b2a
        (padding rows stay zero because slot/index 0 is zero)."""
        if not valid.all():
            raise ValueError("invalid SMILES in a batch with extra "
                             "features (row alignment would be lost)")
        base = gb.f_atoms
        base_bond_cols = gb.f_bonds.shape[1] - base.shape[1]
        f_atoms = base
        if self._native_atom_extras:
            extras = [np.asarray(p.atom_features, np.float32)
                      for p in points]
            E = extras[0].shape[1]
            overwrite = self.config.overwrite_default_atom_features
            width = E if overwrite else base.shape[1] + E
            f_atoms = np.zeros((base.shape[0], width), np.float32)
            if not overwrite:
                f_atoms[:, :base.shape[1]] = base
            # per-molecule length check (featurization.py _build_standard)
            per_mol = np.bincount(gb.a2mol[1:gb.n_atoms_real],
                                  minlength=len(points))
            if any(per_mol[i] != ex.shape[0]
                   for i, ex in enumerate(extras)):
                raise ValueError(
                    "number of atoms differs from extra atom features")
            stacked = np.concatenate(extras, axis=0)
            f_atoms[1:1 + stacked.shape[0], width - E:] = stacked
        bond_cols = gb.f_bonds[:, -base_bond_cols:]
        if self._native_bond_extras:
            bextras = [np.asarray(p.bond_features, np.float32)
                       for p in points]
            mol_of_bond = gb.a2mol[gb.b2dst[1:gb.n_bonds_real]]
            per_mol_dir = np.bincount(mol_of_bond, minlength=len(points))
            if any(per_mol_dir[i] != 2 * bx.shape[0]
                   for i, bx in enumerate(bextras)):
                raise ValueError(
                    "number of bonds differs from extra bond features")
            Eb = bextras[0].shape[1]
            # index 0 of the zero-prepended concat catches padding rows
            cat = np.concatenate(
                [np.zeros((1, Eb), np.float32)] + bextras, axis=0)
            extra_rows = cat[b2parse]
            if self.config.overwrite_default_bond_features:
                bond_cols = extra_rows
            else:
                bond_cols = np.concatenate([bond_cols, extra_rows], axis=1)
        f_bonds = np.concatenate([f_atoms[gb.b2a], bond_cols], axis=1)
        gb.f_atoms = f_atoms
        gb.f_bonds = f_bonds
        return gb

    def _make_batch(self, idxs: List[int]) -> DeviceBatch:
        points = [self.dataset[i] for i in idxs]
        n_pos = self.number_of_molecules
        graph_arrays = []
        if self.use_native:
            from ..native_ext import featurize_batch_native
            for pos in range(n_pos):
                b2parse = (np.zeros(self._pad_bonds, np.int32)
                           if self._native_bond_extras else None)
                gb, valid = featurize_batch_native(
                    [p.smiles[pos] for p in points],
                    pad_atoms=self._pad_atoms, pad_bonds=self._pad_bonds,
                    pad_mols=self.batch_size, n_threads=self.num_workers,
                    polymer=self._native_polymer,
                    reaction_mode=self._native_reaction,
                    keep_h=self._native_keep_h,
                    add_h=self._native_add_h,
                    bond_parse_out=b2parse)
                if self._native_atom_extras or self._native_bond_extras:
                    gb = self._apply_extras(gb, points, valid, b2parse)
                graph_arrays.append(gb.arrays(pallas=self.use_pallas))
        else:
            for pos in range(n_pos):
                graphs = [p.mol_graphs(self.config)[pos] for p in points]
                gb = batch_graphs(graphs, pad_atoms=self._pad_atoms,
                                  pad_bonds=self._pad_bonds,
                                  pad_mols=self.batch_size)
                graph_arrays.append(gb.arrays(pallas=self.use_pallas))
        M = self.batch_size
        num_tasks = len(points[0].targets) if points[0].targets is not None else 0
        targets = np.zeros((M, num_tasks), np.float32)
        mask = np.zeros((M, num_tasks), np.float32)
        weights = np.zeros((M, 1), np.float32)
        mol_mask = np.zeros((M,), np.float32)
        for i, p in enumerate(points):
            if p.targets is not None:
                for t, v in enumerate(p.targets):
                    if v is not None:
                        targets[i, t] = v
                        mask[i, t] = 1.0
            weights[i, 0] = p.data_weight
            mol_mask[i] = 1.0
        feats = None
        if points[0].features is not None:
            F = len(points[0].features)
            feats = np.zeros((M, F), np.float32)
            for i, p in enumerate(points):
                feats[i] = p.features
        atom_desc = None
        if points[0].atom_descriptors is not None:
            # stack per-atom descriptors aligned with the batched atom axis
            A = self._pad_atoms
            D = points[0].atom_descriptors.shape[1]
            atom_desc = np.zeros((A, D), np.float32)
            ai = 1
            for p in points:
                d = p.atom_descriptors
                atom_desc[ai:ai + d.shape[0]] = d
                ai += d.shape[0]
        return DeviceBatch(graph_arrays, targets, mask, weights, feats,
                           mol_mask, size=len(points),
                           atom_descriptors=atom_desc)

    def __iter__(self) -> Iterator[DeviceBatch]:
        order = self._indices()
        if self._pad_atoms is None or self._pad_bonds is None or self.shuffle:
            self._compute_envelope(order)
        chunks = [order[i:i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        if self.num_workers > 1 and len(chunks) > 1:
            with ThreadPoolExecutor(max_workers=min(self.num_workers, 8)) as ex:
                futures = [ex.submit(self._make_batch, c) for c in chunks]
                for f in futures:
                    yield f.result()
        else:
            for c in chunks:
                yield self._make_batch(c)
