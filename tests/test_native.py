"""Native C++ featurizer parity tests: batch arrays must be bit-identical
to the Python featurization path for standard molecules."""

import csv
import os

import numpy as np
import pytest

from polymer_chemprop_tpu.features import FeaturizationConfig, mol2graph

native_ext = pytest.importorskip("polymer_chemprop_tpu.native_ext")

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(not native_ext.available(),
                                reason="native library not built")


def _smiles(fname, n=None):
    with open(os.path.join(DATA, fname)) as f:
        r = csv.reader(f)
        next(r)
        out = [row[0] for row in r]
    return out[:n] if n else out


@pytest.mark.parametrize("fname", ["regression.csv", "classification.csv"])
def test_exact_parity_with_python(fname):
    smiles = _smiles(fname)
    from polymer_chemprop_tpu.chem import parse_smiles
    smiles = [s for s in smiles if parse_smiles(s, strict=False) is not None]
    gb_n, valid = native_ext.featurize_batch_native(
        smiles, pad_atoms=20480, pad_bonds=40960)
    assert valid.all()
    gb_p = mol2graph(smiles, pad_atoms=20480, pad_bonds=40960,
                     pad_mols=len(smiles))
    for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
              "b2a", "b2dst", "b2revb", "a2mol"):
        np.testing.assert_allclose(
            np.asarray(getattr(gb_n, k), dtype=float),
            np.asarray(getattr(gb_p, k), dtype=float),
            atol=1e-5, err_msg=f"array {k} differs")
    assert gb_n.n_atoms_real == gb_p.n_atoms_real
    assert gb_n.n_bonds_real == gb_p.n_bonds_real


def test_invalid_smiles_flagged():
    gb, valid = native_ext.featurize_batch_native(
        ["CCO", "not_a_smiles", "c1ccccc1"], pad_atoms=256, pad_bonds=256)
    assert valid.tolist() == [1, 0, 1]
    assert gb.mol_mask.tolist() == [1.0, 0.0, 1.0]


def test_count():
    atoms, bonds = native_ext.count_native(["CCO", "c1ccccc1", "xx"])
    assert atoms.tolist() == [3, 6, -1]
    assert bonds.tolist() == [4, 12, -1]


def test_loader_native_path():
    from polymer_chemprop_tpu.data import MoleculeDataLoader, MoleculeDatapoint, MoleculeDataset
    smiles = _smiles("regression.csv", 60)
    data = MoleculeDataset([MoleculeDatapoint([s], [1.0]) for s in smiles])
    cfg = FeaturizationConfig()
    l_py = MoleculeDataLoader(data, cfg, batch_size=20, num_workers=1,
                              use_native=False)
    l_nat = MoleculeDataLoader(data, cfg, batch_size=20, num_workers=1,
                               use_native=True)
    assert l_nat.use_native
    batches_py = list(l_py)
    batches_nat = list(l_nat)
    assert len(batches_py) == len(batches_nat)
    for bp, bn in zip(batches_py, batches_nat):
        for k in bp.graph_arrays[0]:
            np.testing.assert_allclose(bn.graph_arrays[0][k],
                                       bp.graph_arrays[0][k], atol=1e-5)
