"""Murcko scaffold extraction and grouping tests
(reference data/scaffold.py has no unit tests)."""

import numpy as np

from polymer_chemprop_tpu.chem import parse_smiles
from polymer_chemprop_tpu.chem.scaffold import murcko_scaffold_atoms, scaffold_key


class TestMurcko:
    def test_side_chains_removed(self):
        # toluene -> benzene scaffold (methyl dropped)
        m = parse_smiles("Cc1ccccc1")
        atoms = murcko_scaffold_atoms(m)
        assert len(atoms) == 6
        assert all(m.atoms[a].is_aromatic for a in atoms)

    def test_acyclic_molecule_empty_scaffold(self):
        m = parse_smiles("CCO")
        assert murcko_scaffold_atoms(m) == set()
        assert scaffold_key("CCO") == scaffold_key("CCCCCC")  # both empty

    def test_exocyclic_double_bond_kept(self):
        # cyclohexanone keeps its =O; acetophenone drops the whole acetyl
        m1 = parse_smiles("O=C1CCCCC1")
        assert len(murcko_scaffold_atoms(m1)) == 7
        m2 = parse_smiles("CC(=O)c1ccccc1")
        assert len(murcko_scaffold_atoms(m2)) == 6

    def test_linker_between_rings_kept(self):
        m = parse_smiles("c1ccccc1CCc1ccccc1")  # bibenzyl
        atoms = murcko_scaffold_atoms(m)
        assert len(atoms) == 14  # two rings + 2-carbon linker

    def test_grouping(self):
        # same framework, different substituents -> same key
        variants = ["c1ccccc1", "Cc1ccccc1", "CCc1ccccc1", "Oc1ccccc1"]
        keys = {scaffold_key(s) for s in variants}
        assert len(keys) == 1
        # different frameworks -> different keys
        assert scaffold_key("c1ccccc1") != scaffold_key("C1CCCCC1")
        assert scaffold_key("c1ccccc1") != scaffold_key("c1ccncc1")
        assert scaffold_key("c1ccc2ccccc2c1") != scaffold_key("c1ccccc1")

    def test_split_determinism(self):
        from polymer_chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, scaffold_split
        import csv, os
        path = os.path.join(os.path.dirname(__file__), "data", "regression.csv")
        with open(path) as f:
            r = csv.reader(f)
            next(r)
            data = MoleculeDataset([MoleculeDatapoint([row[0]], [float(row[1])])
                                    for _, row in zip(range(150), r)])
        t1, v1, s1 = scaffold_split(data, balanced=True, seed=0)
        t2, v2, s2 = scaffold_split(data, balanced=True, seed=0)
        assert [d.smiles for d in t1] == [d.smiles for d in t2]
        # scaffolds never straddle splits
        train_keys = {scaffold_key(d.smiles[0]) for d in t1}
        test_keys = {scaffold_key(d.smiles[0]) for d in s1}
        assert not (train_keys & test_keys)
