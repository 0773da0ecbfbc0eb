"""Unit tests for the standalone chemistry runtime.

The reference has no unit tests for featurization inputs (SURVEY.md §4);
these cover the SMILES parser and perception algorithms that replace RDKit.
"""

import csv
import os

import pytest

from polymer_chemprop_tpu.chem import parse_smiles
from polymer_chemprop_tpu.chem.mol import (
    DOUBLE,
    STEREOE,
    STEREOZ,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def atom_of(mol, num):
    return next(a for a in mol.atoms if a.atomic_num == num)


class TestParsing:
    def test_benzene_aromatic_form(self):
        m = parse_smiles("c1ccccc1")
        assert m.n_atoms == 6 and m.n_bonds == 6
        assert all(a.is_aromatic and a.num_hs == 1 for a in m.atoms)
        assert all(b.in_ring and b.conjugated for b in m.bonds)
        assert sum(1 for b in m.bonds if b.kekule_order == DOUBLE) == 3

    def test_benzene_kekule_form_perceived_aromatic(self):
        m = parse_smiles("C1=CC=CC=C1")
        assert all(a.is_aromatic for a in m.atoms)
        assert all(a.num_hs == 1 for a in m.atoms)

    def test_pyridine_vs_pyrrole_h_counts(self):
        assert atom_of(parse_smiles("c1ccncc1"), 7).num_hs == 0
        assert atom_of(parse_smiles("c1cc[nH]c1"), 7).num_hs == 1

    def test_hybridization(self):
        m = parse_smiles("CC(C)=CCCC(C)=CC(=O)")
        hybs = [a.hybridization for a in m.atoms]
        assert hybs[0] == "SP3" and hybs[1] == "SP2"

    def test_charges(self):
        m = parse_smiles("C[N+](C)(C)C")
        n = atom_of(m, 7)
        assert n.formal_charge == 1 and n.num_hs == 0
        m = parse_smiles("[O-]C(=O)C")
        o = m.atoms[0]
        assert o.formal_charge == -1 and o.num_hs == 0

    def test_chirality_tags(self):
        m = parse_smiles("C[C@H](N)C(=O)O")
        c = m.atoms[1]
        assert c.chiral_tag == 2  # '@' -> CCW
        m = parse_smiles("C[C@@H](N)C(=O)O")
        assert m.atoms[1].chiral_tag == 1

    def test_double_bond_stereo(self):
        m = parse_smiles("F/C=C/F")
        dbl = next(b for b in m.bonds if b.order == DOUBLE)
        assert dbl.stereo == STEREOE
        m = parse_smiles("F/C=C\\F")
        dbl = next(b for b in m.bonds if b.order == DOUBLE)
        assert dbl.stereo == STEREOZ

    def test_wildcards_with_atom_maps(self):
        m = parse_smiles("[*:1]c1ccc([*:2])cc1")
        wild = [a for a in m.atoms if a.atomic_num == 0]
        assert len(wild) == 2
        assert wild[0].props["atom_map"] == 1
        att = m.neighbors(wild[0].idx)[0]
        # attachment carbon is saturated by the wildcard: no H
        assert m.atoms[att].num_hs == 0

    def test_explicit_h_folding(self):
        m = parse_smiles("[CH3][H]".replace("[CH3]", "C"))
        assert m.n_atoms == 1 and m.atoms[0].num_hs == 4

    def test_keep_h(self):
        m = parse_smiles("C([H])([H])([H])[H]", keep_h=True)
        assert m.n_atoms == 5

    def test_add_h(self):
        m = parse_smiles("CC", add_h=True)
        assert m.n_atoms == 8

    def test_ring_closure_percent(self):
        m = parse_smiles("C%10CCCCC%10")
        assert m.n_atoms == 6 and all(a.in_ring for a in m.atoms)

    def test_invalid_returns_none_when_not_strict(self):
        assert parse_smiles("not_a_smiles", strict=False) is None
        assert parse_smiles("C1CC", strict=False) is None  # unclosed ring

    def test_fused_aromatics(self):
        m = parse_smiles("c1ccc2ccccc2c1")  # naphthalene
        assert m.n_atoms == 10
        assert all(a.is_aromatic for a in m.atoms)
        fusion = [a for a in m.atoms if len(m.neighbors(a.idx)) == 3]
        assert len(fusion) == 2 and all(a.num_hs == 0 for a in fusion)

    def test_aromatic_n_oxide(self):
        m = parse_smiles("Nc1cc(nc(N)n1=O)N2CCCCC2")
        ring_n = [a for a in m.atoms if a.atomic_num == 7 and a.is_aromatic]
        assert all(a.num_hs == 0 for a in ring_n)


class TestFixtureCoverage:
    @pytest.mark.parametrize("fname", ["regression.csv", "classification.csv"])
    def test_all_fixture_smiles_parse(self, fname):
        path = os.path.join(DATA, fname)
        with open(path) as fh:
            reader = csv.reader(fh)
            next(reader)
            bad = []
            for row in reader:
                if row and parse_smiles(row[0], strict=False) is None:
                    bad.append(row[0])
        assert not bad, f"{len(bad)} fixture SMILES failed to parse: {bad[:5]}"


class TestChiralityNormalization:
    """Tags are normalized to the molecule's bond-list order, so the same
    3D configuration written differently yields consistent R/S labels."""

    @staticmethod
    def _rs(smiles):
        import functools
        from polymer_chemprop_tpu.chem.smiles import _perm_parity
        from polymer_chemprop_tpu.chem.stereo import compare_branches
        m = parse_smiles(smiles)
        for a in m.atoms:
            if a.chiral_tag:
                nbrs = [b.other(a.idx) for b in m.atom_bonds(a.idx)]
                order = sorted(nbrs, key=functools.cmp_to_key(
                    lambda x, y: -compare_branches(m, a.idx, x, y)))
                mol_order = nbrs + (["H"] if a.num_hs else [])
                cip_order = order + (["H"] if a.num_hs else [])
                p = _perm_parity(mol_order, cip_order)
                return "R" if ((a.chiral_tag == 1) ^ p) == 0 else "S"
        return None

    def test_alanine_writings_consistent(self):
        labels = {self._rs("C[C@H](N)C(=O)O"),
                  self._rs("N[C@@H](C)C(=O)O"),
                  self._rs("OC(=O)[C@H](C)N")}
        assert len(labels) == 1

    def test_enantiomer_flips(self):
        assert self._rs("C[C@H](N)C(=O)O") != self._rs("C[C@@H](N)C(=O)O")

    def test_branch_order_swap(self):
        assert self._rs("C[C@](F)(Cl)Br") == self._rs("C[C@@](Cl)(F)Br")

    def test_ring_closure_position(self):
        assert self._rs("O[C@H]1CCCC1C") == self._rs("[C@H]1(O)CCCC1C")
        assert self._rs("O[C@H]1CCCC1C") != self._rs("[C@@H]1(O)CCCC1C")


class TestCIPStereoLabels:
    """E/Z assignment must follow CIP priorities, not the direction
    markers alone (RDKit AssignStereochemistry semantics). The flip cases
    mark the LOW-priority substituent: geometry relative to the markers
    and the E/Z label then disagree, so a marker-only heuristic fails
    them (VERDICT r1 item 4)."""

    CASES = [
        ("F/C=C/F", "E"), ("F/C=C\\F", "Z"),
        ("C/C=C\\C", "Z"), ("C/C=C/C", "E"),
        ("F/C=C/Cl", "E"),
        ("C/C(Br)=C/F", "Z"),      # Br outranks CH3: label flips
        ("Br/C(C)=C/F", "E"),
        ("C/C(Cl)=C/C(C)C", "Z"),  # Cl outranks CH3 on the left
    ]

    def test_labels(self):
        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.chem.mol import DOUBLE, STEREOE, STEREOZ
        for smi, want in self.CASES:
            m = parse_smiles(smi, strict=False)
            dbl = next(b for b in m.bonds if b.order == DOUBLE)
            got = {STEREOE: "E", STEREOZ: "Z"}.get(dbl.stereo, "none")
            assert got == want, f"{smi}: got {got}, want {want}"

    def test_equivalent_writings_consistent(self):
        """The same configuration written different ways must get the
        same label (internal consistency of the chiral/stereo
        normalization)."""
        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.chem.mol import DOUBLE
        for a, b in [("C/C=C/C", "C(\\C)=C/C"),
                     ("F/C=C/Cl", "Cl/C=C/F")]:
            sa = next(x for x in parse_smiles(a).bonds
                      if x.order == DOUBLE).stereo
            sb = next(x for x in parse_smiles(b).bonds
                      if x.order == DOUBLE).stereo
            assert sa == sb, (a, b, sa, sb)
