"""Golden tests for the featurization layer: exact vocabulary dimensions,
index arrays, polymer weights/structure, reaction feature widths, and the
static-shape batcher. The reference has no such tests (SURVEY.md §4)."""

import math

import numpy as np
import pytest

from polymer_chemprop_tpu.features import (
    ATOM_FDIM,
    BOND_FDIM,
    FeaturizationConfig,
    MolGraph,
    batch_graphs,
    mol2graph,
    parse_polymer_rules,
)


class TestFeatureVectors:
    def test_dims(self):
        assert ATOM_FDIM == 133 and BOND_FDIM == 14
        g = MolGraph("CCO")
        assert len(g.f_atoms[0]) == 133
        assert len(g.f_bonds[0]) == 147

    def test_atom_feature_content(self):
        g = MolGraph("C")  # methane
        f = g.f_atoms[0]
        assert f[5] == 1                   # atomic_num 6 -> slot index 5
        assert sum(f[:101]) == 1
        deg = f[101:108]
        assert deg[4] == 1                 # total degree 4 (4 Hs)
        nh = f[119:125]
        assert nh[4] == 1                  # 4 hydrogens
        assert f[131] == 0                 # not aromatic
        assert abs(f[132] - 0.12011) < 1e-4  # 0.01 * mass

    def test_bond_feature_content(self):
        g = MolGraph("C=C")
        fb = g.f_bonds[0][133:]
        assert fb[0] == 0 and fb[2] == 1   # not-None, double bond
        assert fb[5] == 0                  # isolated double bond: NOT conjugated
        assert fb[6] == 0                  # not in ring
        assert fb[7] == 1                  # stereo none slot
        # butadiene: all three bonds conjugated
        g2 = MolGraph("C=CC=C")
        for b in range(0, 6, 2):
            assert g2.f_bonds[b][133 + 5] == 1
        # acetone carbonyl: isolated -> not conjugated
        g3 = MolGraph("CC(C)=O")
        dbl_rows = [i for i in range(g3.n_bonds) if g3.f_bonds[i][133 + 2] == 1]
        assert all(g3.f_bonds[i][133 + 5] == 0 for i in dbl_rows)
        # amide: C=O and C-N both conjugated
        g4 = MolGraph("CC(=O)NC")
        conj = [i for i in range(g4.n_bonds) if g4.f_bonds[i][133 + 5] == 1]
        assert len(conj) == 4  # two undirected bonds x two directions

    def test_directed_pairing(self):
        g = MolGraph("CCO")
        assert g.b2a == [0, 1, 1, 2]
        assert g.b2dst == [1, 0, 2, 1]
        assert g.b2revb == [1, 0, 3, 2]
        assert g.w_bonds == [1.0] * 4
        assert g.w_atoms == [1.0] * 3


class TestPolymer:
    CFG = FeaturizationConfig(polymer=True)

    def test_rules_parsing(self):
        info, xn = parse_polymer_rules(["1-2:0.375:0.625", "2-1:0.625:0.375~100"])
        assert info == [("1", "2", 0.375, 0.625), ("2", "1", 0.625, 0.375)]
        assert abs(xn - (1 + math.log10(100))) < 1e-12

    def test_polymer_graph(self):
        g = MolGraph("[*:1]CC[*:2]|1.0|<1-2:0.3:0.7", self.CFG)
        assert g.n_atoms == 2              # wildcards removed
        assert g.w_atoms == [1.0, 1.0]
        # 1 intra bond (2 directed) + 1 stochastic (2 directed)
        assert g.n_bonds == 4
        assert g.w_bonds == [1.0, 1.0, 0.3, 0.7]

    def test_stoichiometry_weights(self):
        g = MolGraph("[*:1]C[*:2].[*:3]O[*:4]|0.25|0.75|<1-3:0.5:0.5", self.CFG)
        assert g.w_atoms == [0.25, 0.75]

    def test_attachment_saturation(self):
        # featurized with wildcard attached: the C has 2 heavy neighbours
        g = MolGraph("[*:1]CC[*:2]|1.0|<1-2:0.5:0.5", self.CFG)
        f = g.f_atoms[0]
        deg = f[101:108]
        # total degree includes Hs: C + wildcard + 2 Hs = 4 (the wildcard
        # counts as a neighbour, so only 2 Hs — not the 3 of a free CH3)
        assert deg[4] == 1
        nh = f[119:125]
        assert nh[2] == 1                  # 2 Hs, not 3

    def test_degree_of_polym_default(self):
        g = MolGraph("[*:1]CC[*:2]|1.0|<1-2:0.5:0.5", self.CFG)
        assert g.degree_of_polym == 1.0


class TestReaction:
    def test_reac_diff_widths(self):
        cfg = FeaturizationConfig.for_reaction("reac_diff")
        g = MolGraph("[CH3:1][OH:2]>>[CH3:1][O-:2]", cfg)
        assert len(g.f_atoms[0]) == 133 + 32
        assert len(g.f_bonds[0]) == (133 + 32) + (14 + 14)
        assert g.w_atoms == [1.0, 1.0]
        assert g.w_bonds == [1.0, 1.0]

    @pytest.mark.parametrize("mode", ["reac_prod", "prod_diff", "reac_diff_balance",
                                      "reac_prod_balance", "prod_diff_balance"])
    def test_modes_run(self, mode):
        cfg = FeaturizationConfig.for_reaction(mode)
        g = MolGraph("[CH2:1]=[CH2:2].[H:3][H:4]>>[CH3:1][CH3:2]", cfg)
        assert g.n_atoms >= 2


class TestBatching:
    def test_padding_envelope(self):
        b = mol2graph(["CCO", "c1ccccc1"], pad_atoms=64, pad_bonds=64, pad_mols=4)
        assert b.f_atoms.shape == (64, 133)
        assert b.f_bonds.shape == (64, 147)
        assert b.mol_mask.tolist() == [1, 1, 0, 0]
        # slot 0 is all-zero padding
        assert b.f_atoms[0].sum() == 0 and b.w_atoms[0] == 0

    def test_index_offsets(self):
        g1, g2 = MolGraph("CCO"), MolGraph("CC")
        b = batch_graphs([g1, g2], pad_atoms=32, pad_bonds=32, pad_mols=2)
        # second molecule's atoms start after first molecule's (offset 1+3)
        assert b.a2mol[4] == 1
        # its first bond points at atom 4
        assert b.b2a[5] == 4 and b.b2dst[5] == 5
        # reverse-bond pairing is self-consistent everywhere
        real = slice(1, b.n_bonds_real)
        rev = b.b2revb[real]
        assert (b.b2revb[rev] == np.arange(1, b.n_bonds_real)).all()
        # reverse bond swaps src/dst
        assert (b.b2a[rev] == b.b2dst[real]).all()

    def test_envelope_overflow_raises(self):
        with pytest.raises(ValueError):
            mol2graph(["CCCCCCCCCC"], pad_atoms=4, pad_bonds=4, pad_mols=1)


class TestMorganRDKitParity:
    """Bit-identical RDKit Morgan hashing (reference
    features_generators.py:52-89 via GetMorganFingerprintAsBitVect).
    Anchors are published RDKit outputs, independently verifiable."""

    def test_benzene_on_bits(self):
        from polymer_chemprop_tpu.features.generators import (
            morgan_binary_features_generator,
        )
        fp = morgan_binary_features_generator("c1ccccc1")
        assert sorted(np.nonzero(fp)[0].tolist()) == [389, 1088, 1873]

    def test_rdkit_docs_example_ids(self):
        # RDKit "Getting Started" example: c1cccnc1C unhashed Morgan-2 ids
        # include 98513984 (atoms 1,2 at radius 1) and 4048591891 (atom 5
        # at radius 2), 16 unique ids total.
        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.features.generators import (
            morgan_environments,
        )
        ids = morgan_environments(parse_smiles("c1cccnc1C"), 2)
        assert len(set(ids)) == 16
        assert 98513984 in ids and 4048591891 in ids

    def test_count_fp_multiplicity(self):
        # layer-0 ids are per-atom (not deduped): benzene count fp has a
        # bit with count 6 (GetHashedMorganFingerprint semantics)
        from polymer_chemprop_tpu.features.generators import (
            morgan_counts_features_generator,
        )
        fp = morgan_counts_features_generator("c1ccccc1")
        assert fp[1873] == 6.0 and fp[389] == 6.0 and fp[1088] == 6.0
        assert fp.sum() == 18.0

    def test_disconnected_atom(self):
        # degree-0 atoms contribute only their layer-0 invariant
        from polymer_chemprop_tpu.features.generators import (
            morgan_binary_features_generator,
        )
        fp_na = morgan_binary_features_generator("[Na+].[Cl-]")
        assert fp_na.sum() == 2.0
