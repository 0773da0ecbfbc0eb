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


def test_exact_parity_on_rewritten_smiles():
    """The C++ parser must agree with Python on write_smiles output too —
    rewritten SMILES place ring-closure digits and brackets differently
    from the corpus originals, exercising different parser paths."""
    from polymer_chemprop_tpu.chem import parse_smiles
    from polymer_chemprop_tpu.chem.write import write_smiles
    smiles = _smiles("regression.csv") + _smiles("classification.csv")
    rewritten = []
    for smi in smiles[::3]:
        m = parse_smiles(smi, strict=False)
        if m is not None:
            rewritten.append(write_smiles(m))
    assert len(rewritten) > 300
    gb_n, valid = native_ext.featurize_batch_native(
        rewritten, pad_atoms=20480, pad_bonds=40960)
    assert valid.all()
    gb_p = mol2graph(rewritten, pad_atoms=20480, pad_bonds=40960,
                     pad_mols=len(rewritten))
    for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
              "b2a", "b2dst", "b2revb", "a2mol"):
        np.testing.assert_allclose(
            np.asarray(getattr(gb_n, k), dtype=float),
            np.asarray(getattr(gb_p, k), dtype=float),
            atol=1e-5, err_msg=f"array {k} differs")


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


# ---------------------------------------------------------------- polymer

POLY_CFG = FeaturizationConfig(polymer=True)

MONOMERS = [
    "[*:1]CC[*:2]", "[*:1]c1ccc([*:2])cc1", "[*:1]CO[*:2]",
    "[*:1]C(C)C[*:2]", "[*:1]c1ccc([*:2])cc1C", "[*:1]CC(=O)O[*:2]",
    "[*:1]c1ccc(nc1)[*:2]", "[*:1]C=CC[*:2]", "[*:1]CC(F)(F)[*:2]",
    "[*:1]C[C@@H](C)O[*:2]", "[*:1]c1ccsc1[*:2]", "[*:1]CN(C)C(=O)[*:2]",
    "[*:1]CC([O-])=O.[Na+][*:2]".replace(".[Na+][*:2]", "[*:2]"),
]


def _copolymer_corpus():
    """Deterministic copolymer ensemble strings over diverse monomers."""
    import itertools
    out = []
    for i, (m1, m2) in enumerate(itertools.combinations(MONOMERS, 2)):
        m2r = m2.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        frac = 0.25 + 0.5 * ((i % 3) / 2.0)
        xn = "" if i % 2 else "~%d" % (10 + i)
        out.append(
            f"{m1}.{m2r}|{frac}|{1 - frac}|"
            f"<1-3:0.375:0.375<1-4:0.375:0.375<2-3:0.375:0.375"
            f"<2-4:0.375:0.375{xn}")
    # homopolymers (single monomer, self-connection)
    for m in MONOMERS[:4]:
        out.append(f"{m}|1.0|<1-2:0.5:0.5~25")
    return out


@pytest.mark.skipif(not getattr(native_ext, "polymer_available", lambda: False)(),
                    reason="native polymer support not built")
class TestPolymerNative:
    def _assert_identical(self, polys, pad_atoms=4096, pad_bonds=8192):
        gb_n, valid = native_ext.featurize_batch_native(
            polys, pad_atoms=pad_atoms, pad_bonds=pad_bonds, polymer=True)
        assert valid.all()
        gb_p = mol2graph(polys, POLY_CFG, pad_atoms=pad_atoms,
                         pad_bonds=pad_bonds, pad_mols=len(polys))
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol", "degree_of_polym"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"array {k} differs")
        assert gb_n.n_atoms_real == gb_p.n_atoms_real
        assert gb_n.n_bonds_real == gb_p.n_bonds_real

    def test_exact_parity_copolymer_corpus(self):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # stochastic-weight-sum warnings
            self._assert_identical(_copolymer_corpus())

    def test_double_bond_attachment(self):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            self._assert_identical(
                ["[*:1]=CC=[*:2]|1.0|<1-2:0.5:0.5~5",
                 "[*:1]=Cc1ccc(C=[*:2])cc1|1.0|<1-2:1.0:1.0"])

    def test_invalid_polymer_strings_flagged(self):
        bad = [
            "[*:1]CC[*:2]|1.0|<1-2:0.5",          # rule needs 3 fields
            "[*:1]CC[*:2]|1.0|<1-9:0.5:0.5",      # unknown R tag
            "[*:1]CC[*:2]|1.0|0.5|<1-2:0.5:0.5",  # weight count mismatch
            "[*:1]=CC[*:2]|1.0|<1-2:0.5:0.5",     # mismatched bond orders
            "not_a_polymer",                      # no weights at all
            "[*:1]CC[*:2]|1.0|<1-2:0.5:0.5~0",    # Xn <= 0 (log10 domain)
        ]
        good = "[*:1]CC[*:2]|1.0|<1-2:0.3:0.7~50"
        _, valid = native_ext.featurize_batch_native(
            bad + [good], pad_atoms=256, pad_bonds=256, polymer=True)
        assert valid.tolist() == [0] * len(bad) + [1]

    def test_count_polymer(self):
        atoms, bonds = native_ext.count_native(
            ["[*:1]CC[*:2]|1.0|<1-2:0.3:0.7~50", "xx"], polymer=True)
        assert atoms.tolist() == [2, -1]
        assert bonds.tolist() == [4, -1]

    @pytest.mark.skipif(
        not getattr(native_ext, "polymer_hydrogens_available",
                    lambda: False)(),
        reason="native polymer H support not built")
    @pytest.mark.parametrize("kh,ah", [(True, False), (False, True),
                                       (True, True)])
    def test_polymer_hydrogen_parity(self, kh, ah):
        import warnings
        polys = _copolymer_corpus()[:20]
        cfg = FeaturizationConfig(polymer=True, explicit_h=kh, adding_h=ah)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            gb_p = mol2graph(polys, cfg, pad_atoms=4096, pad_bonds=8192,
                             pad_mols=len(polys))
            gb_n, valid = native_ext.featurize_batch_native(
                polys, pad_atoms=4096, pad_bonds=8192, pad_mols=len(polys),
                polymer=True, keep_h=kh, add_h=ah)
        assert valid.all()
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol", "degree_of_polym"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"keep_h={kh} add_h={ah} array {k}")
        assert gb_n.n_atoms_real == gb_p.n_atoms_real
        assert gb_n.n_bonds_real == gb_p.n_bonds_real

    def test_loader_native_polymer_path(self):
        import warnings
        from polymer_chemprop_tpu.data import (
            MoleculeDataLoader,
            MoleculeDatapoint,
            MoleculeDataset,
        )
        polys = _copolymer_corpus()[:12]
        data = MoleculeDataset(
            [MoleculeDatapoint([s], [1.0]) for s in polys])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            l_py = MoleculeDataLoader(data, POLY_CFG, batch_size=4,
                                      num_workers=1, use_native=False)
            l_nat = MoleculeDataLoader(data, POLY_CFG, batch_size=4,
                                       num_workers=1, use_native=True)
            assert l_nat.use_native
            for bp, bn in zip(list(l_py), list(l_nat)):
                for k in bp.graph_arrays[0]:
                    if k == "pallas_aux":
                        continue
                    np.testing.assert_allclose(bn.graph_arrays[0][k],
                                               bp.graph_arrays[0][k],
                                               atol=1e-5, err_msg=k)


def test_loader_native_multi_molecule():
    from polymer_chemprop_tpu.data import (
        MoleculeDataLoader,
        MoleculeDatapoint,
        MoleculeDataset,
    )
    pairs = [["CCO", "c1ccccc1"], ["CC(=O)O", "CCN"], ["c1ccncc1", "CCCl"],
             ["C/C=C/C", "C[C@H](N)C(=O)O"], ["O=S(=O)(N)c1ccccc1", "CCOC"]]
    data = MoleculeDataset([MoleculeDatapoint(p, [1.0]) for p in pairs * 4])
    cfg = FeaturizationConfig()
    l_py = MoleculeDataLoader(data, cfg, batch_size=5, num_workers=1,
                              use_native=False)
    l_nat = MoleculeDataLoader(data, cfg, batch_size=5, num_workers=1,
                               use_native=True)
    assert l_nat.use_native
    for bp, bn in zip(list(l_py), list(l_nat)):
        assert len(bp.graph_arrays) == len(bn.graph_arrays) == 2
        for pos in range(2):
            for k in bp.graph_arrays[pos]:
                if k == "pallas_aux":
                    continue
                np.testing.assert_allclose(bn.graph_arrays[pos][k],
                                           bp.graph_arrays[pos][k],
                                           atol=1e-5, err_msg=f"pos{pos} {k}")


def test_loader_auto_defaults_to_native():
    """use_native=None (the trainer default) auto-enables the C++ path for
    every native-eligible config: standard, reaction, add_h, and per-atom
    extra features; per-bond extra features stay on the Python path."""
    from polymer_chemprop_tpu.data import (
        MoleculeDataLoader,
        MoleculeDatapoint,
        MoleculeDataset,
    )
    data = MoleculeDataset([MoleculeDatapoint(["CCO"], [1.0])])
    assert MoleculeDataLoader(data, FeaturizationConfig(), batch_size=1,
                              num_workers=1).use_native
    rxn = FeaturizationConfig(reaction=True, reaction_mode="reac_diff")
    d2 = MoleculeDataset([MoleculeDatapoint(["CCO>>CCN"], [1.0])])
    assert MoleculeDataLoader(d2, rxn, batch_size=1,
                              num_workers=1).use_native
    addh = FeaturizationConfig(adding_h=True)
    assert MoleculeDataLoader(data, addh, batch_size=1,
                              num_workers=1).use_native
    # extra per-atom features ride the native path (vectorized post-concat)
    extra = MoleculeDataset([MoleculeDatapoint(
        ["CCO"], [1.0], atom_features=np.ones((3, 2), np.float32))])
    assert MoleculeDataLoader(extra, FeaturizationConfig(), batch_size=1,
                              num_workers=1).use_native


class TestHydrogenNative:
    """Native keep_h (explicit-H retention) / add_h (AddHs) parity for
    standard molecules (reference make_mol variants, rdkit.py:3-18)."""

    pytestmark = pytest.mark.skipif(
        not native_ext.hydrogens_available(),
        reason="native library predates keep_h/add_h support")

    @pytest.mark.parametrize("kh,ah", [(True, False), (False, True),
                                       (True, True)])
    def test_exact_parity(self, kh, ah):
        smiles = _smiles("regression.csv", 120)
        smiles += ["[H]C([H])([H])O[H]", "[2H]C(Cl)Cl", "C[C@H](N)C(=O)O"]
        cfg = FeaturizationConfig(explicit_h=kh, adding_h=ah)
        gb_p = mol2graph(smiles, cfg, pad_atoms=8192, pad_bonds=16384,
                         pad_mols=len(smiles))
        gb_n, valid = native_ext.featurize_batch_native(
            smiles, pad_atoms=8192, pad_bonds=16384, pad_mols=len(smiles),
            keep_h=kh, add_h=ah)
        assert valid.all()
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"keep_h={kh} add_h={ah} array {k}")
        assert gb_n.n_atoms_real == gb_p.n_atoms_real
        assert gb_n.n_bonds_real == gb_p.n_bonds_real

    def test_loader_add_h_parity(self):
        from polymer_chemprop_tpu.data import (
            MoleculeDataLoader,
            MoleculeDatapoint,
            MoleculeDataset,
        )
        smiles = _smiles("regression.csv", 30)
        data = MoleculeDataset([MoleculeDatapoint([s], [1.0])
                                for s in smiles])
        cfg = FeaturizationConfig(adding_h=True)
        l_py = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1,
                                  use_native=False)
        l_nat = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1)
        assert l_nat.use_native
        for bp, bn in zip(l_py, l_nat):
            for k in bp.graph_arrays[0]:
                if k == "pallas_aux":
                    continue
                np.testing.assert_allclose(bn.graph_arrays[0][k],
                                           bp.graph_arrays[0][k], atol=1e-5,
                                           err_msg=k)


# --------------------------------------------------------------- reaction


class TestReactionNative:
    """Native reaction featurizer parity (reference featurization.py:644-740
    via features/featurization.py MolGraph._build_reaction)."""

    pytestmark = pytest.mark.skipif(
        not native_ext.reaction_available(),
        reason="native library predates reaction support")

    MODES = ["reac_prod", "reac_diff", "prod_diff",
             "reac_prod_balance", "reac_diff_balance", "prod_diff_balance"]

    @pytest.mark.parametrize("mode", MODES)
    def test_exact_parity(self, mode):
        smiles = _smiles("reaction_regression.csv", 40)
        cfg = FeaturizationConfig(reaction=True, reaction_mode=mode)
        gb_p = mol2graph(smiles, cfg, pad_atoms=4096, pad_bonds=16384,
                         pad_mols=len(smiles))
        gb_n, valid = native_ext.featurize_batch_native(
            smiles, pad_atoms=4096, pad_bonds=16384, pad_mols=len(smiles),
            reaction_mode=mode)
        assert valid.all()
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"{mode} array {k} differs")
        assert gb_n.n_atoms_real == gb_p.n_atoms_real
        assert gb_n.n_bonds_real == gb_p.n_bonds_real

    @pytest.mark.parametrize("keep_h", [False, True])
    def test_keep_h_parity(self, keep_h):
        smiles = ["[CH3:1][OH:2]>>[CH3:1][O-:2]",
                  "[H][C:1]([H])([H])[OH:2]>>[C:1]([H])([H])([H])[O-:2]",
                  "[NH2:1][CH2:2][CH3:3]>>[NH:1]=[CH:2][CH3:3]"]
        cfg = FeaturizationConfig(reaction=True, reaction_mode="reac_diff",
                                  explicit_h=keep_h)
        gb_p = mol2graph(smiles, cfg, pad_atoms=512, pad_bonds=2048,
                         pad_mols=len(smiles))
        gb_n, _ = native_ext.featurize_batch_native(
            smiles, pad_atoms=512, pad_bonds=2048, pad_mols=len(smiles),
            reaction_mode="reac_diff", keep_h=keep_h)
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"array {k} differs")

    @pytest.mark.skipif(
        not getattr(native_ext, "reaction_hydrogens_available",
                    lambda: False)(),
        reason="native library predates reaction add_h support")
    @pytest.mark.parametrize("kh", [False, True])
    def test_add_h_parity(self, kh):
        smiles = _smiles("reaction_regression.csv", 30)
        cfg = FeaturizationConfig(reaction=True, reaction_mode="reac_diff",
                                  explicit_h=kh, adding_h=True)
        gb_p = mol2graph(smiles, cfg, pad_atoms=8192, pad_bonds=65536,
                         pad_mols=len(smiles))
        gb_n, valid = native_ext.featurize_batch_native(
            smiles, pad_atoms=8192, pad_bonds=65536, pad_mols=len(smiles),
            reaction_mode="reac_diff", keep_h=kh, add_h=True)
        assert valid.all()
        for k in ("f_atoms", "f_bonds", "w_atoms", "w_bonds",
                  "b2a", "b2dst", "b2revb", "a2mol"):
            np.testing.assert_allclose(
                np.asarray(getattr(gb_n, k), dtype=float),
                np.asarray(getattr(gb_p, k), dtype=float),
                atol=1e-5, err_msg=f"keep_h={kh} add_h array {k}")
        assert gb_n.n_atoms_real == gb_p.n_atoms_real
        assert gb_n.n_bonds_real == gb_p.n_bonds_real

    def test_invalid_reaction_flagged(self):
        gb, valid = native_ext.featurize_batch_native(
            ["CCO>>CCN", "no_arrows", "xx>>yy"],
            pad_atoms=256, pad_bonds=512, reaction_mode="reac_diff")
        assert valid.tolist() == [1, 0, 0]

    def test_loader_reaction_native_parity(self):
        from polymer_chemprop_tpu.data import (
            MoleculeDataLoader,
            MoleculeDatapoint,
            MoleculeDataset,
        )
        smiles = _smiles("reaction_regression.csv", 30)
        data = MoleculeDataset([MoleculeDatapoint([s], [1.0])
                                for s in smiles])
        cfg = FeaturizationConfig(reaction=True,
                                  reaction_mode="reac_prod_balance")
        l_py = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1,
                                  use_native=False)
        l_nat = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1)
        assert l_nat.use_native
        for bp, bn in zip(l_py, l_nat):
            for k in bp.graph_arrays[0]:
                if k == "pallas_aux":
                    continue
                np.testing.assert_allclose(bn.graph_arrays[0][k],
                                           bp.graph_arrays[0][k], atol=1e-5,
                                           err_msg=k)


# ------------------------------------------------------------ differential fuzz


def _mutate(s, alph, rng):
    t = list(s)
    op = rng.integers(3)
    pos = int(rng.integers(len(t)))
    if op == 0:
        t[pos] = str(rng.choice(alph))
    elif op == 1:
        del t[pos]
    else:
        t.insert(pos, str(rng.choice(alph)))
    return "".join(t)


def test_differential_fuzz_parser_parity():
    """Mutated and random-garbage SMILES through both parsers: validity
    verdicts and (for valid inputs) atom/bond counts must agree, and the
    C++ parser must never crash. Also pins the RDKit-compatible rejection
    of non-ring aromatic atoms (e.g. "CnC", "oO") on BOTH paths."""
    from polymer_chemprop_tpu.chem import parse_smiles

    rng = np.random.default_rng(42)
    base = _smiles("regression.csv", 200)
    alph = list("CNOSPFclnos()[]=#@+-123456789%/\\BrH*")
    corpus = []
    for s in base:
        corpus.append(s)
        for _ in range(3):
            corpus.append(_mutate(s, alph, rng))
    for _ in range(200):
        corpus.append("".join(rng.choice(alph, size=rng.integers(1, 30))))
    corpus += ["CnC", "oO", "sCC", "C=CC=n"]  # non-ring aromatics: invalid

    atoms, bonds = native_ext.count_native(corpus, n_threads=4)
    for i, s in enumerate(corpus):
        m = parse_smiles(s, strict=False)
        assert (m is not None) == (atoms[i] >= 0), \
            f"validity mismatch on {s!r}: py={m is not None}"
        if m is not None:
            assert atoms[i] == m.n_atoms and bonds[i] == 2 * m.n_bonds, \
                f"count mismatch on {s!r}"


@pytest.mark.skipif(not getattr(native_ext, "polymer_available",
                                lambda: False)(),
                    reason="native polymer support not built")
def test_differential_fuzz_polymer_parity():
    """Mutated polymer ensemble strings: validity and counts must agree
    between the native and Python paths."""
    import warnings
    from polymer_chemprop_tpu.features.featurization import MolGraph

    rng = np.random.default_rng(7)
    base = ["[*:1]CC[*:2].[*:3]c1ccc([*:4])cc1|0.5|0.5|"
            "<1-3:0.5:0.5<2-4:0.5:0.5~25",
            "[*:1]CO[*:2]|1.0|<1-2:0.3:0.7~50",
            "[*:1]C(C)C[*:2].[*:3]CC(=O)O[*:4]|0.25|0.75|"
            "<1-3:0.5:0.5<2-4:0.5:0.5"]
    alph = list("CNOcn()[]=#*:|<>~.0123456789-")
    corpus = []
    for s in base:
        corpus.append(s)
        for _ in range(120):
            corpus.append(_mutate(s, alph, rng))
    cfg = FeaturizationConfig(polymer=True)
    a_n, b_n = native_ext.count_native(corpus, polymer=True, n_threads=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for i, s in enumerate(corpus):
            try:
                g = MolGraph(s, cfg)
                py = (g.n_atoms, g.n_bonds)
            except Exception:
                py = None
            nat = (int(a_n[i]), int(b_n[i])) if a_n[i] >= 0 else None
            assert py == nat, f"mismatch on {s!r}: py={py} native={nat}"


@pytest.mark.skipif(not getattr(native_ext, "reaction_available",
                                lambda: False)(),
                    reason="native reaction support not built")
def test_differential_fuzz_reaction_parity():
    """Mutated atom-mapped reaction SMILES: validity and counts must agree.
    Pins the '[O:]' (map colon without digits) syntax-error rule on both
    paths."""
    import warnings
    from polymer_chemprop_tpu.features.featurization import MolGraph

    rng = np.random.default_rng(11)
    base = _smiles("reaction_regression.csv", 60)
    alph = list("CNOHcn()[]=#:>.0123456789+-@")
    corpus = []
    for s in base:
        corpus.append(s)
        for _ in range(6):
            corpus.append(_mutate(s, alph, rng))
    corpus.append("[CH3:1][O:]>>[CH3:1][OH:2]")  # [O:] is a syntax error
    cfg = FeaturizationConfig(reaction=True, reaction_mode="reac_diff")
    a_n, b_n = native_ext.count_native(corpus, reaction_mode="reac_diff",
                                       n_threads=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for i, s in enumerate(corpus):
            try:
                g = MolGraph(s, cfg)
                py = (g.n_atoms, g.n_bonds)
            except Exception:
                py = None
            nat = (int(a_n[i]), int(b_n[i])) if a_n[i] >= 0 else None
            assert py == nat, f"mismatch on {s!r}: py={py} native={nat}"


def test_loader_native_atom_extras_parity():
    """Per-atom extra feature files ride the native path via a vectorized
    post-concat: arrays must match the Python MolGraph extras handling in
    both extend and overwrite modes, and length mismatches must raise."""
    from polymer_chemprop_tpu.chem import parse_smiles
    from polymer_chemprop_tpu.data import (
        MoleculeDataLoader,
        MoleculeDatapoint,
        MoleculeDataset,
    )

    smiles = _smiles("regression.csv", 40)
    rng = np.random.default_rng(3)
    E = 5
    pts = []
    for s in smiles:
        m = parse_smiles(s, strict=False)
        pts.append(MoleculeDatapoint(
            [s], [1.0],
            atom_features=rng.normal(size=(m.n_atoms, E)).astype(
                np.float32)))
    data = MoleculeDataset(pts)
    for ow in (False, True):
        cfg = FeaturizationConfig(overwrite_default_atom_features=ow)
        l_py = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1,
                                  use_native=False)
        l_nat = MoleculeDataLoader(data, cfg, batch_size=10, num_workers=1)
        assert l_nat.use_native and l_nat._native_atom_extras
        for bp, bn in zip(l_py, l_nat):
            for k in bp.graph_arrays[0]:
                if k == "pallas_aux":
                    continue
                np.testing.assert_allclose(
                    bn.graph_arrays[0][k], bp.graph_arrays[0][k],
                    atol=1e-5, err_msg=f"overwrite={ow} {k}")
    bad = MoleculeDataset([MoleculeDatapoint(
        ["CCO"], [1.0], atom_features=np.ones((2, E), np.float32))])
    loader = MoleculeDataLoader(bad, FeaturizationConfig(), batch_size=1,
                                num_workers=1)
    with pytest.raises(ValueError, match="differs from extra atom"):
        list(loader)


@pytest.mark.skipif(not getattr(native_ext, "bond_parse_available",
                                lambda: False)(),
                    reason="native library predates bond parse export")
def test_loader_native_bond_extras_parity():
    """Per-bond extra feature files ride the native path: the C++ packer
    exports each directed bond's parse-order index (the parser's bond.idx,
    matching the reference's bond.GetIdx() alignment) and the loader
    gathers the user rows through it — extend + overwrite modes, combined
    with atom extras, with per-molecule length validation."""
    from polymer_chemprop_tpu.chem import parse_smiles
    from polymer_chemprop_tpu.data import (
        MoleculeDataLoader,
        MoleculeDatapoint,
        MoleculeDataset,
    )

    smiles = _smiles("regression.csv", 40)
    rng = np.random.default_rng(5)
    Ea, Eb = 3, 4
    for use_atom in (False, True):
        for ow_b in (False, True):
            pts = []
            for s in smiles:
                m = parse_smiles(s, strict=False)
                pts.append(MoleculeDatapoint(
                    [s], [1.0],
                    atom_features=(rng.normal(size=(m.n_atoms, Ea)).astype(
                        np.float32) if use_atom else None),
                    bond_features=rng.normal(size=(m.n_bonds, Eb)).astype(
                        np.float32)))
            data = MoleculeDataset(pts)
            cfg = FeaturizationConfig(overwrite_default_bond_features=ow_b)
            l_py = MoleculeDataLoader(data, cfg, batch_size=10,
                                      num_workers=1, use_native=False)
            l_nat = MoleculeDataLoader(data, cfg, batch_size=10,
                                       num_workers=1)
            assert l_nat.use_native and l_nat._native_bond_extras
            for bp, bn in zip(l_py, l_nat):
                for k in bp.graph_arrays[0]:
                    if k == "pallas_aux":
                        continue
                    np.testing.assert_allclose(
                        bn.graph_arrays[0][k], bp.graph_arrays[0][k],
                        atol=1e-5,
                        err_msg=f"atom={use_atom} ow={ow_b} {k}")
    bad = MoleculeDataset([MoleculeDatapoint(
        ["CCO"], [1.0], bond_features=np.ones((5, Eb), np.float32))])
    loader = MoleculeDataLoader(bad, FeaturizationConfig(), batch_size=1,
                                num_workers=1)
    with pytest.raises(ValueError, match="differs from extra bond"):
        list(loader)


@pytest.mark.skipif(not getattr(native_ext, "rdkit2d_available",
                                lambda: False)(),
                    reason="native rdkit_2d engine not built")
class TestRdkit2dNative:
    """The C++ 200-descriptor rdkit_2d engine (native/src/
    pcp_descriptors.inc) must be BIT-IDENTICAL to the Python oracle
    (chem/descriptors/) on every fixture molecule — same algorithms,
    same floating-point operation order (incl. CPython's Neumaier
    sum()). Ipc alone is tolerance-compared: numpy's characteristic
    polynomial rides LAPACK eigenvalues, the port Jacobi rotations."""

    def _compare(self, smis):
        import warnings

        import numpy as np

        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.chem.descriptors import (
            RDKIT2D_NAMES,
            rdkit2d_raw,
        )
        warnings.filterwarnings("ignore")
        vals, ok = native_ext.rdkit2d_batch_native(smis, n_threads=2)
        assert ok.all()
        py = np.array([rdkit2d_raw(parse_smiles(s)) for s in smis])
        ipc = RDKIT2D_NAMES.index("Ipc")
        mism = []
        for k in range(200):
            if k == ipc:
                rel = (np.abs(py[:, k] - vals[:, k])
                       / np.maximum(np.abs(py[:, k]), 1e-12))
                assert rel.max() < 1e-6, ("Ipc", rel.max())
                continue
            if not np.array_equal(py[:, k], vals[:, k]):
                mism.append((RDKIT2D_NAMES[k],
                             int((py[:, k] != vals[:, k]).sum())))
        assert not mism, mism

    def test_bit_identical_regression(self):
        self._compare(_smiles("regression.csv", 120))

    def test_bit_identical_classification(self):
        self._compare(_smiles("classification.csv", 120))

    def test_bit_identical_on_rewritten_smiles(self):
        """The engine's own parser sees write_smiles output (different
        ring-digit/bracket placements); C++/Python equality must hold
        there too."""
        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.chem.write import write_smiles
        smis = _smiles("regression.csv") + _smiles("classification.csv")
        rewritten = []
        for smi in smis[::20]:
            m = parse_smiles(smi, strict=False)
            if m is not None:
                rewritten.append(write_smiles(m))
        assert len(rewritten) >= 45
        self._compare(rewritten)

    def test_parse_failure_flagged(self):
        vals, ok = native_ext.rdkit2d_batch_native(
            ["CCO", "not_a_smiles((", "c1ccccc1"])
        assert list(ok) == [True, False, True]
        assert (vals[1] == 0).all()

    def test_generator_uses_native(self):
        """The rdkit_2d generators ride the native engine for string
        input and stay identical to the Python engine."""
        import warnings

        import numpy as np

        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.chem.descriptors import rdkit2d_raw
        from polymer_chemprop_tpu.features.generators import (
            get_features_generator,
        )
        warnings.filterwarnings("ignore")
        g = get_features_generator("rdkit_2d")
        gn = get_features_generator("rdkit_2d_normalized")
        for s in _smiles("regression.csv", 5):
            ref = rdkit2d_raw(parse_smiles(s))
            got = g(s)
            mask = np.arange(200) != 33  # Ipc column
            assert np.array_equal(ref[mask], got[mask])
            assert np.isfinite(gn(s)).all()

    def test_throughput(self):
        """The port must beat the Python engine by a wide margin (the
        r3 verdict's floor is 2k mol/s on 4 threads of a full machine;
        this smoke asserts a conservative 300 mol/s so CI boxes pass)."""
        import time
        smis = _smiles("regression.csv", 200)
        t0 = time.time()
        _vals, ok = native_ext.rdkit2d_batch_native(smis, n_threads=4)
        dt = time.time() - t0
        assert ok.all()
        assert len(smis) / dt > 300, f"{len(smis) / dt:.0f} mol/s"
