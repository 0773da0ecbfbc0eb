"""Parity tests of the JAX segment-sum encoder against an independent
dense-gather numpy implementation of the reference equations
(reference mpn.py:93-171), plus invariance properties the TPU layout must
guarantee (padding insensitivity, batch-composition independence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polymer_chemprop_tpu.features import FeaturizationConfig, mol2graph
from polymer_chemprop_tpu.models import (
    EncoderConfig,
    ModelConfig,
    apply_encoder,
    apply_model,
    init_encoder,
    init_model,
    postprocess_preds,
)

SMILES = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)", "C",
          "CCOc1ccc2nc(S(N)(=O)=O)sc2c1"]


def reference_forward(params, b, depth, aggregation="mean", agg_norm=100.0):
    """Dense-gather implementation of reference mpn.py:93-171 (relu, no
    dropout), used as the correctness oracle."""
    fa, fb = b.f_atoms, b.f_bonds
    wa, wb = b.w_atoms, b.w_bonds
    A = fa.shape[0]
    a2b = [[] for _ in range(A)]
    for bi in range(1, b.n_bonds_real):
        a2b[b.b2dst[bi]].append(bi)
    p = jax.tree_util.tree_map(np.asarray, params)
    Wi, Wh, Wo, bo = p["W_i"]["w"], p["W_h"]["w"], p["W_o"]["w"], p["W_o"]["b"]
    inp = fa @ 0 if False else fb @ Wi
    msg = np.maximum(inp, 0)
    for _ in range(depth - 1):
        a_msg = np.zeros((A, msg.shape[1]), np.float64)
        for a in range(A):
            for bi in a2b[a]:
                a_msg[a] += wb[bi] * msg[bi]
        new = a_msg[b.b2a] - msg[b.b2revb]
        msg = np.maximum(inp + new @ Wh, 0)
    a_msg = np.zeros((A, msg.shape[1]), np.float64)
    for a in range(A):
        for bi in a2b[a]:
            a_msg[a] += wb[bi] * msg[bi]
    ah = np.maximum(np.concatenate([fa, a_msg], 1) @ Wo + bo, 0)
    M = b.n_mols
    mv = np.zeros((M, ah.shape[1]))
    den = np.zeros(M)
    for a in range(A):
        mv[b.a2mol[a]] += wa[a] * ah[a]
        den[b.a2mol[a]] += wa[a]
    if aggregation == "mean":
        out = np.where(den[:, None] > 0, mv / np.maximum(den, 1e-12)[:, None], 0.0)
    elif aggregation == "sum":
        out = mv
    else:
        out = mv / agg_norm
    return out * b.degree_of_polym[:, None]


@pytest.fixture(scope="module")
def cfg():
    return EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=3)


@pytest.fixture(scope="module")
def params(cfg):
    return init_encoder(jax.random.PRNGKey(0), cfg)


def run_jax(params, b, cfg):
    arrs = {k: jnp.asarray(v) for k, v in b.arrays().items()}
    return np.asarray(apply_encoder(params, arrs, cfg))


class TestReferenceParity:
    def test_standard_molecules(self, cfg, params):
        b = mol2graph(SMILES)
        got = run_jax(params, b, cfg)
        want = reference_forward(params, b, cfg.depth)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_polymer_weighted_edges(self, cfg, params):
        poly = ["[*:1]CC[*:2]|1.0|<1-2:0.3:0.7~50",
                "[*:1]c1ccc([*:2])cc1|1.0|<1-2:0.5:0.5",
                "[*:1]C[*:2].[*:3]O[*:4]|0.4|0.6|<1-3:0.5:0.5<2-4:0.5:0.5"]
        b = mol2graph(poly, FeaturizationConfig(polymer=True))
        got = run_jax(params, b, cfg)
        want = reference_forward(params, b, cfg.depth)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("agg", ["sum", "norm"])
    def test_aggregations(self, params, agg):
        c = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                          depth=3, aggregation=agg)
        b = mol2graph(SMILES[:3])
        got = run_jax(params, b, c)
        want = reference_forward(params, b, 3, aggregation=agg)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_depth_variants(self, params):
        for depth in (1, 2, 5):
            c = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                              depth=depth)
            b = mol2graph(SMILES[:3])
            np.testing.assert_allclose(
                run_jax(params, b, c), reference_forward(params, b, depth),
                rtol=2e-4, atol=1e-5)


class TestInvariances:
    def test_padding_insensitive(self, cfg, params):
        """Embeddings must not depend on the padding envelope."""
        small = mol2graph(SMILES[:2], pad_atoms=32, pad_bonds=40, pad_mols=2)
        big = mol2graph(SMILES[:2], pad_atoms=256, pad_bonds=512, pad_mols=8)
        a = run_jax(params, small, cfg)
        c = run_jax(params, big, cfg)[:2]
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)

    def test_batch_composition_independent(self, cfg, params):
        """A molecule's embedding must not depend on its batch neighbours."""
        alone = run_jax(params, mol2graph([SMILES[1]]), cfg)[0]
        grouped = run_jax(params, mol2graph(SMILES), cfg)[1]
        np.testing.assert_allclose(alone, grouped, rtol=1e-5, atol=1e-6)

    def test_empty_like_mol_zero_vector(self, cfg, params):
        """Padded (maskless) molecule rows read as zero vectors
        (reference cached_zero_vector, mpn.py:148-149)."""
        b = mol2graph(SMILES[:1], pad_mols=3)
        out = run_jax(params, b, cfg)
        assert np.abs(out[1:]).max() == 0


class TestFullModel:
    def test_shapes_and_postprocess(self):
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=2)
        cfg = ModelConfig(encoder=enc, dataset_type="classification",
                          num_tasks=3, ffn_num_layers=2, ffn_hidden_size=16)
        params = init_model(jax.random.PRNGKey(1), cfg)
        b = mol2graph(SMILES[:4])
        arrs = {k: jnp.asarray(v) for k, v in b.arrays().items()}
        preds = apply_model(params, [arrs], cfg)
        assert preds.shape == (4, 3)
        post = postprocess_preds(preds, cfg)
        assert ((np.asarray(post) >= 0) & (np.asarray(post) <= 1)).all()

    def test_multiclass_softmax(self):
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=2)
        cfg = ModelConfig(encoder=enc, dataset_type="multiclass", num_tasks=2,
                          multiclass_num_classes=3, ffn_hidden_size=16)
        params = init_model(jax.random.PRNGKey(1), cfg)
        b = mol2graph(SMILES[:2])
        arrs = {k: jnp.asarray(v) for k, v in b.arrays().items()}
        preds = apply_model(params, [arrs], cfg)
        assert preds.shape == (2, 6)
        post = postprocess_preds(preds, cfg)
        assert post.shape == (2, 2, 3)
        np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, rtol=1e-5)

    def test_dropout_deterministic_at_eval(self):
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                            depth=2, dropout=0.5)
        cfg = ModelConfig(encoder=enc, ffn_hidden_size=16)
        params = init_model(jax.random.PRNGKey(1), cfg)
        b = mol2graph(SMILES[:2])
        arrs = {k: jnp.asarray(v) for k, v in b.arrays().items()}
        p1 = apply_model(params, [arrs], cfg, deterministic=True)
        p2 = apply_model(params, [arrs], cfg, deterministic=True)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        k = jax.random.PRNGKey(2)
        p3 = apply_model(params, [arrs], cfg, dropout_key=k, deterministic=False)
        assert np.abs(np.asarray(p3) - np.asarray(p1)).max() > 1e-6
