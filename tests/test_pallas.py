"""Correctness tests for the Pallas band kernel against the XLA segment-sum
oracle (interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polymer_chemprop_tpu.features import mol2graph
from polymer_chemprop_tpu.ops.pallas_mpnn import (
    EXT,
    TILE_B,
    bond_message_step_pallas,
    build_sorted_aux,
    permute_rows,
)
from polymer_chemprop_tpu.ops.segment import bond_message_step


@pytest.fixture(scope="module")
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture(scope="module")
def batch():
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)", "C",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1",
              "OCC3OC(OCC2OC(OC(C#N)c1ccccc1)C(O)C(O)C2O)C(O)C(O)C3O"] * 8
    return mol2graph(smiles, pad_atoms=1024, pad_bonds=2048, pad_mols=len(smiles))


@pytest.fixture(scope="module")
def batch_small():
    """Minimum-envelope batch (one 256-tile window, 512 padded bonds)
    for parametrized sweeps where interpret-mode cost scales with the
    envelope — same structural coverage (rings, branches, heteroatoms,
    padding runs) at a quarter of the interpret work."""
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)", "C",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1",
              "OCC3OC(OCC2OC(OC(C#N)c1ccccc1)C(O)C(O)C2O)C(O)C(O)C3O"]
    return mol2graph(smiles, pad_atoms=256, pad_bonds=512,
                     pad_mols=len(smiles))


def _aux_arrays(gb):
    aux = build_sorted_aux(gb.b2dst, gb.b2revb, gb.w_bonds,
                           num_atoms=gb.f_atoms.shape[0])
    return {k: jnp.asarray(getattr(aux, k)) for k in aux._fields
            if getattr(aux, k) is not None}


class TestPermuteRows:
    def test_roundtrip_and_grad(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                        dtype=jnp.float32)
        idx = jnp.asarray(np.random.default_rng(1).permutation(16))
        inv = jnp.argsort(idx)
        y = permute_rows(x, idx, inv)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[idx])
        # VJP of a permutation is the inverse permutation
        f = lambda x_: (permute_rows(x_, idx, inv) * 2.0).sum()
        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), 2.0)


class TestBandKernel:
    def test_forward_matches_oracle(self, interpret_mode, batch):
        gb = batch
        H = 32
        rng = np.random.default_rng(0)
        msg = jnp.asarray(rng.normal(size=(gb.f_bonds.shape[0], H)),
                          dtype=jnp.float32)
        aux = _aux_arrays(gb)
        got = bond_message_step_pallas(msg, aux)
        want = bond_message_step(msg, jnp.asarray(gb.w_bonds),
                                 jnp.asarray(gb.b2a), jnp.asarray(gb.b2dst),
                                 jnp.asarray(gb.b2revb),
                                 gb.f_atoms.shape[0])
        # compare only real bonds: padding slots have rev=0 semantics that
        # differ harmlessly between layouts
        real = slice(1, gb.n_bonds_real)
        np.testing.assert_allclose(np.asarray(got)[real], np.asarray(want)[real],
                                   rtol=1e-4, atol=1e-4)

    def test_gradient_matches_oracle(self, interpret_mode, batch):
        gb = batch
        H = 16
        rng = np.random.default_rng(1)
        msg = jnp.asarray(rng.normal(size=(gb.f_bonds.shape[0], H)),
                          dtype=jnp.float32)
        aux = _aux_arrays(gb)
        real = np.zeros(gb.f_bonds.shape[0], np.float32)
        real[1:gb.n_bonds_real] = 1.0
        mask = jnp.asarray(real)[:, None]
        cot = jnp.asarray(rng.normal(size=(gb.f_bonds.shape[0], H)),
                          dtype=jnp.float32) * mask

        def f_pallas(m):
            return (bond_message_step_pallas(m, aux) * cot).sum()

        w_b = jnp.asarray(gb.w_bonds)
        b2a = jnp.asarray(gb.b2a)
        b2dst = jnp.asarray(gb.b2dst)
        b2revb = jnp.asarray(gb.b2revb)

        def f_oracle(m):
            return (bond_message_step(m, w_b, b2a, b2dst, b2revb,
                                      gb.f_atoms.shape[0]) * cot).sum()

        g1 = jax.grad(f_pallas)(msg)
        g2 = jax.grad(f_oracle)(msg)
        np.testing.assert_allclose(np.asarray(g1)[1:gb.n_bonds_real],
                                   np.asarray(g2)[1:gb.n_bonds_real],
                                   rtol=1e-3, atol=1e-4)

    def test_window_invariant(self, batch):
        """Every real bond's same-destination peers must fit its tile's
        window (padding bonds, dst 0, are sorted last and unconsumed)."""
        gb = batch
        aux = build_sorted_aux(gb.b2dst, gb.b2revb, gb.w_bonds)
        B = gb.f_bonds.shape[0]
        for j in range(B // TILE_B):
            tile = slice(j * TILE_B, (j + 1) * TILE_B)
            dsts = {d for d in aux.dst_sorted[tile].tolist() if d > 0}
            if not dsts:
                continue
            peers = np.nonzero(np.isin(aux.dst_sorted, list(dsts)))[0]
            assert peers.min() >= aux.rs[j]
            assert peers.max() < aux.rs[j] + EXT, \
                f"window overflow in tile {j}"

    @pytest.mark.parametrize("tile_b,ext", [(512, 768), (1024, 1280)])
    def test_large_tile_window_invariant(self, batch, tile_b, ext):
        """Non-default tile sizes (512/768 and 1024/1280 windows): same
        coverage invariant as the 256/512 default."""
        gb = batch
        aux = build_sorted_aux(gb.b2dst, gb.b2revb, gb.w_bonds,
                               tile_b=tile_b)
        B = gb.f_bonds.shape[0]
        assert len(aux.rs) == B // tile_b
        for j in range(B // tile_b):
            tile = slice(j * tile_b, (j + 1) * tile_b)
            dsts = {d for d in aux.dst_sorted[tile].tolist() if d > 0}
            if not dsts:
                continue
            peers = np.nonzero(np.isin(aux.dst_sorted, list(dsts)))[0]
            assert peers.min() >= aux.rs[j]
            assert peers.max() < aux.rs[j] + ext, \
                f"window overflow in tile {j}"

    @pytest.mark.parametrize("tile_b", [512, 1024])
    def test_encoder_large_tile_matches_xla(self, interpret_mode, batch,
                                            tile_b):
        """Full encoder with non-default band tiles (512/1024) must match
        the XLA path (forward + gradients), like the 256-tile default
        (covered by every other test in this file)."""
        from polymer_chemprop_tpu.models import EncoderConfig, apply_encoder, init_encoder
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=24,
                            depth=3)
        params = init_encoder(jax.random.PRNGKey(2), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(
            jnp.asarray, gb.arrays(pallas=True, band_tile=tile_b))
        # the rev-fused path must be active at non-default tiles too
        assert "rs_rev" in a_p["pallas_aux"]
        out_x = np.asarray(apply_encoder(params, a_x, cfg))
        out_p = np.asarray(apply_encoder(params, a_p, cfg))
        np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)

        g_x = jax.grad(lambda p: (apply_encoder(p, a_x, cfg) ** 2).sum())(
            params)
        g_p = jax.grad(lambda p: (apply_encoder(p, a_p, cfg) ** 2).sum())(
            params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)


class TestSortedResidentEncoder:
    def test_encoder_matches_xla_path(self, interpret_mode, batch):
        """Full encoder through the sorted-resident Pallas branch must match
        the XLA segment-sum branch (forward + gradients)."""
        from polymer_chemprop_tpu.models import EncoderConfig, apply_encoder, init_encoder
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=24,
                            depth=3)
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        out_x = np.asarray(apply_encoder(params, a_x, cfg))
        out_p = np.asarray(apply_encoder(params, a_p, cfg))
        np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)

        def loss_x(p):
            return (apply_encoder(p, a_x, cfg) ** 2).sum()

        def loss_p(p):
            return (apply_encoder(p, a_p, cfg) ** 2).sum()

        g_x = jax.grad(loss_x)(params)
        g_p = jax.grad(loss_p)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("act", ["relu", "leakyrelu", "prelu", "tanh",
                                     "elu", "selu"])
    def test_act_fused_epilogue_all_activations(self, interpret_mode,
                                                batch_small, act):
        """The fused act(inputs + z@W_h) epilogue and its
        derivative-from-output backward must match the XLA path for every
        supported activation (minimum-envelope batch: the per-activation
        delta is the epilogue alone; the full-size envelope is covered
        by the relu-path encoder tests)."""
        from polymer_chemprop_tpu.models import EncoderConfig, apply_encoder, init_encoder
        gb = batch_small
        # relu (the default act, covered at depth 3 throughout the file)
        # keeps the full depth; the other activations differ only in the
        # per-layer epilogue, which one band layer exercises fwd+bwd
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                            depth=3 if act == "relu" else 2,
                            activation=act)
        params = init_encoder(jax.random.PRNGKey(3), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        np.testing.assert_allclose(
            np.asarray(apply_encoder(params, a_p, cfg)),
            np.asarray(apply_encoder(params, a_x, cfg)),
            rtol=1e-4, atol=1e-5)
        g_x = jax.grad(lambda p: (apply_encoder(p, a_x, cfg) ** 2).sum())(
            params)
        g_p = jax.grad(lambda p: (apply_encoder(p, a_p, cfg) ** 2).sum())(
            params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)

    def test_undirected_mode(self, interpret_mode, batch):
        from polymer_chemprop_tpu.models import EncoderConfig, apply_encoder, init_encoder
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                            depth=3, undirected=True)
        params = init_encoder(jax.random.PRNGKey(1), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        np.testing.assert_allclose(
            np.asarray(apply_encoder(params, a_p, cfg)),
            np.asarray(apply_encoder(params, a_x, cfg)),
            rtol=1e-4, atol=1e-5)


class TestFusedBandMatmul:
    def test_fused_matches_separate(self, interpret_mode, batch):
        """band+W_h fused kernel == band kernel followed by matmul, forward
        and gradients (message and W_h)."""
        from polymer_chemprop_tpu.ops.pallas_mpnn import (
            band_matmul_step_sorted,
            band_message_step_sorted,
            build_sorted_aux,
        )
        gb = batch
        aux = _aux_arrays(gb)
        B = gb.f_bonds.shape[0]
        H = 24
        rng = np.random.default_rng(3)
        msg = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
        msg = msg.at[:, H:].set(0.0)  # lane padding region is zero
        wh = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32))

        fused = band_matmul_step_sorted(msg, wh, aux)[:, :H]
        sep = band_message_step_sorted(msg, aux)[:, :H] @ wh
        real = slice(1, gb.n_bonds_real)
        # compare in sorted space: both outputs are sorted-resident
        np.testing.assert_allclose(np.asarray(fused), np.asarray(sep),
                                   rtol=1e-4, atol=1e-4)

        def loss_f(m, w):
            return (band_matmul_step_sorted(m, w, aux)[:, :H] ** 2).sum()

        def loss_s(m, w):
            return ((band_message_step_sorted(m, aux)[:, :H] @ w) ** 2).sum()

        gm_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(msg, wh)
        gm_s, gw_s = jax.grad(loss_s, argnums=(0, 1))(msg, wh)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_s),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_s),
                                   rtol=1e-3, atol=1e-3)

    def test_encoder_fused_path_matches_xla(self, interpret_mode, batch):
        from polymer_chemprop_tpu.models import EncoderConfig, apply_encoder, init_encoder
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=24,
                            depth=3)  # bias=False -> fused path active
        params = init_encoder(jax.random.PRNGKey(5), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        np.testing.assert_allclose(
            np.asarray(apply_encoder(params, a_p, cfg)),
            np.asarray(apply_encoder(params, a_x, cfg)),
            rtol=1e-4, atol=1e-5)
        g_x = jax.grad(lambda p: (apply_encoder(p, a_x, cfg) ** 2).sum())(params)
        g_p = jax.grad(lambda p: (apply_encoder(p, a_p, cfg) ** 2).sum())(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)


class TestBandPrecision:
    @pytest.mark.parametrize("prec", ["default"])
    def test_reduced_precision_plumbing(self, interpret_mode, batch, prec):
        """band_precision threads through to the kernels; in interpret mode
        all precisions are exact f32, so reduced modes must match the
        HIGHEST output bit-for-bit. On hardware 'default' (1-pass bf16) is
        the fast experimental mode; Mosaic lowers only DEFAULT|HIGHEST."""
        from polymer_chemprop_tpu.ops.pallas_mpnn import (
            band_matmul_step_sorted,
            band_message_step_sorted,
        )
        p = {"default": jax.lax.Precision.DEFAULT}[prec]
        gb = batch
        aux = _aux_arrays(gb)
        B = gb.f_bonds.shape[0]
        H = 24
        rng = np.random.default_rng(7)
        msg = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
        msg = msg.at[:, H:].set(0.0)
        wh = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32))

        base = band_message_step_sorted(msg, aux)
        red = band_message_step_sorted(msg, aux, p)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(red))
        base_f = band_matmul_step_sorted(msg, wh, aux)
        red_f = band_matmul_step_sorted(msg, wh, aux, p)
        np.testing.assert_array_equal(np.asarray(base_f), np.asarray(red_f))

    def test_encoder_config_precision(self, interpret_mode, batch):
        from polymer_chemprop_tpu.models import (
            EncoderConfig,
            apply_encoder,
            init_encoder,
        )
        gb = batch
        cfg = EncoderConfig(atom_fdim=gb.f_atoms.shape[1],
                            bond_fdim=gb.f_bonds.shape[1],
                            hidden_size=32, depth=3,
                            band_precision="default")
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        p_x = dict(gb.arrays(pallas=True))
        out = apply_encoder(params, p_x, cfg)
        assert np.isfinite(np.asarray(out)).all()


class TestAtomBandReadout:
    """The banded MXU atom readout (ops/pallas_mpnn._atom_band_kernel) vs
    the XLA segment-sum fallback (same function without 'ra')."""

    def test_kernel_matches_segment_sum(self, interpret_mode, batch):
        from polymer_chemprop_tpu.ops.pallas_mpnn import atom_readout_sorted
        gb = batch
        aux = _aux_arrays(gb)
        assert "ra" in aux, "fixture envelope must enable the readout kernel"
        A = gb.f_atoms.shape[0]
        B = gb.f_bonds.shape[0]
        rng = np.random.default_rng(3)
        msg = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
        aux_fallback = {k: v for k, v in aux.items() if k != "ra"}
        out_k = atom_readout_sorted(msg, aux, A, 100)
        out_s = atom_readout_sorted(msg, aux_fallback, A, 100)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_s),
                                   rtol=1e-4, atol=1e-5)

        def loss_k(m):
            return (atom_readout_sorted(m, aux, A, 100) ** 2).sum()

        def loss_s(m):
            return (atom_readout_sorted(m, aux_fallback, A, 100) ** 2).sum()

        g_k = jax.grad(loss_k)(msg)
        g_s = jax.grad(loss_s)(msg)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_ra_omitted_when_bound_violated(self):
        """Batches whose atom envelope is not a TILE_A multiple (or whose
        bond windows exceed EXT_A) must publish no 'ra' and fall back."""
        from polymer_chemprop_tpu.ops.pallas_mpnn import build_sorted_aux
        gb = mol2graph(["CCO", "c1ccccc1"], pad_atoms=64, pad_bonds=1024,
                       pad_mols=2)
        aux = build_sorted_aux(gb.b2dst, gb.b2revb, gb.w_bonds,
                               num_atoms=gb.f_atoms.shape[0])
        assert aux.ra is None
        d = gb.arrays(pallas=True)
        assert "ra" not in d["pallas_aux"]


class TestRevFusedBand:
    """The rev-fused layer kernel (reverse-bond selection folded into the
    band matrix; zero permutation gathers) vs the srev-gather fused path."""

    def _msgs(self, gb, seed=0, H=300, Hp=384):
        B = gb.f_bonds.shape[0]
        rng = np.random.default_rng(seed)
        msg = jnp.asarray(rng.normal(size=(B, Hp)).astype(np.float32))
        msg = msg.at[:, H:].set(0.0)
        wh = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
        inp = jnp.asarray(rng.normal(size=(B, Hp)).astype(np.float32))
        inp = inp.at[:, H:].set(0.0)
        real = np.zeros(B, np.float32)
        real[1:gb.n_bonds_real] = 1.0
        cot = jnp.asarray(
            rng.normal(size=(B, Hp)).astype(np.float32)) * jnp.asarray(
                real)[:, None]
        return msg, wh, inp, cot

    @pytest.mark.parametrize("weighted", [False, True])
    def test_layer_matches_gather_path(self, interpret_mode, batch,
                                       weighted):
        from polymer_chemprop_tpu.ops.pallas_mpnn import (
            band_matmul_act_step_sorted,
            band_rev_layer_step_sorted,
        )
        gb = batch
        w_bonds = gb.w_bonds
        if weighted:
            rng = np.random.default_rng(7)
            w_bonds = np.where(
                w_bonds > 0,
                rng.uniform(0.25, 1.0, w_bonds.shape).astype(np.float32),
                0.0)
        aux_t = build_sorted_aux(gb.b2dst, gb.b2revb, w_bonds,
                                 num_atoms=gb.f_atoms.shape[0])
        assert aux_t.rs_rev is not None
        aux = {k: jnp.asarray(getattr(aux_t, k)) for k in aux_t._fields
               if getattr(aux_t, k) is not None}
        msg, wh, inp, cot = self._msgs(gb)
        inp_srev = permute_rows(inp, aux["srev"], aux["srev"])
        prec = jax.lax.Precision.HIGHEST
        w_exact = not weighted

        o_old = band_matmul_act_step_sorted(msg, wh, inp_srev, aux, "relu",
                                            prec, w_exact)
        o_new = band_rev_layer_step_sorted(msg, wh, inp, aux, "relu",
                                           prec, w_exact)
        np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_old),
                                   rtol=1e-4, atol=1e-4)

        # gradients are compared through tanh: with relu, pre-activations
        # that land within f32 summation-order noise of 0 flip act' between
        # the two (both-correct) accumulation orders, which is a property
        # of relu at 0, not of the kernels (both match a dense f64 oracle)
        def f_old(m, w):
            return (band_matmul_act_step_sorted(m, w, inp_srev, aux, "tanh",
                                                prec, w_exact) * cot).sum()

        def f_new(m, w):
            return (band_rev_layer_step_sorted(m, w, inp, aux, "tanh",
                                               prec, w_exact) * cot).sum()

        g_old = jax.grad(f_old, argnums=(0, 1))(msg, wh)
        g_new = jax.grad(f_new, argnums=(0, 1))(msg, wh)
        np.testing.assert_allclose(np.asarray(g_new[0]),
                                   np.asarray(g_old[0]),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_new[1]),
                                   np.asarray(g_old[1]),
                                   rtol=1e-3, atol=1e-4)

    def test_rs_rev_window_invariant(self, batch):
        """Every real bond's rev-fused window must cover its same-src dst
        run (fwd + srev) and all bonds whose src equals its dst (bwd)."""
        gb = batch
        aux = build_sorted_aux(gb.b2dst, gb.b2revb, gb.w_bonds,
                               num_atoms=gb.f_atoms.shape[0])
        assert aux.rs_rev is not None
        B = gb.f_bonds.shape[0]
        dst, src, srev = aux.dst_sorted, aux.src_sorted, aux.srev
        for j in range(B // TILE_B):
            lo, hi = int(aux.rs_rev[j]), int(aux.rs_rev[j]) + EXT
            for t in range(j * TILE_B, (j + 1) * TILE_B):
                if dst[t] <= 0:
                    continue
                assert lo <= srev[t] < hi
                # fwd: the dst run of atom src(t)
                peers = np.nonzero(dst == src[t])[0]
                assert peers.min() >= lo and peers.max() < hi
                # bwd: all bonds with src == dst(t)
                rev_peers = np.nonzero(src == dst[t])[0]
                assert rev_peers.min() >= lo and rev_peers.max() < hi

    def test_rs_rev_omitted_on_span_overflow(self):
        """A reverse pairing whose molecule span exceeds the window must
        disable the rev-fused path (rs_rev None), keeping rs valid."""
        B = 2048
        b2dst = np.arange(B, dtype=np.int32)   # every bond its own dst run
        b2revb = np.zeros(B, np.int32)
        n_real = 2000
        half = n_real // 2
        for b in range(1, half + 1):           # pairs (b, b+half): span>EXT
            b2revb[b] = b + half
            b2revb[b + half] = b
        w = np.ones(B, np.float32)
        aux = build_sorted_aux(b2dst, b2revb, w)
        assert aux.rs_rev is None
        assert aux.rs is not None

    def test_encoder_without_rs_rev_matches_xla(self, interpret_mode,
                                                batch):
        """The srev-gather fused path (used when rs_rev is absent) must
        stay correct — it is the fallback for span-overflow batches."""
        from polymer_chemprop_tpu.models import (
            EncoderConfig,
            apply_encoder,
            init_encoder,
        )
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=24,
                            depth=3)
        params = init_encoder(jax.random.PRNGKey(11), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        a_p["pallas_aux"] = {k: v for k, v in a_p["pallas_aux"].items()
                             if k not in ("rs_rev",)}
        np.testing.assert_allclose(
            np.asarray(apply_encoder(params, a_p, cfg)),
            np.asarray(apply_encoder(params, a_x, cfg)),
            rtol=1e-4, atol=1e-5)
        g_x = jax.grad(lambda p: (apply_encoder(p, a_x, cfg) ** 2).sum())(
            params)
        g_p = jax.grad(lambda p: (apply_encoder(p, a_p, cfg) ** 2).sum())(
            params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)


class TestVmemGuard:
    """band_paths_for pins the empirically probed Mosaic scoped-VMEM
    limits: large hidden sizes must degrade fused -> XLA instead of
    failing compilation (hyperopt samples hidden up to 2400)."""

    def test_tier_boundaries(self):
        from polymer_chemprop_tpu.ops.pallas_mpnn import band_paths_for
        B, nblocks = 28672, 56  # tile 512
        assert band_paths_for(B, nblocks, 384) == (True, True)
        assert band_paths_for(B, nblocks, 896) == (True, True)
        assert band_paths_for(B, nblocks, 1024) == (False, False)
        # tile 1024: conservative (only the measured hp=384 point fused)
        assert band_paths_for(28672, 28, 384) == (True, True)
        assert band_paths_for(28672, 28, 640) == (False, False)

    def test_encoder_runs_chunked_band_for_large_hidden(self, interpret_mode,
                                                        batch):
        """A pallas batch with an oversized hidden stays on the band path,
        COLUMN-CHUNKED into VMEM-sized kernel invocations (the fused
        epilogue degrades to separate matmuls), and matches the XLA
        result. Measured on chip: 1.4x/1.6x over the XLA fallback at
        hidden 1152/2432 (full train step)."""
        from polymer_chemprop_tpu.models import (
            EncoderConfig,
            apply_encoder,
            init_encoder,
        )
        gb = batch
        cfg = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=1000,
                            depth=2)
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        jaxpr = str(jax.make_jaxpr(
            lambda p, b: apply_encoder(p, b, cfg))(params, a_p))
        assert "pallas_call" in jaxpr
        np.testing.assert_allclose(
            np.asarray(apply_encoder(params, a_p, cfg)),
            np.asarray(apply_encoder(params, a_x, cfg)),
            rtol=1e-4, atol=1e-5)


class TestAtomMessagesPallas:
    """atom_messages mode through the banded atom-adjacency ops
    (atom_neighbor_sum_sorted / src_readout_sorted) must match the natural
    XLA segment-sum path, forward and gradients."""

    def _cfg(self):
        from polymer_chemprop_tpu.models import EncoderConfig
        return EncoderConfig(atom_fdim=133, bond_fdim=14, hidden_size=24,
                             depth=3, atom_messages=True)

    def test_forward_and_grad_match_xla(self, interpret_mode, batch):
        from polymer_chemprop_tpu.models import apply_encoder, init_encoder
        gb = batch
        cfg = self._cfg()
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        a_x = {k: jnp.asarray(v) for k, v in gb.arrays().items()}
        a_p = jax.tree_util.tree_map(jnp.asarray, gb.arrays(pallas=True))
        out_x = np.asarray(apply_encoder(params, a_x, cfg))
        out_p = np.asarray(apply_encoder(params, a_p, cfg))
        np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)

        def loss_x(p):
            return (apply_encoder(p, a_x, cfg) ** 2).sum()

        def loss_p(p):
            return (apply_encoder(p, a_p, cfg) ** 2).sum()

        g_x = jax.grad(loss_x)(params)
        g_p = jax.grad(loss_p)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)

    def test_neighbor_sum_self_adjoint(self, interpret_mode, batch):
        """<Av, w> == <v, Aw> — the custom VJP relies on self-adjointness
        of the undirected-adjacency operator."""
        from polymer_chemprop_tpu.ops.pallas_mpnn import (
            atom_neighbor_sum_sorted,
        )
        gb = batch
        aux = _aux_arrays(gb)
        A = gb.f_atoms.shape[0]
        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.normal(size=(A, 128)), dtype=jnp.float32)
        w = jnp.asarray(rng.normal(size=(A, 128)), dtype=jnp.float32)
        Av = atom_neighbor_sum_sorted(v, aux, A)
        Aw = atom_neighbor_sum_sorted(w, aux, A)
        lhs = float(jnp.vdot(Av, w))
        rhs = float(jnp.vdot(v, Aw))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


class TestChunkedCols:
    def test_concat_matches_unchunked(self):
        from polymer_chemprop_tpu.ops.pallas_mpnn import _chunked_cols
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 1280)), dtype=jnp.float32)
        calls = []

        def fn(m):
            calls.append(m.shape[1])
            return m * 2.0
        out = _chunked_cols(fn, x, chunk=768)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2.0)
        assert calls == [768, 512]
        # narrow input: single call, no slicing
        calls.clear()
        out = _chunked_cols(fn, x[:, :384], chunk=768)
        assert calls == [384]

    def test_chunk_width_follows_band_tile(self):
        """The 1024-bond tile's wider windows bound the chunk at 512
        (band_paths_for probe: OK at 512, stack-OOM at 640)."""
        from polymer_chemprop_tpu.features import mol2graph
        from polymer_chemprop_tpu.ops import pallas_mpnn as pm
        smiles = ["CCO", "c1ccccc1"] * 12
        gb = mol2graph(smiles, pad_atoms=512, pad_bonds=2048,
                       pad_mols=len(smiles))
        widths = []
        orig = pm._band_op

        def spy(m, *a, **kw):
            widths.append(m.shape[1])
            return orig(m, *a, **kw)
        pm._band_op = spy
        try:
            from jax.experimental.pallas import tpu as pltpu
            with pltpu.force_tpu_interpret_mode():
                for tile, want in ((512, [768, 768]), (1024, [512] * 3)):
                    aux = pm.build_sorted_aux(gb.b2dst, gb.b2revb,
                                              gb.w_bonds,
                                              num_atoms=512, tile_b=tile)
                    auxd = {k: jnp.asarray(getattr(aux, k))
                            for k in aux._fields
                            if getattr(aux, k) is not None}
                    msg = jnp.zeros((2048, 1536), jnp.float32)
                    widths.clear()
                    pm.band_message_step_sorted(msg, auxd)
                    assert widths == want, (tile, widths)
        finally:
            pm._band_op = orig


class TestBandFallbackInstrumentation:
    """VERDICT r3 item 8: the rev-fused band silently publishes rs_rev
    only when every tile's molecule span fits the kernel window EXT; the
    fallback decision is now counted (pallas_mpnn.FALLBACK_STATS) and
    logged by the trainer/bench. A macrocycle of >EXT/2 atoms pins the
    boundary: its ring closure puts same-atom bonds ~2*n_atoms apart in
    dst-sorted order."""

    def _aux_for(self, n_atoms):
        from polymer_chemprop_tpu.features.batching import batch_graphs
        from polymer_chemprop_tpu.features.config import (
            FeaturizationConfig,
        )
        from polymer_chemprop_tpu.features.featurization import MolGraph
        fcfg = FeaturizationConfig()
        smi = "C1" + "C" * (n_atoms - 2) + "C1"
        g = batch_graphs([MolGraph(smi, fcfg)], pad_bonds=1024,
                         pad_atoms=512)
        return g.arrays(pallas=True)["pallas_aux"]

    def test_small_ring_keeps_rev_fused(self):
        from polymer_chemprop_tpu.ops import pallas_mpnn as P
        P.reset_fallback_stats()
        aux = self._aux_for(100)
        assert aux["rs_rev"] is not None
        assert P.fallback_stats()["rev_fallback"] == 0

    def test_giant_macrocycle_falls_back_and_counts(self):
        from polymer_chemprop_tpu.ops import pallas_mpnn as P
        P.reset_fallback_stats()
        # 385-ring = 770 directed bonds > EXT(768): the ring-closure
        # atom's incoming bonds span the whole sorted order
        aux = self._aux_for(385)
        assert aux.get("rs_rev") is None
        fs = P.fallback_stats()
        assert fs["batches"] == 1 and fs["rev_fallback"] == 1


class TestTrainingReadoutPath:
    """The r4 TRAIN-side readout (full lane-padded width feeding a
    zero-row-extended W_o, taken when deterministic=False) must match
    the inference-sliced branch exactly, forward AND gradients — the
    2.71 ms headline path must not lose fast-suite coverage to the
    deterministic gating (r4 self-review)."""

    def test_train_branch_matches_inference_branch(self, interpret_mode):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from polymer_chemprop_tpu.features.batching import batch_graphs
        from polymer_chemprop_tpu.features.config import (
            FeaturizationConfig,
        )
        from polymer_chemprop_tpu.features.featurization import MolGraph
        from polymer_chemprop_tpu.models.encoder import (
            EncoderConfig,
            apply_encoder,
            init_encoder,
        )
        fcfg = FeaturizationConfig()
        smis = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1O"]
        gb = batch_graphs([MolGraph(s, fcfg) for s in smis],
                          pad_bonds=512, pad_atoms=256)
        arrays = {k: jnp.asarray(v) if not isinstance(v, dict) else
                  {kk: (jnp.asarray(vv) if vv is not None else None)
                   for kk, vv in v.items()}
                  for k, v in gb.arrays(pallas=True).items()}
        # hidden 64: the branch gating under test (full-width vs sliced
        # readout on `deterministic`) is width-independent; the real
        # width runs on-chip in bench.py
        cfg = EncoderConfig(atom_fdim=fcfg.atom_fdim,
                            bond_fdim=fcfg.bond_fdim(), hidden_size=64,
                            depth=3, dropout=0.0, unit_bond_weights=True)
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(1)

        def emb_train(p):
            # dropout 0: the rng only flips the deterministic gate
            return apply_encoder(p, arrays, cfg, dropout_key=key,
                                 deterministic=False)

        def emb_infer(p):
            return apply_encoder(p, arrays, cfg, deterministic=True)

        out_t = emb_train(params)
        out_i = emb_infer(params)
        # same math, different W_o contraction width (517 vs 433) ->
        # XLA reduction-order ulps only
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_i),
                                   rtol=1e-5, atol=1e-7)
        g_t = jax.grad(lambda p: jnp.sum(emb_train(p) ** 2))(params)
        g_i = jax.grad(lambda p: jnp.sum(emb_infer(p) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_t),
                        jax.tree_util.tree_leaves(g_i)):
            # atol: the two W_o widths reduce in different orders; the
            # r4 256/1024 readout windows land single elements at ~1e-5
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-5)


class TestBandExactWeights:
    """Band-exact bond weights (multiples of 1/256 in [0,1]): the 2-pass
    band mode (w_exact=True, q_lo pass skipped) must be BITWISE identical
    to the full 3-pass mode — w, -w and the rev-fused own-reverse entry
    w-1 are all bf16-exact, so the skipped pass is identically zero."""

    def test_two_pass_bitwise_equals_three_pass(self, interpret_mode,
                                                batch):
        from polymer_chemprop_tpu.ops.pallas_mpnn import (
            band_rev_layer_step_sorted,
        )
        gb = batch
        rng = np.random.default_rng(3)
        choices = np.float32([0.25, 0.5, 0.75, 0.125, 37 / 256.0, 1.0])
        w_bonds = np.where(
            gb.w_bonds > 0,
            choices[rng.integers(0, len(choices), gb.w_bonds.shape)],
            np.float32(0.0))
        aux_t = build_sorted_aux(gb.b2dst, gb.b2revb, w_bonds,
                                 num_atoms=gb.f_atoms.shape[0])
        assert aux_t.rs_rev is not None
        aux = {k: jnp.asarray(getattr(aux_t, k)) for k in aux_t._fields
               if getattr(aux_t, k) is not None}
        B = gb.f_bonds.shape[0]
        r2 = np.random.default_rng(0)
        msg = jnp.asarray(r2.normal(size=(B, 384)).astype(np.float32))
        wh = jnp.asarray(r2.normal(size=(300, 300)).astype(np.float32)
                         * 0.05)
        inp = jnp.asarray(r2.normal(size=(B, 384)).astype(np.float32))
        # the production precision mode (manual bf16 emulation) is where
        # the q_lo skip lives
        prec = "high"
        o3 = band_rev_layer_step_sorted(msg, wh, inp, aux, "relu", prec,
                                        w_exact=False)
        o2 = band_rev_layer_step_sorted(msg, wh, inp, aux, "relu", prec,
                                        w_exact=True)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(o3))

    def test_weight_exactness_predicate(self):
        from polymer_chemprop_tpu.features.featurization import (
            _band_exact_weight,
            polymer_bond_weights_bf16_exact,
        )
        assert _band_exact_weight(0.5) and _band_exact_weight(0.25)
        assert _band_exact_weight(1.0) and _band_exact_weight(0.0)
        assert _band_exact_weight(37 / 256.0)
        assert not _band_exact_weight(0.075)
        assert not _band_exact_weight(0.3)
        # bf16-exact but w-1 is not: the rev-fused entry disqualifies it
        assert not _band_exact_weight(0.251953125)
        assert not _band_exact_weight(1.5)
        ok = "[*:1]CC[*:2].[*:3]OO[*:4]|0.5|0.5|<1-3:0.5:0.5<2-4:0.25:0.75~10"
        bad = "[*:1]CC[*:2].[*:3]OO[*:4]|0.5|0.5|<1-3:0.075:0.075~10"
        plain = "c1ccccc1"
        assert polymer_bond_weights_bf16_exact([ok, plain])
        assert not polymer_bond_weights_bf16_exact([ok, bad])

    def test_trainer_detects_exact_polymer_weights(self, tmp_path):
        import csv as _csv

        from polymer_chemprop_tpu.config import TrainConfig
        from polymer_chemprop_tpu.train.trainer import build_model_config
        cfg = TrainConfig(data_path="x.csv", dataset_type="regression",
                          polymer=True)
        exact = ["[*:1]CC[*:2].[*:3]OO[*:4]|0.5|0.5|<1-3:0.5:0.5~5"]
        rough = ["[*:1]CC[*:2].[*:3]OO[*:4]|0.5|0.5|<1-3:0.3:0.7~5"]
        m1 = build_model_config(cfg, 1, data_smiles=exact)
        assert m1.encoder.unit_bond_weights
        m2 = build_model_config(cfg, 1, data_smiles=rough)
        assert not m2.encoder.unit_bond_weights
        # without data visibility, polymer stays conservative
        m3 = build_model_config(cfg, 1)
        assert not m3.encoder.unit_bond_weights
