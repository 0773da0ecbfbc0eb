"""Multi-device tests on the virtual 8-device CPU mesh: the DP training step
must produce gradients identical to a single-device run on the concatenated
batch (exact global masked loss), and the driver entry points must work."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polymer_chemprop_tpu.features import mol2graph
from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
from polymer_chemprop_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
    stack_device_batches,
)
from polymer_chemprop_tpu.train import make_train_step
from polymer_chemprop_tpu.train.scheduler import build_optimizer


def _mini_batch(smiles, targets):
    gb = mol2graph(smiles, pad_atoms=64, pad_bonds=128, pad_mols=len(smiles))
    arrays = gb.arrays()
    M = len(smiles)
    return {
        "graphs": [arrays],
        "targets": np.asarray(targets, np.float32).reshape(M, 1),
        "mask": np.ones((M, 1), np.float32),
        "weights": np.ones((M, 1), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=2)
    cfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                      ffn_hidden_size=16)
    params = init_model(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_mesh_creation():
    mesh = make_mesh(8, ("dp",))
    assert mesh.devices.size == 8


def test_dp_matches_single_device(setup):
    """psum-combined DP gradients == single-device gradients on the union."""
    cfg, params = setup
    n_dev = 4
    mesh = make_mesh(n_dev, ("dp",))
    tx = build_optimizer("sgd", lambda step: 0.1)

    shard_smiles = [["CCO", "c1ccccc1"], ["CC", "CCC"],
                    ["CCN", "c1ccncc1"], ["CO", "CCCl"]]
    shard_targets = [[1.0, -1.0], [0.5, 0.3], [-0.2, 2.0], [0.1, 0.7]]
    batches = [_mini_batch(s, t) for s, t in zip(shard_smiles, shard_targets)]

    stacked = stack_device_batches(batches)
    sharded = shard_batch(stacked, mesh, "dp")
    opt_state = tx.init(params)
    step = make_dp_train_step(cfg, tx, mesh, "dp")
    # deterministic rngs: dropout is 0 so the key value is irrelevant
    rngs = jnp.asarray(jax.random.split(jax.random.PRNGKey(0), n_dev))
    dp_params, _, dp_loss, _gnorm = step(params, opt_state, sharded, rngs)

    # single-device union batch
    union = _mini_batch([s for sh in shard_smiles for s in sh],
                        [t for sh in shard_targets for t in sh])
    sstep = make_train_step(cfg, tx)
    sp, _, sloss, _ = sstep(params, tx.init(params), union,
                            jax.random.PRNGKey(0))

    assert abs(float(dp_loss) - float(sloss)) < 1e-5
    flat_dp = jax.tree_util.tree_leaves(dp_params)
    flat_s = jax.tree_util.tree_leaves(sp)
    for a, b in zip(flat_dp, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_spectra_matches_single_device():
    """Spectra SID loss under DP == single-device on the union batch (the
    loss normalizes within each molecule's spectrum — row-local, so the
    exact-global-masked-loss scheme holds unchanged)."""
    enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                        depth=2)
    cfg = ModelConfig(encoder=enc, dataset_type="spectra", num_tasks=6,
                      ffn_hidden_size=16)
    params = init_model(jax.random.PRNGKey(1), cfg)
    n_dev = 4
    mesh = make_mesh(n_dev, ("dp",))
    tx = build_optimizer("sgd", lambda step: 0.1)

    rng = np.random.default_rng(0)
    shard_smiles = [["CCO", "c1ccccc1"], ["CC", "CCC"],
                    ["CCN", "c1ccncc1"], ["CO", "CCCl"]]

    def spec_batch(smiles):
        b = _mini_batch(smiles, [0.0] * len(smiles))
        t = rng.uniform(0.01, 1.0, size=(len(smiles), 6)).astype(np.float32)
        t /= t.sum(axis=1, keepdims=True)
        b["targets"] = t
        b["mask"] = np.ones_like(t)
        b["weights"] = np.ones_like(t)
        return b

    batches = [spec_batch(s) for s in shard_smiles]
    sharded = shard_batch(stack_device_batches(batches), mesh, "dp")
    step = make_dp_train_step(cfg, tx, mesh, "dp",
                              spectra_target_floor=1e-8)
    rngs = jnp.asarray(jax.random.split(jax.random.PRNGKey(0), n_dev))
    dp_params, _, dp_loss, _ = step(params, tx.init(params), sharded, rngs)

    union = spec_batch([s for sh in shard_smiles for s in sh])
    # targets must equal the shard concatenation exactly
    union["targets"] = np.concatenate([b["targets"] for b in batches])
    union["mask"] = np.ones_like(union["targets"])
    union["weights"] = np.ones_like(union["targets"])
    sstep = make_train_step(cfg, tx, None, None, 1e-8)
    sp, _, sloss, _ = sstep(params, tx.init(params), union,
                            jax.random.PRNGKey(0))

    assert abs(float(dp_loss) - float(sloss)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(dp_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_partition_matches_single_device(setup):
    """Edge-sharded forward (pair-aligned bond shards + per-layer psum of
    atom partials) must equal the single-device encoder exactly."""
    from polymer_chemprop_tpu.models import apply_encoder
    from polymer_chemprop_tpu.parallel import (
        build_edge_shards,
        make_edge_parallel_forward,
    )
    model_cfg, params = setup
    cfg = model_cfg.encoder
    enc_params = params["encoders"][0]
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1"]
    gb = mol2graph(smiles, pad_atoms=128, pad_bonds=256, pad_mols=len(smiles))
    arrays = gb.arrays()

    single = np.asarray(apply_encoder(
        enc_params, {k: jnp.asarray(v) for k, v in arrays.items()}, cfg))

    n_dev = 4
    mesh = make_mesh(n_dev, ("ep",))
    sharded, replicated = build_edge_shards(arrays, n_dev)
    fwd = make_edge_parallel_forward(cfg, mesh, "ep")
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharded_dev = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))), sharded)
    out = np.asarray(fwd(enc_params, sharded_dev, replicated))
    np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5)


def test_graft_entry_single_chip():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry",
                                                  "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape[1] == 2


def test_graft_entry_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry",
                                                  "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_gspmd_matches_single_device(setup):
    """XLA-partitioned train step (sharded graph axes, auto collectives)
    must produce the same updated parameters as the single-device step."""
    from polymer_chemprop_tpu.parallel import make_gspmd_train_step

    cfg, params = setup
    tx = build_optimizer("sgd", lambda step: 0.1)
    smiles = ["CCO", "c1ccccc1", "CC", "CCC", "CCN", "c1ccncc1",
              "CO", "CCCl"]
    targets = [1.0, -1.0, 0.5, 0.3, -0.2, 2.0, 0.1, 0.7]
    batch = _mini_batch(smiles, targets)

    sstep = make_train_step(cfg, tx)
    sp, _, sloss, _ = sstep(params, tx.init(params), batch,
                            jax.random.PRNGKey(0))

    mesh = make_mesh(4, ("gp",))
    gstep = make_gspmd_train_step(cfg, tx, mesh, "gp")
    gp_, _, gloss = gstep(params, tx.init(params), batch,
                          jax.random.PRNGKey(0))

    assert abs(float(gloss) - float(sloss)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(gp_),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_partition_halo_matches_single_device(setup):
    """Halo-exchange edge sharding (neighbour ppermute of atom-window
    partials, ~n_shards x less ICI traffic than the psum variant) must
    also equal the single-device encoder."""
    from polymer_chemprop_tpu.models import apply_encoder
    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo,
        make_edge_parallel_forward_halo,
    )
    model_cfg, params = setup
    cfg = model_cfg.encoder
    enc_params = params["encoders"][0]
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1",
              "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1"]
    gb = mol2graph(smiles, pad_atoms=128, pad_bonds=256, pad_mols=len(smiles))
    arrays = gb.arrays()

    single = np.asarray(apply_encoder(
        enc_params, {k: jnp.asarray(v) for k, v in arrays.items()}, cfg))

    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev, ("ep",))
        sharded, replicated = build_edge_shards_halo(arrays, n_dev)
        fwd = make_edge_parallel_forward_halo(cfg, mesh, "ep")
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))),
            sharded)
        out = np.asarray(fwd(enc_params, sharded_dev, replicated))
        np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5,
                                   err_msg=f"n_dev={n_dev}")


def test_edge_partition_halo_rejects_giant_molecule():
    """A single molecule spanning 3+ shards violates the neighbour-only
    exchange invariant; the builder must refuse so callers fall back to
    build_edge_shards + psum."""
    import pytest
    from polymer_chemprop_tpu.parallel import build_edge_shards_halo
    # macrocycle: the ring-closure bond links the last atom back to atom 0,
    # so the final shard references the first shard's window (a linear
    # chain, by contrast, has perfect locality and shards fine)
    ring = "C1" + "C" * 198 + "1"
    gb = mol2graph([ring], pad_atoms=256, pad_bonds=512, pad_mols=1)
    with pytest.raises(ValueError, match="3\\+ edge shards"):
        build_edge_shards_halo(gb.arrays(), 8)


def test_edge_partition_halo_covers_bondless_molecules(setup):
    """Single-atom molecules (water/methane fold to one heavy atom, no
    bonds) are referenced by no shard's bonds, but must still reach the
    readout through some shard's atom window."""
    from polymer_chemprop_tpu.models import apply_encoder
    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo,
        make_edge_parallel_forward_halo,
    )
    model_cfg, params = setup
    cfg = model_cfg.encoder
    enc_params = params["encoders"][0]
    smiles = ["O", "CCO", "C", "c1ccccc1", "O", "CCN", "C", "CC(=O)O"]
    gb = mol2graph(smiles, pad_atoms=64, pad_bonds=64, pad_mols=len(smiles))
    arrays = gb.arrays()
    single = np.asarray(apply_encoder(
        enc_params, {k: jnp.asarray(v) for k, v in arrays.items()}, cfg))
    for n_dev in (2, 4):
        mesh = make_mesh(n_dev, ("ep",))
        sharded, replicated = build_edge_shards_halo(arrays, n_dev)
        fwd = make_edge_parallel_forward_halo(cfg, mesh, "ep")
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))),
            sharded)
        out = np.asarray(fwd(enc_params, sharded_dev, replicated))
        np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5,
                                   err_msg=f"n_dev={n_dev}")


class TestTrainerDataParallel:
    """run_training with data_parallel=True on the 8-virtual-device CPU
    mesh: the full trainer path (micro-batch loader, device grouping,
    masked tail padding, psum'd exact global loss, host-fetched eval)."""

    def test_trainer_dp_end_to_end(self, tmp_path):
        import os
        from polymer_chemprop_tpu.config import TrainConfig
        from polymer_chemprop_tpu.data import get_data
        from polymer_chemprop_tpu.train import run_training

        data_dir = os.path.join(os.path.dirname(__file__), "data")
        scores = {}
        for dp in (False, True):
            cfg = TrainConfig(
                data_path=os.path.join(data_dir, "regression.csv"),
                dataset_type="regression", epochs=3, batch_size=20,
                max_data_size=120, seed=0, pytorch_seed=0,
                save_dir=str(tmp_path / f"dp_{dp}"), quiet=True,
                data_parallel=dp)
            data = get_data(cfg.data_path, config=cfg.featurization(),
                            max_data_size=cfg.max_data_size,
                            smiles_columns=cfg.smiles_columns)
            result = run_training(cfg, data)
            scores[dp] = float(np.nanmean(result[cfg.metric]))
        # identical data/split; dp changes batching granularity (8 x 3-mol
        # micro-batches vs one 20-mol batch) so trajectories differ, but
        # both must train to the same quality regime
        assert np.isfinite(scores[True]) and np.isfinite(scores[False])
        assert abs(scores[True] - scores[False]) / scores[False] < 0.5, scores


def test_halo_train_step_matches_single_device(setup):
    """Training THROUGH the halo exchange: gradients flow back through the
    per-layer ppermutes (shard_map AD reverses them and psums the
    replicated-parameter cotangents), so the updated parameters and loss
    must equal a single-device train step on the unsharded batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo,
        make_halo_train_step,
    )

    cfg, params = setup
    tx = build_optimizer("sgd", lambda step: 0.1)
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1",
              "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1"]
    targets = [1.0, -1.0, 0.5, 0.3, -0.2, 2.0, 0.1, 0.7]
    # a roomier envelope than _mini_batch: 8-way halo sharding needs no
    # molecule to span 3+ shards
    gb = mol2graph(smiles, pad_atoms=128, pad_bonds=256, pad_mols=len(smiles))
    arrays = gb.arrays()
    M = len(smiles)
    batch = {
        "graphs": [arrays],
        "targets": np.asarray(targets, np.float32).reshape(M, 1),
        "mask": np.ones((M, 1), np.float32),
        "weights": np.ones((M, 1), np.float32),
    }

    sstep = make_train_step(cfg, tx)
    sp, _, sloss, _ = sstep(params, tx.init(params), batch, None)

    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev, ("ep",))
        sharded, replicated = build_edge_shards_halo(arrays, n_dev)
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))),
            sharded)
        hstep = make_halo_train_step(cfg, tx, mesh, "ep")
        hp_, _, hloss, _ = hstep(params, tx.init(params), sharded_dev,
                                 replicated, jnp.asarray(batch["targets"]),
                                 jnp.asarray(batch["mask"]),
                                 jnp.asarray(batch["weights"]))
        assert abs(float(hloss) - float(sloss)) < 1e-5, f"n_dev={n_dev}"
        for a, b in zip(jax.tree_util.tree_leaves(hp_),
                        jax.tree_util.tree_leaves(sp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"n_dev={n_dev}")


class TestTrainerGraphParallel:
    """run_training with graph_parallel=True on the 8-virtual-device CPU
    mesh: the full CLI-driven path (loader pair-layout batches, per-batch
    halo partitioning with a fixed atom window, edge-sharded train step).
    Unlike DP (which regroups batches), graph parallel consumes the SAME
    batches as the single-device path with a deterministic step, so the
    final scores must match tightly (VERDICT r1 item 2)."""

    def _run(self, tmp_path, **overrides):
        import os
        from polymer_chemprop_tpu.config import TrainConfig
        from polymer_chemprop_tpu.data import get_data
        from polymer_chemprop_tpu.train import run_training

        data_dir = os.path.join(os.path.dirname(__file__), "data")
        # epochs 2 / 100 mols: the property under test (GP score ==
        # single-device score, 1e-3) is config-independent; the smaller
        # run keeps both compiles but 1/3 less stepping (suite budget)
        kw = dict(
            data_path=os.path.join(data_dir, "regression.csv"),
            dataset_type="regression", epochs=2, batch_size=20,
            max_data_size=100, seed=0, pytorch_seed=0, quiet=True)
        kw.update(overrides)
        cfg = TrainConfig(**kw)
        data = get_data(cfg.data_path, config=cfg.featurization(),
                        max_data_size=cfg.max_data_size,
                        smiles_columns=cfg.smiles_columns)
        result = run_training(cfg, data)
        return float(np.nanmean(result[cfg.metric]))

    def test_trainer_gp_matches_single_device(self, tmp_path):
        scores = {}
        for gp in (False, True):
            scores[gp] = self._run(
                tmp_path, save_dir=str(tmp_path / f"gp_{gp}"),
                graph_parallel=gp)
        assert np.isfinite(scores[True])
        assert abs(scores[True] - scores[False]) / abs(scores[False]) \
            < 1e-3, scores

    def test_trainer_gp_classification(self, tmp_path):
        import os
        data_dir = os.path.join(os.path.dirname(__file__), "data")
        scores = {}
        for gp in (False, True):
            scores[gp] = self._run(
                tmp_path, data_path=os.path.join(data_dir,
                                                 "classification.csv"),
                dataset_type="classification",
                save_dir=str(tmp_path / f"gpc_{gp}"), graph_parallel=gp)
        assert np.isfinite(scores[True])
        assert abs(scores[True] - scores[False]) / abs(scores[False]) \
            < 1e-3, scores

    def test_trainer_gp_polymer(self, tmp_path):
        """The fork's headline feature THROUGH graph parallelism: weighted
        copolymer ensemble graphs (non-unit w_bonds/w_atoms, Xn) edge-
        partitioned over the 8-device mesh must match the single-device
        trainer (deterministic batches, dropout 0)."""
        import os
        rng = np.random.default_rng(3)
        rows = ["smiles,target"]
        mons = ["[*:1]CC[*:2]", "[*:1]c1ccc([*:2])cc1", "[*:1]CO[*:2]",
                "[*:1]C(C)C[*:2]"]
        for _ in range(48):
            m1, m2 = rng.choice(mons, 2, replace=False)
            m2 = m2.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
            w = rng.choice([0.25, 0.5, 0.75])
            st = (f"{m1}.{m2}|{w}|{1 - w}|"
                  f"<1-3:0.5:0.5<2-4:0.5:0.5~{rng.integers(2, 100)}")
            rows.append(f'"{st}",{rng.normal():.4f}')
        csv_path = tmp_path / "poly.csv"
        csv_path.write_text("\n".join(rows))
        scores = {}
        for gp in (False, True):
            scores[gp] = self._run(
                tmp_path, data_path=str(csv_path), polymer=True,
                batch_size=12, max_data_size=None,
                save_dir=str(tmp_path / f"poly_{gp}"), graph_parallel=gp)
        assert np.isfinite(scores[True])
        assert abs(scores[True] - scores[False]) / abs(scores[False]) \
            < 1e-3, scores

    def test_unsupported_config_raises(self, tmp_path):
        with pytest.raises(ValueError, match="graph_parallel"):
            self._run(tmp_path, save_dir=str(tmp_path / "bad"),
                      graph_parallel=True, features_only=True,
                      features_generator=["morgan"])

    def test_trainer_gp_atom_messages(self, tmp_path):
        """VERDICT r3 item 3: atom_messages rides graph parallelism —
        window-resident atom messages with the same bond-keyed halo
        combine; must match the single-device trainer exactly."""
        scores = {}
        for gp in (False, True):
            scores[gp] = self._run(
                tmp_path, save_dir=str(tmp_path / f"gpam_{gp}"),
                graph_parallel=gp, atom_messages=True)
        assert np.isfinite(scores[True])
        assert abs(scores[True] - scores[False]) / abs(scores[False]) \
            < 1e-3, scores

    def test_trainer_gp_undirected(self, tmp_path):
        """undirected symmetrization is shard-local (rev pairs are
        co-located), so GP must match single-device."""
        scores = {}
        for gp in (False, True):
            scores[gp] = self._run(
                tmp_path, save_dir=str(tmp_path / f"gpu_{gp}"),
                graph_parallel=gp, undirected=True)
        assert np.isfinite(scores[True])
        assert abs(scores[True] - scores[False]) / abs(scores[False]) \
            < 1e-3, scores

    def test_trainer_gp_dropout_and_features(self, tmp_path):
        """VERDICT r2 item 6: dropout>0 and extra molecule features now
        ride the graph-parallel path (per-shard RNG streams; features
        appended before the replicated FFN)."""
        import os
        data_dir = os.path.join(os.path.dirname(__file__), "data")
        score = self._run(
            tmp_path, save_dir=str(tmp_path / "gp_do"),
            graph_parallel=True, dropout=0.2,
            features_generator=["morgan"])
        assert np.isfinite(score)

    def test_trainer_gp_dp_2d(self, tmp_path):
        """GP x DP on the trainer: a 2x4 (dp, ep) mesh must match the
        1-replica GP run closely (deterministic batches, dropout 0)."""
        scores = {}
        for dp in (1, 2):
            scores[dp] = self._run(
                tmp_path, save_dir=str(tmp_path / f"gpdp_{dp}"),
                graph_parallel=True, graph_parallel_dp=dp)
        assert np.isfinite(scores[2])
        # dp=2 groups two loader batches per optimizer update, so this
        # 3-epoch run takes HALF the steps of the dp=1 run on the same
        # schedule -- scores differ by trajectory, not correctness (the
        # step-level 2D equivalence is pinned exactly by
        # test_halo_dp_2d_train_step_matches_single_device); just demand
        # the short run lands in the same ballpark
        assert abs(scores[2] - scores[1]) / abs(scores[1]) < 0.5, scores


def test_trainer_gp_giant_molecule_fallback(tmp_path):
    """A molecule spanning 3+ edge shards cannot be halo-partitioned; the
    trainer must fall back to the single-device step for that batch and
    still finish the fold (parallel/partition.py raises, trainer
    catches)."""
    import csv
    import os
    from polymer_chemprop_tpu.config import TrainConfig
    from polymer_chemprop_tpu.data import get_data
    from polymer_chemprop_tpu.train import run_training

    path = tmp_path / "giant.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "y"])
        w.writerow(["C" * 180, 1.0])  # 180-atom chain: spans many shards
        for i in range(19):
            w.writerow(["CCO" if i % 2 else "CCN", 0.1 * i])
    cfg = TrainConfig(data_path=str(path), dataset_type="regression",
                      epochs=2, batch_size=20, seed=0, pytorch_seed=0,
                      save_dir=str(tmp_path / "out"), quiet=True,
                      graph_parallel=True, split_sizes=(0.5, 0.25, 0.25))
    data = get_data(cfg.data_path, config=cfg.featurization(),
                    smiles_columns=cfg.smiles_columns)
    result = run_training(cfg, data)
    assert np.isfinite(float(np.nanmean(result[cfg.metric])))


def test_edge_partition_halo_band_matches_single_device(setup):
    """BANDED halo forward: the Pallas atom-aggregation band kernel runs
    INSIDE each shard (interpret mode on the CPU mesh) — must equal the
    single-device encoder (closes the docs/kernels.md guarded-fallback
    gap at test scale)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.models import apply_encoder
    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo_band,
        make_edge_parallel_forward_halo_band,
    )

    model_cfg, params = setup
    cfg = model_cfg.encoder
    enc_params = params["encoders"][0]
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1",
              "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1"] * 4
    gb = mol2graph(smiles, pad_atoms=512, pad_bonds=1024,
                   pad_mols=len(smiles))
    arrays = gb.arrays()
    single = np.asarray(apply_encoder(
        enc_params, {k: jnp.asarray(v) for k, v in arrays.items()}, cfg))

    for n_dev in (2, 4):
        mesh = make_mesh(n_dev, ("ep",))
        sharded, replicated = build_edge_shards_halo_band(arrays, n_dev)
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))),
            sharded)
        fwd = make_edge_parallel_forward_halo_band(cfg, mesh, "ep")
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(fwd(enc_params, sharded_dev, replicated))
        np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5,
                                   err_msg=f"n_dev={n_dev}")


def test_halo_band_train_step_matches_single_device(setup):
    """Training THROUGH the banded halo path: gradients flow back through
    the band kernel's custom VJP (weighted row-gather), the involution
    gather and the ppermutes — updated params must equal the
    single-device step."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo_band,
        make_halo_train_step,
    )

    cfg, params = setup
    tx = build_optimizer("sgd", lambda step: 0.1)
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1",
              "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1"] * 2
    targets = [1.0, -1.0, 0.5, 0.3, -0.2, 2.0, 0.1, 0.7] * 2
    gb = mol2graph(smiles, pad_atoms=256, pad_bonds=512,
                   pad_mols=len(smiles))
    arrays = gb.arrays()
    M = len(smiles)
    batch = {
        "graphs": [arrays],
        "targets": np.asarray(targets, np.float32).reshape(M, 1),
        "mask": np.ones((M, 1), np.float32),
        "weights": np.ones((M, 1), np.float32),
    }
    sstep = make_train_step(cfg, tx)
    sp, _, sloss, _ = sstep(params, tx.init(params), batch, None)

    n_dev = 2
    mesh = make_mesh(n_dev, ("ep",))
    sharded, replicated = build_edge_shards_halo_band(arrays, n_dev)
    sharded_dev = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))), sharded)
    hstep = make_halo_train_step(cfg, tx, mesh, "ep", band=True)
    with pltpu.force_tpu_interpret_mode():
        hp_, _, hloss, _ = hstep(params, tx.init(params), sharded_dev,
                                 replicated, jnp.asarray(batch["targets"]),
                                 jnp.asarray(batch["mask"]),
                                 jnp.asarray(batch["weights"]))
    assert abs(float(hloss) - float(sloss)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(hp_),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_halo_overlap_forward_matches_unoverlapped(setup):
    """The strip-exchange overlapped forward must be row-exact vs the
    full-window halo forward: every atom row is accumulated by exactly
    one of the interior/strip segment sums, so no reassociation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo,
        halo_strip_width,
        make_edge_parallel_forward_halo,
        make_edge_parallel_forward_halo_overlap,
    )

    cfg, params = setup
    smiles = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)",
              "CCOc1ccc2nc(S(N)(=O)=O)sc2c1", "CCN", "c1ccncc1",
              "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1"]
    gb = mol2graph(smiles, pad_atoms=128, pad_bonds=256,
                   pad_mols=len(smiles))
    arrays = gb.arrays()
    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev, ("ep",))
        sharded, replicated = build_edge_shards_halo(arrays, n_dev)
        sw = halo_strip_width(sharded)
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("ep"))),
            sharded)
        base = make_edge_parallel_forward_halo(cfg.encoder, mesh, "ep")
        over = make_edge_parallel_forward_halo_overlap(cfg.encoder, mesh,
                                                       sw, "ep")
        eb = base(params["encoders"][0], sharded_dev, replicated)
        eo = over(params["encoders"][0], sharded_dev, replicated)
        np.testing.assert_allclose(np.asarray(eo), np.asarray(eb),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"n_dev={n_dev} sw={sw}")


def test_halo_dp_2d_train_step_matches_single_device(setup):
    """2D (dp, ep) mesh: each replica edge-partitions its own batch; the
    exact-global-masked-loss update must match a single-device step on
    the concatenated batches (VERDICT r2 item 2a)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo_dp,
        halo_strip_width,
        make_halo_dp_train_step,
        make_mesh,
    )

    cfg, params = setup
    tx = build_optimizer("sgd", lambda step: 0.1)
    smiles_a = ["CCO", "c1ccccc1", "CC(C)=CCCC(C)=CC(=O)", "CCN"]
    smiles_b = ["CC(=O)Nc1ccc(O)cc1", "C1CCCCC1", "c1ccncc1", "CCOC(C)=O"]
    t_a = [1.0, -1.0, 0.5, 0.3]
    t_b = [-0.2, 2.0, 0.1, 0.7]
    pad = dict(pad_atoms=96, pad_bonds=192, pad_mols=4)
    arr_a = mol2graph(smiles_a, **pad).arrays()
    arr_b = mol2graph(smiles_b, **pad).arrays()

    # single-device oracle: one step on the union batch (global masked
    # mean over both sub-batches == the 2D step's loss)
    union = mol2graph(smiles_a + smiles_b, pad_atoms=192, pad_bonds=384,
                      pad_mols=8).arrays()
    batch = {
        "graphs": [union],
        "targets": np.asarray(t_a + t_b, np.float32).reshape(8, 1),
        "mask": np.ones((8, 1), np.float32),
        "weights": np.ones((8, 1), np.float32),
    }
    sstep = make_train_step(cfg, tx)
    sp, _, sloss, _ = sstep(params, tx.init(params), batch, None)

    for n_dp, n_ep in ((2, 4), (2, 2), (4, 2)):
        mesh = make_mesh(n_dp * n_ep, ("dp", "ep"), shape=(n_dp, n_ep))
        reps = [arr_a, arr_b] * (n_dp // 2)
        tgts = ([t_a, t_b] * (n_dp // 2))
        sharded, replicated = build_edge_shards_halo_dp(reps, n_ep,
                                                        atom_window=96)
        spec = NamedSharding(mesh, P("dp", "ep"))
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec), sharded)
        targets = np.asarray(tgts, np.float32)[..., None]
        mask = np.ones_like(targets)
        weights = np.ones_like(targets)
        rngs = np.zeros((n_dp, n_ep, 2), np.uint32)
        step = make_halo_dp_train_step(cfg, tx, mesh)
        p2, _, loss, _ = step(params, tx.init(params), sharded_dev,
                              replicated, jnp.asarray(targets),
                              jnp.asarray(mask), jnp.asarray(weights),
                              jnp.asarray(rngs),
                              jax.random.PRNGKey(0))
        if n_dp == 2:
            # same union batch as the oracle
            assert abs(float(loss) - float(sloss)) < 1e-5, (n_dp, n_ep)
            for a, b in zip(jax.tree_util.tree_leaves(p2),
                            jax.tree_util.tree_leaves(sp)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                    err_msg=f"dp={n_dp} ep={n_ep}")
        else:
            assert np.isfinite(float(loss))

        # overlapped variant bit-matches the unoverlapped 2D step
        sw = halo_strip_width(sharded)
        step_o = make_halo_dp_train_step(cfg, tx, mesh, overlap=True,
                                         strip_width=sw)
        p3, _, loss_o, _ = step_o(params, tx.init(params), sharded_dev,
                                  replicated, jnp.asarray(targets),
                                  jnp.asarray(mask), jnp.asarray(weights),
                                  jnp.asarray(rngs),
                                  jax.random.PRNGKey(0))
        assert abs(float(loss_o) - float(loss)) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(p3),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_halo_dp_2d_dropout(setup):
    """Dropout through the 2D halo step (VERDICT r2 item 6): per-replica
    RNG streams, deterministic given the keys, and distinct keys give
    distinct updates."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo_dp,
        make_halo_dp_train_step,
        make_mesh,
    )

    enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                        depth=2, dropout=0.3)
    cfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                      ffn_hidden_size=16)
    params = init_model(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer("sgd", lambda step: 0.1)
    pad = dict(pad_atoms=96, pad_bonds=192, pad_mols=4)
    arr_a = mol2graph(["CCO", "c1ccccc1", "CCN", "CCOC(C)=O"],
                      **pad).arrays()
    arr_b = mol2graph(["CC(=O)N", "C1CCCCC1", "c1ccncc1", "CCCC"],
                      **pad).arrays()
    mesh = make_mesh(8, ("dp", "ep"), shape=(2, 4))
    sharded, replicated = build_edge_shards_halo_dp([arr_a, arr_b], 4,
                                                    atom_window=96)
    spec = NamedSharding(mesh, P("dp", "ep"))
    sharded_dev = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec), sharded)
    targets = np.ones((2, 4, 1), np.float32)
    mask = np.ones_like(targets)
    rngs1 = np.asarray(
        jax.random.split(jax.random.PRNGKey(1), 8)).reshape(2, 4, 2)
    rngs2 = np.asarray(
        jax.random.split(jax.random.PRNGKey(2), 8)).reshape(2, 4, 2)
    step = make_halo_dp_train_step(cfg, tx, mesh, dropout_rngs=True)
    out = {}
    for nm, r in (("a", rngs1), ("a2", rngs1), ("b", rngs2)):
        p2, _, loss, _ = step(params, tx.init(params), sharded_dev,
                              replicated, jnp.asarray(targets),
                              jnp.asarray(mask), jnp.asarray(mask),
                              jnp.asarray(r), jax.random.PRNGKey(9))
        out[nm] = (float(loss), jax.tree_util.tree_leaves(p2))
    assert out["a"][0] == out["a2"][0]          # deterministic
    assert out["a"][0] != out["b"][0]           # rng-sensitive
    for x, y in zip(out["a"][1], out["a2"][1]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gp_atom_messages_dropout_ep_invariant(setup):
    """atom_messages GP dropout: window-resident atom messages REPLICATE
    halo atoms across adjacent shards, so masks are keyed by GLOBAL atom
    row (partition.py drop_win) — a per-shard stream would drop the two
    copies of one atom differently. With the per-ep-row key held fixed,
    the dropped train step must therefore be invariant to the ep split."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from polymer_chemprop_tpu.parallel import (
        build_edge_shards_halo_dp,
        make_halo_dp_train_step,
        make_mesh,
    )

    enc = EncoderConfig(atom_fdim=133, bond_fdim=14, hidden_size=16,
                        depth=3, dropout=0.35, atom_messages=True)
    cfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                      ffn_hidden_size=16)
    params = init_model(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer("sgd", lambda step: 0.1)
    pad = dict(pad_atoms=96, pad_bonds=192, pad_mols=6)
    # molecules sized so shard boundaries cut through them (halo atoms)
    arr = mol2graph(["CC(=O)Nc1ccc(O)cc1", "CC(C)=CCCC(C)=CC(=O)",
                     "c1ccc2ccccc2c1", "CCOC(C)=O", "CCN", "CCCCCC"],
                    **pad).arrays()
    targets = np.asarray([[0.3], [1.0], [-0.5], [0.2], [0.8], [-1.0]],
                         np.float32)[None]
    mask = np.ones_like(targets)
    key_row = np.asarray(jax.random.PRNGKey(7), np.uint32)
    out = {}
    for n_ep in (2, 4):
        mesh = make_mesh(n_ep, ("dp", "ep"), shape=(1, n_ep))
        sharded, replicated = build_edge_shards_halo_dp([arr], n_ep,
                                                        atom_window=96)
        spec = NamedSharding(mesh, P("dp", "ep"))
        sharded_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec), sharded)
        # every ep shard of the row carries the SAME key: drop_win reads
        # the row's first shard key, so masks agree across splits
        rngs = np.broadcast_to(key_row, (1, n_ep, 2))
        step = make_halo_dp_train_step(cfg, tx, mesh, dropout_rngs=True)
        _, _, loss, _ = step(params, tx.init(params), sharded_dev,
                             replicated, jnp.asarray(targets),
                             jnp.asarray(mask), jnp.asarray(mask),
                             jnp.asarray(rngs), jax.random.PRNGKey(9))
        out[n_ep] = float(loss)
        # dropout actually fires: a no-dropout step lands elsewhere
        step0 = make_halo_dp_train_step(cfg, tx, mesh)
        _, _, loss0, _ = step0(params, tx.init(params), sharded_dev,
                               replicated, jnp.asarray(targets),
                               jnp.asarray(mask), jnp.asarray(mask),
                               jnp.asarray(rngs), jax.random.PRNGKey(9))
        assert abs(out[n_ep] - float(loss0)) > 1e-6
    assert abs(out[2] - out[4]) < 1e-5 * max(1.0, abs(out[2])), out
