"""Unit tests: Noam schedule values vs the reference formula, loss
functions vs closed forms, checkpoint round-trips, TPE sanity."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polymer_chemprop_tpu.train.loss import (
    bce_with_logits,
    cross_entropy_multiclass,
    get_loss_fn,
    masked_loss,
    sid_loss,
)
from polymer_chemprop_tpu.train.scheduler import build_optimizer, noam_schedule
from polymer_chemprop_tpu.utils.checkpoint import (
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
)


class TestNoam:
    def test_matches_reference_formula(self):
        """reference nn_utils.py:115-195: linear warmup then exponential
        decay with gamma = (final/max)^(1/(total-warmup))."""
        init_lr, max_lr, final_lr = 1e-4, 1e-3, 1e-4
        warmup, total = 16, 80
        sched = noam_schedule(init_lr, max_lr, final_lr, warmup, total)
        inc = (max_lr - init_lr) / warmup
        gamma = (final_lr / max_lr) ** (1 / (total - warmup))
        for step in [0, 1, 8, 16, 17, 40, 80, 100]:
            got = float(sched(step))
            if step <= warmup:
                want = init_lr + step * inc
            elif step <= total:
                want = max_lr * gamma ** (step - warmup)
            else:
                want = final_lr
            assert abs(got - want) / want < 1e-5, (step, got, want)

    def test_peak_at_warmup(self):
        sched = noam_schedule(1e-4, 1e-3, 1e-4, 10, 100)
        assert abs(float(sched(10)) - 1e-3) < 1e-9


class TestLosses:
    def test_bce_with_logits(self):
        import torch
        x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        t = (np.random.default_rng(1).random((5, 3)) > 0.5).astype(np.float32)
        got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
        want = torch.nn.BCEWithLogitsLoss(reduction="none")(
            torch.tensor(x), torch.tensor(t)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_cross_entropy_multiclass(self):
        import torch
        x = np.random.default_rng(0).normal(size=(4, 2, 3)).astype(np.float32)
        t = np.array([[0, 2], [1, 1], [2, 0], [0, 1]], np.int32)
        got = np.asarray(cross_entropy_multiclass(jnp.asarray(x),
                                                  jnp.asarray(t)))
        want = np.stack([
            torch.nn.CrossEntropyLoss(reduction="none")(
                torch.tensor(x[:, i, :]), torch.tensor(t[:, i]).long()).numpy()
            for i in range(2)], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_masked_loss_reduction(self):
        elem = jnp.ones((4, 3))
        mask = jnp.zeros((4, 3)).at[0, 0].set(1).at[1, 1].set(1)
        dw = jnp.ones((4, 1))
        out = float(masked_loss(elem, mask, None, dw))
        assert abs(out - 1.0) < 1e-6  # sum(2)/mask.sum(2)

    def test_sid_excluded_regions_zero(self):
        preds = jnp.asarray([[0.2, 0.5, 0.3]])
        targets = jnp.asarray([[0.25, 0.45, 1.0]])
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        loss = np.asarray(sid_loss(preds, targets, mask))
        assert loss[0, 2] == 0.0  # excluded position contributes log(1/1)=0

    def test_registry(self):
        assert get_loss_fn("regression") is not None
        with pytest.raises(ValueError):
            get_loss_fn("bogus")


class TestCheckpoint:
    def test_roundtrip_with_opt_state(self, tmp_path):
        import optax
        params = {"encoders": [{"W_i": {"w": np.ones((4, 3), np.float32)}}],
                  "ffn": [{"w": np.zeros((3, 1), np.float32),
                           "b": np.zeros(1, np.float32)}]}
        tx = build_optimizer("adam", lambda s: 1e-3)
        opt_state = tx.init(params)
        path = str(tmp_path / "m.ckpt")
        save_checkpoint(path, params, {"seed": 7}, scalers={},
                        opt_state=opt_state, epoch=5)
        p2, cfgd, scalers, epoch = load_checkpoint(path)
        assert epoch == 5 and cfgd["seed"] == 7
        np.testing.assert_array_equal(p2["encoders"][0]["W_i"]["w"],
                                      params["encoders"][0]["W_i"]["w"])
        restored = load_opt_state(path, tx.init(params))
        assert restored is not None

    def test_scaler_roundtrip(self, tmp_path):
        from polymer_chemprop_tpu.data import StandardScaler
        sc = StandardScaler().fit([[1.0, 2.0], [3.0, 4.0]])
        path = str(tmp_path / "m.ckpt")
        save_checkpoint(path, {"x": np.ones(2)}, {},
                        scalers={"data_scaler": sc})
        _, _, scalers, _ = load_checkpoint(path)
        np.testing.assert_allclose(scalers["data_scaler"].means, sc.means)

    def test_scaler_float_noise_std_degrades_to_identity(self):
        """r5: a column whose train values tie up to 1 ulp (e.g. a
        CDF-normalized plateau) has a ~1e-17 std that slipped past the
        exact-zero guard, producing 1e15-scale transformed values that
        overflowed float32 and NaN'd training. Such stds must degrade
        to identity like exact zeros."""
        from polymer_chemprop_tpu.data import StandardScaler
        v = 0.3847104429
        col = np.array([v, np.nextafter(v, 1.0), v, v])
        X = np.stack([col, np.array([1.0, 2.0, 3.0, 4.0])], axis=1)
        sc = StandardScaler().fit(X)
        assert sc.stds[0] == 1.0          # degenerate -> identity
        assert sc.stds[1] != 1.0          # genuine variance untouched
        out = sc.transform(np.array([[1.0, 2.5]]))
        assert np.all(np.abs(out) < 1e3) and np.isfinite(out).all()

    def test_scaler_tiny_units_column_untouched(self):
        """The degeneracy threshold is RELATIVE to the column magnitude:
        a column in genuinely tiny physical units with proportional
        variance must still be scaled."""
        from polymer_chemprop_tpu.data import StandardScaler
        X = np.array([[1e-13], [3e-13], [9e-13], [5e-13]])
        sc = StandardScaler().fit(X)
        assert sc.stds[0] != 1.0
        out = sc.transform(X)
        assert np.abs(out).max() > 0.5    # genuinely standardized

    def test_cdf_table_plateaus_exactly_tied(self):
        """The shipped CDF table must hold EXACT ties on plateaus: an
        ulp-separated plateau feeds the float-noise-std failure above
        (scripts/fit_rdkit2d_cdf.py snaps to 12 decimals)."""
        from polymer_chemprop_tpu.features.generators import _cdf_table
        x, y, off = _cdf_table()
        for k in range(200):
            ys = y[off[k]:off[k + 1]]
            d = np.diff(ys)
            near = d[(d > 0) & (d < 1e-13)]
            assert near.size == 0, (k, near[:3])


class TestTPE:
    def test_convergence_on_toy_objective(self):
        from polymer_chemprop_tpu.hyperparameter_optimization import SPACE, TPE
        tpe = TPE(SPACE, seed=0, n_startup=5)
        history = []
        # toy objective: best at hidden 300, depth 2, dropout 0
        for i in range(40):
            params = tpe.suggest(history)
            loss = (params["hidden_size"] / 2400 + params["depth"] / 6
                    + params["dropout"])
            history.append({"params": params, "loss": loss})
        best = min(history, key=lambda h: h["loss"])
        assert best["params"]["hidden_size"] <= 600
        assert best["params"]["dropout"] <= 0.1


class TestInterpret:
    def test_mcts_with_synthetic_scorer(self):
        """MCTS finds a small rationale using a scorer that rewards
        aromatic rings (no trained model needed)."""
        from polymer_chemprop_tpu.chem import parse_smiles
        from polymer_chemprop_tpu.interpret import mcts

        def scorer(smiles_lists):
            out = []
            for (s,) in smiles_lists:
                m = parse_smiles(s, strict=False)
                if m is None:
                    out.append(0.0)
                    continue
                n_arom = sum(1 for a in m.atoms if a.is_aromatic)
                out.append(min(1.0, n_arom / 6))
            return out

        rationales = mcts("CCCCc1ccccc1CCCC", scorer, n_rollout=8,
                          max_atoms=10, prop_delta=0.5, min_atoms=4)
        assert rationales, "no rationale found"
        best = max(rationales, key=lambda n: n.P)
        m = parse_smiles(best.smiles)
        assert sum(1 for a in m.atoms if a.is_aromatic) >= 6


class TestSDFDescriptors:
    """SDF atom-descriptor loading (reference features/utils.py:89-103)."""

    def _write_sdf(self, path, records):
        with open(path, "w") as f:
            for smi, fields in records:
                f.write("mol\n  gen\n\n  0  0  0  0  0  0  0  0  0  0999 V2000\n"
                        "M  END\n")
                f.write(f"> <SMILES>\n{smi}\n\n")
                for name, value in fields.items():
                    f.write(f"> <{name}>\n{value}\n\n")
                f.write("$$$$\n")

    def test_load_and_reindex(self, tmp_path):
        from polymer_chemprop_tpu.features.utils import (
            load_valid_atom_or_bond_features,
        )
        p = str(tmp_path / "desc.sdf")
        self._write_sdf(p, [
            ("CCO", {"charge": "0.1,0.2,0.3", "logp": "1.0,2.0,3.0",
                     "name": "ethanol"}),
            ("CC", {"charge": "0.4,0.5", "logp": "4.0,5.0", "name": "ethane"}),
        ])
        # request in the REVERSE order of the file: must reindex by SMILES
        feats = load_valid_atom_or_bond_features(p, ["CC", "CCO"])
        assert len(feats) == 2
        assert feats[0].shape == (2, 2) and feats[1].shape == (3, 2)
        np.testing.assert_allclose(feats[1][:, 0], [0.1, 0.2, 0.3])
        np.testing.assert_allclose(feats[0][:, 1], [4.0, 5.0])

    def test_multiline_values_and_missing_smiles(self, tmp_path):
        from polymer_chemprop_tpu.features.utils import (
            load_valid_atom_or_bond_features,
        )
        p = str(tmp_path / "desc.sdf")
        # a value wrapped across two physical lines concatenates (the
        # reference strips newlines before splitting on commas)
        self._write_sdf(p, [("CCO", {"charge": "0.1,0.\n2,0.3"})])
        feats = load_valid_atom_or_bond_features(p, ["CCO"])
        np.testing.assert_allclose(feats[0][:, 0], [0.1, 0.2, 0.3])
        with pytest.raises(ValueError):
            load_valid_atom_or_bond_features(p, ["CCN"])


class TestReferenceInit:
    """Reference-stream torch init (models/torch_init.py): deterministic,
    per-member distinct, and shaped for every model family."""

    def _cfg(self, **kw):
        from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=32,
                            depth=2)
        base = dict(encoder=enc, dataset_type="regression", num_tasks=1,
                    ffn_hidden_size=32)
        base.update(kw)
        return ModelConfig(**base)

    def test_deterministic_and_member_distinct(self):
        import numpy as np
        from polymer_chemprop_tpu.models.torch_init import (
            reference_init_params,
        )
        cfg = self._cfg()
        a = reference_init_params(cfg, 0, 0)
        b = reference_init_params(cfg, 0, 0)
        c = reference_init_params(cfg, 0, 1)
        d = reference_init_params(cfg, 1, 0)
        w = lambda p: p["encoders"][0]["W_i"]["w"]
        assert np.array_equal(w(a), w(b))
        assert not np.array_equal(w(a), w(c))  # next member, same stream
        assert not np.array_equal(w(a), w(d))  # different seed
        # biases start at zero (reference nn_utils.py:102-112)
        assert (a["encoders"][0]["W_o"]["b"] == 0).all()
        # xavier-normal scale sanity on W_h (fan 32+32)
        assert abs(float(np.std(a["encoders"][0]["W_h"]["w"]))
                   - (2 / 64) ** 0.5) < 0.01

    def test_shapes_all_families(self):
        from polymer_chemprop_tpu.models.torch_init import (
            reference_init_params,
        )
        # multiclass: output = tasks x classes
        cfg = self._cfg(dataset_type="multiclass", num_tasks=2,
                        multiclass_num_classes=3)
        p = reference_init_params(cfg, 0)
        assert p["ffn"][-1]["w"].shape[1] == 6
        # features_only consumes encoder RNG but emits no encoder params
        cfg = self._cfg(features_only=True, features_size=16,
                        use_input_features=True)
        p = reference_init_params(cfg, 0)
        assert "encoders" not in p and p["ffn"][0]["w"].shape[0] == 16
        # multi-molecule shared encoder: one stream draw, two references
        cfg = self._cfg(number_of_molecules=2, mpn_shared=True)
        p = reference_init_params(cfg, 0)
        import numpy as np
        assert np.array_equal(p["encoders"][0]["W_i"]["w"],
                              p["encoders"][1]["W_i"]["w"])
