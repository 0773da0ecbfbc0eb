"""Reference (torch .pt) checkpoint interop: import all three reference
checkpoint shapes (inference / weights-only / SSL model_state_dict,
reference utils.py:47-73, 94-95; ssl_two_stage_V5_C.py:1031-1035),
transparent dispatch through utils.checkpoint.load_checkpoint, prediction
parity against an independent oracle using the imported weights, and the
export round trip."""

import os

import numpy as np
import pytest
import torch

import jax

from polymer_chemprop_tpu.config import PredictConfig, TrainConfig
from polymer_chemprop_tpu.features import FeaturizationConfig, mol2graph
from polymer_chemprop_tpu.models import ModelConfig, init_model
from polymer_chemprop_tpu.train.make_predictions import make_predictions
from polymer_chemprop_tpu.train.trainer import _load_frzn_into, build_model_config
from polymer_chemprop_tpu.utils.checkpoint import load_checkpoint
from polymer_chemprop_tpu.utils.torch_import import (
    export_reference_checkpoint,
    import_reference_checkpoint,
    state_dict_to_params,
)

from test_encoder import reference_forward

ATOM_FDIM, BOND_FDIM = 133, 147
HIDDEN = 16
SMILES = [["CCO"], ["c1ccccc1"], ["CC(C)=CCCC(C)=CC(=O)"], ["CCN"]]


def _reference_state_dict(hidden=HIDDEN, ffn_dims=((HIDDEN, HIDDEN),
                                                   (HIDDEN, 1)),
                          n_enc=1, seed=0):
    """A state dict with the reference's exact parameter naming
    (mpn.py:48-64, model.py:79-100, utils.py key layout)."""
    g = torch.Generator().manual_seed(seed)

    def rnd(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    sd = {}
    for i in range(n_enc):
        p = f"encoder.encoder.{i}."
        sd[p + "W_i.weight"] = rnd(hidden, BOND_FDIM)
        sd[p + "W_h.weight"] = rnd(hidden, hidden)
        sd[p + "W_o.weight"] = rnd(hidden, ATOM_FDIM + hidden)
        sd[p + "W_o.bias"] = rnd(hidden)
        sd[p + "cached_zero_vector"] = torch.zeros(hidden)
    for k, (i, o) in enumerate(ffn_dims):
        sd[f"ffn.{3 * k + 1}.weight"] = rnd(o, i)
        sd[f"ffn.{3 * k + 1}.bias"] = rnd(o)
    return sd


def _reference_args(**over):
    args = {
        "dataset_type": "regression", "hidden_size": HIDDEN, "depth": 3,
        "dropout": 0.0, "activation": "ReLU", "aggregation": "mean",
        "aggregation_norm": 100, "bias": False, "undirected": False,
        "atom_messages": False, "ffn_num_layers": 2,
        "ffn_hidden_size": HIDDEN, "number_of_molecules": 1,
        "polymer": False, "reaction": False, "explicit_h": False,
        "adding_h": False, "task_names": ["target"],
        "data_path": "/nonexistent/train.csv", "batch_size": 50,
        "no_features_scaling": False, "epochs": 10, "seed": 0,
    }
    args.update(over)
    return args


class TestImport:
    def test_state_dict_conversion_shapes(self):
        sd = _reference_state_dict()
        params = state_dict_to_params(sd)
        enc = params["encoders"][0]
        # torch (out, in) -> ours (in, out)
        assert enc["W_i"]["w"].shape == (BOND_FDIM, HIDDEN)
        assert enc["W_h"]["w"].shape == (HIDDEN, HIDDEN)
        assert enc["W_o"]["w"].shape == (ATOM_FDIM + HIDDEN, HIDDEN)
        assert enc["W_o"]["b"].shape == (HIDDEN,)
        assert "cached_zero_vector" not in enc
        assert [l["w"].shape for l in params["ffn"]] == [
            (HIDDEN, HIDDEN), (HIDDEN, 1)]
        np.testing.assert_allclose(
            params["encoders"][0]["W_i"]["w"],
            sd["encoder.encoder.0.W_i.weight"].numpy().T)

    def test_multi_molecule_encoders(self, tmp_path):
        """number_of_molecules=2 checkpoints: one encoder per position
        (reference mpn.py:204-208), FFN input 2*hidden."""
        sd = _reference_state_dict(n_enc=2,
                                   ffn_dims=((2 * HIDDEN, HIDDEN),
                                             (HIDDEN, 1)))
        path = str(tmp_path / "two.pt")
        torch.save({"args": _reference_args(number_of_molecules=2),
                    "state_dict": sd, "data_scaler": None}, path)
        params, cfg, _, _ = import_reference_checkpoint(path)
        assert len(params["encoders"]) == 2
        np.testing.assert_allclose(
            params["encoders"][1]["W_h"]["w"],
            sd["encoder.encoder.1.W_h.weight"].numpy().T)
        assert params["ffn"][0]["w"].shape == (2 * HIDDEN, HIDDEN)
        assert cfg["number_of_molecules"] == 2

    def test_legacy_unindexed_encoder_names(self):
        # reference utils.py:109-113 renames encoder.encoder.W_* -> .0.W_*
        sd = {k.replace("encoder.encoder.0.", "encoder.encoder."): v
              for k, v in _reference_state_dict().items()}
        params = state_dict_to_params(sd)
        assert len(params["encoders"]) == 1
        assert params["encoders"][0]["W_i"]["w"].shape == (BOND_FDIM, HIDDEN)

    def test_ssl_model_state_dict(self, tmp_path):
        # SSL script naming (ssl_two_stage_V5_C.py:155-161) inside the
        # {'model_state_dict': ...} wrapper, plus heads that must be skipped
        g = torch.Generator().manual_seed(1)
        sd = {
            "W_initial.weight": torch.randn(HIDDEN, BOND_FDIM, generator=g),
            "W_message.weight": torch.randn(HIDDEN, HIDDEN, generator=g),
            "W_message.bias": torch.randn(HIDDEN, generator=g),
            "W_node.weight": torch.randn(HIDDEN, ATOM_FDIM + HIDDEN,
                                         generator=g),
            "W_node.bias": torch.randn(HIDDEN, generator=g),
            "node_head.0.weight": torch.randn(4, HIDDEN, generator=g),
        }
        path = str(tmp_path / "ssl.pt")
        torch.save({"model_state_dict": sd, "epoch": 7}, path)
        params, cfg, scalers, epoch = import_reference_checkpoint(path)
        assert cfg is None and scalers == {} and epoch == 7
        enc = params["encoders"][0]
        assert set(enc) == {"W_i", "W_h", "W_o"}
        assert enc["W_h"]["b"].shape == (HIDDEN,)
        assert "ffn" not in params

    def test_frzn_merge_from_pt(self, tmp_path):
        # --checkpoint_frzn pointing at a reference weights-only .pt
        sd = _reference_state_dict(seed=3)
        path = str(tmp_path / "frzn.pt")
        torch.save({"state_dict": sd}, path)
        tcfg = TrainConfig(dataset_type="regression", hidden_size=HIDDEN,
                           ffn_hidden_size=HIDDEN, checkpoint_frzn=path)
        mcfg = build_model_config(tcfg, num_tasks=1)
        params = init_model(jax.random.PRNGKey(0), mcfg)
        merged = _load_frzn_into(params, path, tcfg)
        np.testing.assert_allclose(
            np.asarray(merged["encoders"][0]["W_i"]["w"]),
            sd["encoder.encoder.0.W_i.weight"].numpy().T, rtol=1e-6)
        # FFN untouched (frzn_ffn_layers == 0)
        np.testing.assert_allclose(np.asarray(merged["ffn"][0]["w"]),
                                   np.asarray(params["ffn"][0]["w"]))


class TestEndToEnd:
    def test_predict_from_reference_checkpoint(self, tmp_path):
        """make_predictions driven directly by a reference .pt file must
        reproduce the oracle forward with the imported weights, including
        the imported target scaler."""
        sd = _reference_state_dict()
        means, stds = [1.5], [2.0]
        path = str(tmp_path / "best_model_full.pt")
        torch.save({
            "args": _reference_args(),
            "state_dict": sd,
            "data_scaler": {"means": means, "stds": stds},
            "features_scaler": None,
            "atom_descriptor_scaler": None,
            "bond_feature_scaler": None,
        }, path)

        preds = np.asarray(make_predictions(
            PredictConfig(checkpoint_path=path,
                          preds_path=str(tmp_path / "p.csv")),
            smiles=SMILES), float)

        # oracle: dense-gather reference math + FFN + inverse scaling
        params, cfg_dict, scalers, _ = load_checkpoint(path)
        gb = mol2graph([s[0] for s in SMILES], FeaturizationConfig())
        emb = reference_forward(params["encoders"][0], gb, depth=3)
        emb = emb[:len(SMILES)]
        f0, f1 = params["ffn"]
        out = np.maximum(emb @ f0["w"] + f0["b"], 0) @ f1["w"] + f1["b"]
        expected = out * stds[0] + means[0]
        np.testing.assert_allclose(preds, expected, rtol=2e-4, atol=2e-4)

    def test_checkpoint_dir_walk_finds_pt(self, tmp_path):
        sd = _reference_state_dict()
        d = tmp_path / "fold_0"
        d.mkdir()
        torch.save({"args": _reference_args(), "state_dict": sd,
                    "data_scaler": None, "features_scaler": None},
                   str(d / "model.pt"))
        preds = make_predictions(
            PredictConfig(checkpoint_dir=str(tmp_path),
                          preds_path=str(tmp_path / "p.csv")),
            smiles=SMILES[:2])
        assert np.isfinite(np.asarray(preds, float)).all()

    def test_walk_prefers_best_model_full(self, tmp_path):
        """A reference fold dir holds best_model_full.pt (args + best
        weights) next to per-epoch resume files (model_state_dict, no
        args, reference run_training.py:404-421); the walk must use only
        the former."""
        from polymer_chemprop_tpu.config import find_checkpoints
        d = tmp_path / "fold_0"
        d.mkdir()
        torch.save({"model_state_dict": _reference_state_dict(seed=9),
                    "epoch": 3}, str(d / "model.pt"))
        torch.save({"model_state_dict": _reference_state_dict(seed=9),
                    "epoch": 3}, str(d / "best_resume_checkpoint.pt"))
        torch.save({"args": _reference_args(),
                    "state_dict": _reference_state_dict(),
                    "data_scaler": None},
                   str(d / "best_model_full.pt"))
        found = find_checkpoints(checkpoint_dir=str(tmp_path))
        assert [os.path.basename(p) for p in found] == ["best_model_full.pt"]
        preds = make_predictions(
            PredictConfig(checkpoint_dir=str(tmp_path),
                          preds_path=str(tmp_path / "p.csv")),
            smiles=SMILES[:2])
        assert np.isfinite(np.asarray(preds, float)).all()

    def test_weights_only_predict_clear_error(self, tmp_path):
        path = str(tmp_path / "ssl.pt")
        torch.save({"state_dict": _reference_state_dict()}, path)
        with pytest.raises(ValueError, match="weights-only"):
            make_predictions(
                PredictConfig(checkpoint_path=path,
                              preds_path=str(tmp_path / "p.csv")),
                smiles=SMILES[:2])

    def test_opt_state_none_for_pt(self, tmp_path):
        from polymer_chemprop_tpu.utils.checkpoint import load_opt_state
        path = str(tmp_path / "legacy.pt")
        torch.save({"state_dict": _reference_state_dict()}, path,
                   _use_new_zipfile_serialization=False)
        assert load_opt_state(path, {"dummy": np.zeros(1)}) is None

    def test_task_count_fallback_from_ffn_shape(self, tmp_path):
        """args dicts from tap versions that drop the task_names property
        must still predict the full multi-task width."""
        args = _reference_args()
        del args["task_names"]
        path = str(tmp_path / "best_model_full.pt")
        torch.save({"args": args,
                    "state_dict": _reference_state_dict(
                        ffn_dims=((HIDDEN, HIDDEN), (HIDDEN, 3))),
                    "data_scaler": None}, path)
        preds = np.asarray(make_predictions(
            PredictConfig(checkpoint_path=path,
                          preds_path=str(tmp_path / "p.csv")),
            smiles=SMILES[:2]), float)
        assert preds.shape == (2, 3)


class TestWarmStart:
    def test_merge_matching_partial(self):
        from polymer_chemprop_tpu.train.trainer import _merge_matching
        dst = {"encoders": [{"W_i": {"w": np.zeros((10, 4))},
                             "W_h": {"w": np.zeros((4, 4))}}],
               "ffn": [{"w": np.zeros((4, 1)), "b": np.zeros(1)}]}
        src = {"encoders": [{"W_i": {"w": np.ones((10, 4))},
                             "W_h": {"w": np.ones((8, 8))}}]}  # wrong shape
        merged, used, skipped = _merge_matching(dst, src)
        assert used == 1 and skipped == 3
        np.testing.assert_array_equal(merged["encoders"][0]["W_i"]["w"], 1.0)
        np.testing.assert_array_equal(merged["encoders"][0]["W_h"]["w"], 0.0)
        np.testing.assert_array_equal(merged["ffn"][0]["w"], 0.0)

    def test_train_warm_start_from_mismatched_pt(self, tmp_path):
        """--checkpoint_paths with a reference .pt of a different hidden
        size must warm-start what fits and train the rest fresh
        (reference utils.py:116-130 partial load)."""
        from polymer_chemprop_tpu.train.cross_validate import cross_validate
        warm = str(tmp_path / "w.pt")
        torch.save({"state_dict": _reference_state_dict(hidden=8,
                    ffn_dims=((8, 8), (8, 1)))}, warm)
        cfg = TrainConfig(
            data_path=os.path.join(os.path.dirname(__file__), "data",
                                   "regression.csv"),
            dataset_type="regression", epochs=1, num_folds=1,
            max_data_size=40, hidden_size=HIDDEN, ffn_hidden_size=HIDDEN,
            checkpoint_paths=[warm], save_dir=str(tmp_path / "run"),
            quiet=True)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)


class TestExport:
    def test_export_import_roundtrip(self, tmp_path):
        tcfg = TrainConfig(dataset_type="regression", hidden_size=HIDDEN,
                           ffn_hidden_size=HIDDEN)
        mcfg = build_model_config(tcfg, num_tasks=2)
        params = init_model(jax.random.PRNGKey(42), mcfg)
        path = str(tmp_path / "exported.pt")
        export_reference_checkpoint(path, jax.tree_util.tree_map(
            np.asarray, params), tcfg.to_dict())

        raw = torch.load(path, weights_only=False)
        assert "encoder.encoder.0.W_i.weight" in raw["state_dict"]
        assert raw["state_dict"]["encoder.encoder.0.W_i.weight"].shape == \
            (HIDDEN, BOND_FDIM)
        assert "ffn.1.weight" in raw["state_dict"]
        assert "ffn.4.weight" in raw["state_dict"]

        params2, cfg2, _, _ = load_checkpoint(path)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
        assert cfg2["hidden_size"] == HIDDEN
