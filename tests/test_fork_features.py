"""Tests for the fork-specific training-infrastructure features the
reference added on top of Chemprop 1.4.0 (SURVEY.md item 2): train_frac
subsampling, alternative optimizers/schedulers, config_path overrides,
target/data weights, class balance, save_smiles_splits, predetermined
folds."""

import json
import os
import pickle

import numpy as np
import pytest

from polymer_chemprop_tpu.config import TrainConfig, parse_train_args
from polymer_chemprop_tpu.data import get_data
from polymer_chemprop_tpu.train import cross_validate

DATA = os.path.join(os.path.dirname(__file__), "data")


def base(tmp, **kw):
    d = dict(data_path=os.path.join(DATA, "regression.csv"),
             dataset_type="regression", epochs=1, num_folds=1, seed=0,
             save_dir=tmp, quiet=True, max_data_size=120, num_workers=2)
    d.update(kw)
    return TrainConfig(**d)


class TestForkFeatures:
    def test_train_frac(self, tmp_path, caplog):
        cfg = base(str(tmp_path), train_frac=0.5, epochs=1)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)
        log = (tmp_path / "verbose.log").read_text()
        assert "train size = 48" in log  # 0.5 * 96

    @pytest.mark.parametrize("opt,sched", [("adamw", "noam"),
                                           ("sgd", "cosine"),
                                           ("adam", "constant"),
                                           ("adam", "exponential")])
    def test_optimizers_and_schedulers(self, tmp_path, opt, sched):
        cfg = base(str(tmp_path), optimizer=opt, scheduler=sched,
                   weight_decay=1e-4 if opt == "adamw" else 0.0)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_grad_clip(self, tmp_path):
        cfg = base(str(tmp_path), grad_clip=1.0)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_config_path_overrides_cli(self, tmp_path):
        """reference args.py:537-542: the JSON config OVERRIDES CLI flags."""
        cfg_json = tmp_path / "cfg.json"
        cfg_json.write_text(json.dumps({"hidden_size": 64, "depth": 2}))
        cfg = parse_train_args([
            "--data_path", os.path.join(DATA, "regression.csv"),
            "--hidden_size", "300",
            "--config_path", str(cfg_json)])
        assert cfg.hidden_size == 64 and cfg.depth == 2

    def test_target_weights(self, tmp_path):
        cfg = base(str(tmp_path), target_weights=[2.0])
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_data_weights(self, tmp_path):
        import csv as _csv
        wpath = tmp_path / "weights.csv"
        with open(wpath, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["weight"])
            for i in range(120):
                w.writerow([1.0 + (i % 3)])
        cfg = base(str(tmp_path / "run"), data_weights_path=str(wpath))
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_class_balance(self, tmp_path):
        cfg = TrainConfig(data_path=os.path.join(DATA, "classification.csv"),
                          dataset_type="classification", epochs=1, num_folds=1,
                          seed=0, save_dir=str(tmp_path), quiet=True,
                          class_balance=True, max_data_size=150, num_workers=2)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean) or np.isnan(mean)  # tiny subsets may degenerate

    def test_save_smiles_splits(self, tmp_path):
        cfg = base(str(tmp_path), save_smiles_splits=True)
        cross_validate(cfg)
        fold = tmp_path / "fold_0"
        for name in ("train_smiles.csv", "val_smiles.csv", "test_smiles.csv",
                     "train_full.csv", "split_indices.pckl"):
            assert (fold / name).exists(), name
        with open(fold / "split_indices.pckl", "rb") as f:
            splits = pickle.load(f)
        assert len(splits) == 3 and sum(len(s) for s in splits) == 120

    def test_predetermined_split(self, tmp_path):
        folds_file = tmp_path / "folds.pckl"
        idx = list(range(120))
        with open(folds_file, "wb") as f:
            pickle.dump([idx[:40], idx[40:80], idx[80:]], f)
        cfg = base(str(tmp_path / "run"), split_type="predetermined",
                   folds_file=str(folds_file), test_fold_index=2,
                   val_fold_index=1)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_index_predetermined_split(self, tmp_path):
        from polymer_chemprop_tpu.data import split_data
        data = get_data(os.path.join(DATA, "regression.csv"),
                        max_data_size=60)
        sets = [[list(range(0, 40)), list(range(40, 50)),
                 list(range(50, 60))]]
        tr, va, te = split_data(data, "index_predetermined", (0.8, 0.1, 0.1),
                                seed=0, crossval_index_sets=sets)
        assert len(tr) == 40 and len(va) == 10 and len(te) == 10

    def test_undirected_and_atom_messages(self, tmp_path):
        for flags in ({"undirected": True}, {"atom_messages": True}):
            cfg = base(str(tmp_path / str(sorted(flags))), **flags)
            mean, _ = cross_validate(cfg)
            assert np.isfinite(mean)

    def test_aggregation_variants(self, tmp_path):
        for agg in ("sum", "norm"):
            cfg = base(str(tmp_path / agg), aggregation=agg)
            mean, _ = cross_validate(cfg)
            assert np.isfinite(mean)

    def test_bias_and_activations(self, tmp_path):
        for actv in ("LeakyReLU", "tanh", "ELU"):
            cfg = base(str(tmp_path / actv), activation=actv, bias=True)
            mean, _ = cross_validate(cfg)
            assert np.isfinite(mean)

    def test_parallel_hyperopt_instances_share_trials(self, tmp_path):
        """Two hyperopt() calls with a shared trial directory coordinate
        through trial files + the seed file (reference hyperopt_utils)."""
        from polymer_chemprop_tpu.hyperparameter_optimization import (
            hyperopt, load_trials)
        shared = str(tmp_path / "trials")
        cfg1 = base(str(tmp_path / "a"), epochs=1, max_data_size=24)
        hyperopt(cfg1, num_iters=2, hyperopt_checkpoint_dir=shared)
        assert len(load_trials(shared)) == 2
        cfg2 = base(str(tmp_path / "b"), epochs=1, max_data_size=24)
        hyperopt(cfg2, num_iters=3, hyperopt_checkpoint_dir=shared)
        trials = load_trials(shared)
        assert len(trials) == 3  # second instance saw 2, ran 1 more
        seeds = (tmp_path / "trials" / "hyperopt_seeds.txt").read_text().split()
        assert len(set(seeds)) == len(seeds)  # unique seeds

    def test_index_predetermined_via_trainer(self, tmp_path):
        import pickle
        sets = [[list(range(0, 80)), list(range(80, 100)),
                 list(range(100, 120))]]
        idx_file = tmp_path / "sets.pckl"
        with open(idx_file, "wb") as f:
            pickle.dump(sets, f)
        cfg = base(str(tmp_path / "run"), split_type="index_predetermined",
                   crossval_index_file=str(idx_file))
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)


class TestTensorBoard:
    def test_event_files_written(self, tmp_path):
        from tests.test_integration import train_cfg
        from polymer_chemprop_tpu.train.cross_validate import cross_validate
        cfg = train_cfg(str(tmp_path), epochs=1, tensorboard=True,
                        max_data_size=30)
        cross_validate(cfg)
        events = [f for root, _, fs in os.walk(tmp_path) for f in fs
                  if f.startswith("events.out.tfevents")]
        assert events, "no TensorBoard event files written"


class TestShowIndividualScores:
    def test_per_task_scores_logged(self, tmp_path):
        from tests.test_integration import train_cfg
        cfg = train_cfg(str(tmp_path), epochs=1, max_data_size=50,
                        data_path=os.path.join(
                            os.path.dirname(__file__), "data",
                            "classification.csv"),
                        dataset_type="classification",
                        show_individual_scores=True, quiet=False)
        from polymer_chemprop_tpu.train.cross_validate import cross_validate
        mean, _ = cross_validate(cfg)
        log = os.path.join(tmp_path, "verbose.log")
        assert os.path.exists(log)
        text = open(log).read()
        assert "Overall test" in text
        # per-task lines appear with real task names from the CSV header
        assert text.count("==> test") > cfg.num_folds


class TestUntestedTrainerPaths:
    """Covers reference paths previously untested here: features_only
    (mpn.py:201-202,269-270), separate_val_path/separate_test_path
    (run_training.py:57-75), and save_preds (run_training.py:493-497)."""

    def test_features_only(self, tmp_path):
        cfg = base(str(tmp_path), features_only=True,
                   features_generator=["morgan"])
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)

    def test_separate_val_and_test_paths(self, tmp_path):
        import csv as _csv
        src = os.path.join(DATA, "regression.csv")
        rows = list(_csv.reader(open(src)))
        header, body = rows[0], rows[1:]
        for name, chunk in (("val.csv", body[100:130]),
                            ("test.csv", body[130:160])):
            with open(tmp_path / name, "w", newline="") as f:
                w = _csv.writer(f)
                w.writerow(header)
                w.writerows(chunk)
        cfg = base(str(tmp_path / "run"),
                   separate_val_path=str(tmp_path / "val.csv"),
                   separate_test_path=str(tmp_path / "test.csv"))
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)
        log = (tmp_path / "run" / "verbose.log").read_text()
        # all 120 train rows kept (no split), exact separate sizes used
        assert "val size = 30" in log and "test size = 30" in log

    def test_save_preds(self, tmp_path):
        import csv as _csv
        cfg = base(str(tmp_path), save_preds=True)
        mean, _ = cross_validate(cfg)
        assert np.isfinite(mean)
        path = tmp_path / "fold_0" / "test_preds.csv"
        assert path.exists()
        rows = list(_csv.DictReader(open(path)))
        assert rows and all(np.isfinite(float(r["pred_0"])) for r in rows)


class TestBatchDescriptorIngest:
    """The live rdkit_2d(_normalized) data path batches the native
    descriptor engine (VERDICT r4 item 2): get_data makes ONE
    multi-threaded rdkit2d_batch_native call and the per-datapoint
    generator invocations serve from its cache — bit-identical to the
    per-molecule path, and the skip_invalid validation reuses the native
    parse verdicts."""

    def _per_mol(self, monkeypatch, *args, **kw):
        """get_data with the batch precompute disabled (per-mol path)."""
        import polymer_chemprop_tpu.features.generators as G
        G._PRECOMPUTED_RDKIT2D.clear()
        G._PRECOMPUTED_RDKIT2D_NORM.clear()
        monkeypatch.setattr(G, "precompute_rdkit2d_batch",
                            lambda *a, **k: 0)
        try:
            return get_data(*args, **kw)
        finally:
            monkeypatch.undo()
            G._PRECOMPUTED_RDKIT2D.clear()
            G._PRECOMPUTED_RDKIT2D_NORM.clear()

    @pytest.mark.parametrize("gen", ["rdkit_2d", "rdkit_2d_normalized"])
    def test_batch_equals_per_mol(self, monkeypatch, gen):
        import polymer_chemprop_tpu.features.generators as G
        from polymer_chemprop_tpu import native_ext
        if not native_ext.rdkit2d_available():
            pytest.skip("native descriptor engine not built")
        path = os.path.join(DATA, "regression.csv")
        G._PRECOMPUTED_RDKIT2D.clear()
        G._PRECOMPUTED_RDKIT2D_NORM.clear()
        batched = get_data(path, features_generators=[gen],
                           max_data_size=60)
        assert len(G._PRECOMPUTED_RDKIT2D) > 0  # precompute actually ran
        per_mol = self._per_mol(monkeypatch, path,
                                features_generators=[gen],
                                max_data_size=60)
        fb = np.stack([d.features for d in batched])
        fp = np.stack([d.features for d in per_mol])
        assert np.array_equal(fb, fp)  # bit-identical

    def test_native_parse_matches_python_validation(self, tmp_path):
        """The skip_invalid shortcut rests on native-ok == parseable;
        pin it on valid fixtures + malformed strings."""
        import csv as _csv

        from polymer_chemprop_tpu import native_ext
        from polymer_chemprop_tpu.chem import parse_smiles
        if not native_ext.rdkit2d_available():
            pytest.skip("native descriptor engine not built")
        with open(os.path.join(DATA, "regression.csv")) as f:
            r = _csv.reader(f)
            next(r)
            smiles = [row[0] for row in r][:80]
        bad = ["C(", "xyz", "C1CC", "[Zz]", "c1ccc1", "C)C", "C=(C)",
               "C%99C"]
        _, ok = native_ext.rdkit2d_batch_native(smiles + bad, n_threads=2)
        for s, o in zip(smiles + bad, ok):
            assert bool(o) == (parse_smiles(s, strict=False) is not None), s

    def test_invalid_rows_still_dropped(self, tmp_path):
        from polymer_chemprop_tpu import native_ext
        if not native_ext.rdkit2d_available():
            pytest.skip("native descriptor engine not built")
        p = tmp_path / "mix.csv"
        p.write_text("smiles,y\nCCO,1.0\nnot_a_smiles,2.0\nc1ccccc1,3.0\n")
        data = get_data(str(p), features_generators=["rdkit_2d"])
        assert len(data) == 2
        assert [d.smiles for d in data] == [["CCO"], ["c1ccccc1"]]
