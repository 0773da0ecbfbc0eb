"""Smoke tests for the standalone utility scripts (reference scripts/,
SURVEY.md §2.6) — run each multi-command tool end-to-end on fixture data."""

import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")
REG = os.path.join(DATA, "regression.csv")
CLS = os.path.join(DATA, "classification.csv")


def run(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


class TestDataUtils:
    def test_avg_dups(self, tmp_path):
        out = str(tmp_path / "avg.csv")
        run("data_utils.py", "avg_dups", "--data_path", REG,
            "--save_path", out)
        assert os.path.exists(out)

    def test_sanitize(self, tmp_path):
        out = str(tmp_path / "clean.csv")
        run("data_utils.py", "sanitize", "--data_path", REG,
            "--save_path", out)
        assert sum(1 for _ in open(out)) > 1

    def test_class_balance(self):
        assert run("data_utils.py", "class_balance", "--data_path", CLS)

    def test_overlap(self):
        out = run("data_utils.py", "overlap", "--data_path_1", REG,
                  "--data_path_2", REG)
        assert out

    def test_split_data(self, tmp_path):
        run("data_utils.py", "split_data", "--data_path", REG,
            "--save_dir", str(tmp_path), "--split_type", "random")
        assert (tmp_path / "train.csv").exists()

    def test_create_crossval_splits(self, tmp_path):
        run("data_utils.py", "create_crossval_splits", "--data_path", REG,
            "--save_dir", str(tmp_path), "--split_type", "scaffold",
            "--num_folds", "3")
        folds = pickle.load(open(tmp_path / "folds.pckl", "rb"))
        assert len(folds) == 3 and sum(len(f) for f in folds) > 0

    def test_create_crossval_index_files(self, tmp_path):
        run("data_utils.py", "create_crossval_index_files",
            "--save_dir", str(tmp_path), "--num_folds", "4",
            "--test_folds_to_test", "2", "--val_folds_per_test", "2")
        pkls = [f for f in os.listdir(tmp_path) if f.endswith("_test.pkl")]
        assert len(pkls) == 2
        sets = pickle.load(open(tmp_path / pkls[0], "rb"))
        # each trial is [train_folds, [val_fold], [test_fold]]
        assert all(len(s) == 3 and len(s[0]) == 2 for s in sets)

    def test_examine_split_balance(self):
        assert "random" in run("data_utils.py", "examine_split_balance",
                               "--data_path", REG)


class TestAnalysisUtils:
    def test_similarity(self):
        out = run("analysis_utils.py", "similarity",
                  "--data_path_1", REG, "--data_path_2", CLS)
        assert out

    def test_find_similar_mols(self, tmp_path):
        out = str(tmp_path / "sim.csv")
        run("analysis_utils.py", "find_similar_mols", "--test_path", CLS,
            "--train_path", REG, "--save_path", out)
        assert os.path.exists(out)

    def test_welchs(self, tmp_path):
        for name, scores in (("a", [1.0, 1.1, 0.9]), ("b", [2.0, 2.1, 1.9])):
            d = tmp_path / name
            d.mkdir()
            with open(d / "test_scores.csv", "w") as f:
                f.write("Task,Mean,Std,Fold 0,Fold 1,Fold 2\n")
                f.write("y,%f,0.1,%f,%f,%f\n"
                        % (sum(scores) / 3, *scores))
        out = run("analysis_utils.py", "welchs",
                  "--results_a", str(tmp_path / "a"),
                  "--results_b", str(tmp_path / "b"))
        assert out


class TestSaveFeatures:
    def test_save_features_restartable(self, tmp_path):
        out = str(tmp_path / "feats.npz")
        run("save_features.py", "--data_path", REG, "--save_path", out,
            "--features_generator", "morgan", "--restart")
        import numpy as np
        from polymer_chemprop_tpu.features.utils import load_features
        feats = np.asarray(load_features(out))
        assert feats.shape[1] == 2048


class TestDepictScript:
    def test_depict_subcommand(self, tmp_path):
        out = run("analysis_utils.py", "depict", "--data_path", REG,
                  "--save_dir", str(tmp_path / "svgs"), "--max_mols", "5")
        assert "wrote 5/5" in out
        svgs = sorted(os.listdir(tmp_path / "svgs"))
        assert len(svgs) == 5
        with open(tmp_path / "svgs" / svgs[0]) as fh:
            assert "<svg" in fh.read()
