"""SSL pretraining tests: two-stage pretraining runs, produces a loadable
checkpoint, and --checkpoint_frzn transfer into supervised training works
(the reference's SSL scripts are untested research code, SURVEY.md §2.7)."""

import os

import numpy as np
import pytest

from polymer_chemprop_tpu.config import TrainConfig
from polymer_chemprop_tpu.ssl import SSLConfig, ssl_pretrain
from polymer_chemprop_tpu.train import cross_validate
from polymer_chemprop_tpu.utils.checkpoint import load_checkpoint


@pytest.fixture(scope="module")
def polymer_csv(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ssl")
    rng = np.random.default_rng(0)
    rows = ["smiles,target"]
    monomers = ["[*:1]CC[*:2]", "[*:1]c1ccc([*:2])cc1", "[*:1]CO[*:2]",
                "[*:1]C(C)C[*:2]"]
    for _ in range(40):
        m1, m2 = rng.choice(monomers, 2, replace=False)
        m2 = m2.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        w = rng.choice([0.25, 0.5, 0.75])
        s = (f"{m1}.{m2}|{w}|{1 - w}|<1-3:0.5:0.5<2-4:0.5:0.5"
             f"~{rng.integers(2, 100)}")
        rows.append(f'"{s}",{rng.normal():.4f}')
    path = tmp / "polymer.csv"
    path.write_text("\n".join(rows))
    return str(path)


class TestSSL:
    def test_pretrain_and_transfer(self, polymer_csv, tmp_path):
        cfg = SSLConfig(data_path=polymer_csv, save_dir=str(tmp_path),
                        hidden_size=32, depth=2, epochs_stage1=2,
                        epochs_stage2=2, batch_size=10, quiet=True,
                        transfer_strategy="b")
        ckpt = ssl_pretrain(cfg)
        assert os.path.exists(ckpt)
        params, meta, _, _ = load_checkpoint(ckpt)
        assert "encoders" in params and "ffn" in params
        assert params["encoders"][0]["W_h"]["w"].shape == (32, 32)

        # downstream supervised training with frozen pretrained encoder
        tcfg = TrainConfig(data_path=polymer_csv, dataset_type="regression",
                           polymer=True, epochs=2, num_folds=1,
                           hidden_size=32, depth=2, ffn_hidden_size=32,
                           checkpoint_frzn=ckpt, frzn_encoder=True, batch_size=10,
                           save_dir=str(tmp_path / "downstream"), quiet=True)
        mean, _ = cross_validate(tcfg)
        assert np.isfinite(mean)

        # encoder weights must be frozen: compare trained checkpoint
        trained, _, _, _ = load_checkpoint(
            str(tmp_path / "downstream" / "fold_0" / "model_0" /
                "best_model.ckpt"))
        np.testing.assert_array_equal(
            trained["encoders"][0]["W_h"]["w"],
            params["encoders"][0]["W_h"]["w"])


def test_checkpoint_frzn_without_frzn_encoder_warm_starts(tmp_path):
    """Fork semantics (reference run_training.py:277-288): checkpoint_frzn
    without --frzn_encoder loads the weights but leaves them TRAINABLE."""
    import numpy as np
    from polymer_chemprop_tpu.config import TrainConfig
    from polymer_chemprop_tpu.train import cross_validate
    from polymer_chemprop_tpu.utils.checkpoint import load_checkpoint
    import os
    data = os.path.join(os.path.dirname(__file__), "data", "regression.csv")
    base = TrainConfig(data_path=data, dataset_type="regression", epochs=1,
                       num_folds=1, hidden_size=32, depth=2,
                       ffn_hidden_size=32, max_data_size=60, batch_size=10,
                       save_dir=str(tmp_path / "teacher"), quiet=True)
    cross_validate(base)
    ckpt = str(tmp_path / "teacher" / "fold_0" / "model_0" /
               "best_model.ckpt")
    teacher, _, _, _ = load_checkpoint(ckpt)

    student_cfg = TrainConfig(data_path=data, dataset_type="regression",
                              epochs=2, num_folds=1, hidden_size=32, depth=2,
                              ffn_hidden_size=32, max_data_size=60,
                              batch_size=10, checkpoint_frzn=ckpt,
                              save_dir=str(tmp_path / "student"), quiet=True)
    cross_validate(student_cfg)
    student, _, _, _ = load_checkpoint(
        str(tmp_path / "student" / "fold_0" / "model_0" / "best_model.ckpt"))
    # weights must have MOVED (trainable), not stayed identical (frozen)
    assert not np.array_equal(student["encoders"][0]["W_h"]["w"],
                              teacher["encoders"][0]["W_h"]["w"])


def test_ssl_full_option_surface(tmp_path):
    """min_mask, val-split early stopping, pretrain_frac, weight decay,
    stage-2 LR, and graph-embedding export all run end-to-end
    (reference ssl_two_stage_V5_C.py:733-766 CLI surface)."""
    import os
    import numpy as np
    from polymer_chemprop_tpu.ssl import SSLConfig, ssl_pretrain
    data = os.path.join(os.path.dirname(__file__), "data", "regression.csv")
    cfg = SSLConfig(data_path=data, save_dir=str(tmp_path), polymer=False,
                    hidden_size=32, depth=2, epochs_stage1=2,
                    epochs_stage2=2, batch_size=10, max_data_size=50,
                    min_mask=2, val_frac=0.2, pretrain_frac=0.8,
                    weight_decay=1e-5, lr_graph=5e-4, dropout=0.1,
                    save_graph_embeddings=True, quiet=True)
    ckpt = ssl_pretrain(cfg)
    assert os.path.exists(ckpt)
    emb = np.load(tmp_path / "ssl_graph_embeddings.npy")
    # 50 * 0.8 = 40 pretrain mols minus 20% val = 32
    assert emb.shape == (32, 32) and np.isfinite(emb).all()


def test_ssl_enhanced_mode(tmp_path):
    """use_enhanced_ssl: weighted edge loss, warmup+cosine LR, and
    stochastic inter-monomer edge perturbation (ssl_enhancements.py)."""
    import os
    from polymer_chemprop_tpu.ssl import SSLConfig, ssl_pretrain
    poly = tmp_path / "poly.csv"
    import numpy as np
    rng = np.random.default_rng(0)
    rows = ["smiles,target"]
    mons = ["[*:1]CC[*:2]", "[*:1]CO[*:2]", "[*:1]c1ccc([*:2])cc1"]
    for _ in range(30):
        m1, m2 = rng.choice(mons, 2, replace=False)
        m2 = m2.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        rows.append(f'"{m1}.{m2}|0.5|0.5|<1-3:0.5:0.5<2-4:0.5:0.5~10",0')
    poly.write_text("\n".join(rows))
    cfg = SSLConfig(data_path=str(poly), save_dir=str(tmp_path),
                    polymer=True, hidden_size=32, depth=2, epochs_stage1=2,
                    epochs_stage2=2, batch_size=10, use_enhanced_ssl=True,
                    quiet=True)
    ckpt = ssl_pretrain(cfg)
    assert os.path.exists(ckpt)
