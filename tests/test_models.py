

class TestPureJaxInit:
    """Distributional characterization of the --no_reference_init path
    (VERDICT r2 item 8): the pure-JAX init must match the reference's
    Xavier-normal statistics (nn_utils.py:102-112) — fan-based scale on
    every matrix, zero biases — so users without torch know exactly what
    they get (the measured golden band for this path is documented in
    docs/parity.md "Pure-JAX init band")."""

    def test_xavier_scale_and_zero_biases(self):
        import jax
        import numpy as np
        from polymer_chemprop_tpu.models import (
            EncoderConfig, ModelConfig, init_model,
        )
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147,
                            hidden_size=300, depth=3)
        cfg = ModelConfig(encoder=enc, dataset_type="regression",
                          num_tasks=1, ffn_hidden_size=300)
        params = init_model(jax.random.PRNGKey(0), cfg)

        def walk(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    yield from walk(v, f"{prefix}/{k}")
            elif isinstance(tree, (list, tuple)):
                for i, v in enumerate(tree):
                    yield from walk(v, f"{prefix}[{i}]")
            else:
                yield prefix, np.asarray(tree)

        n_mats = n_biases = 0
        for name, arr in walk(params):
            if arr.ndim == 2:
                n_mats += 1
                fan_in, fan_out = arr.shape
                expected = (2.0 / (fan_in + fan_out)) ** 0.5
                # ~N(0, std): the sample std of fan_in*fan_out draws must
                # sit within 5 sigma-of-the-std of the expectation
                tol = 5 * expected / (2 * arr.size) ** 0.5
                assert abs(arr.std() - expected) < max(tol, 0.02 * expected), \
                    (name, arr.std(), expected)
                assert abs(arr.mean()) < 5 * expected / arr.size ** 0.5, name
            elif arr.ndim == 1:
                n_biases += 1
                assert np.all(arr == 0.0), name
        assert n_mats >= 4 and n_biases >= 2

    def test_seeds_give_distinct_draws(self):
        import jax
        import numpy as np
        from polymer_chemprop_tpu.models import (
            EncoderConfig, ModelConfig, init_model,
        )
        enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16,
                            depth=2)
        cfg = ModelConfig(encoder=enc, dataset_type="regression",
                          num_tasks=1, ffn_hidden_size=16)
        a = init_model(jax.random.PRNGKey(0), cfg)
        b = init_model(jax.random.PRNGKey(1), cfg)
        c = init_model(jax.random.PRNGKey(0), cfg)
        la, lb, lc = (jax.tree_util.tree_leaves(t) for t in (a, b, c))
        assert any(not np.array_equal(x, y) for x, y in zip(la, lb))
        assert all(np.array_equal(x, y) for x, y in zip(la, lc))
