"""Small functional NN building blocks (activations, init, dropout, linear).

The model layer is deliberately framework-free: parameters are plain pytrees
of ``jnp.ndarray`` and every apply function is pure, so ``jax.jit``,
``jax.grad``, ``jax.vmap`` and ``shard_map`` compose without ceremony.
Mirrors reference nn_utils.py (activation registry :70-99, Xavier-normal
init with zero biases :102-112).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference nn_utils.py:70-99). PReLU's learnable
    slope is approximated by LeakyReLU(0.25), its torch init value."""
    name = name.lower()
    acts = {
        "relu": jax.nn.relu,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
        "prelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.25),
        "tanh": jnp.tanh,
        "selu": jax.nn.selu,
        "elu": jax.nn.elu,
    }
    if name not in acts:
        raise ValueError(f'Activation "{name}" not supported.')
    return acts[name]


def xavier_normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Xavier-normal init matching torch.nn.init.xavier_normal_ on a
    (in, out) matrix (reference nn_utils.py:102-112 initializes every >1-dim
    parameter this way; biases start at zero)."""
    fan_in, fan_out = shape[0], shape[1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def init_linear(key: jax.Array, in_dim: int, out_dim: int,
                bias: bool = True) -> Dict[str, jnp.ndarray]:
    p = {"w": xavier_normal(key, (in_dim, out_dim))}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
           compute_dtype=None) -> jnp.ndarray:
    """Dense layer. With a low-precision compute_dtype (e.g. bf16), inputs
    and weights are cast for the MXU while accumulating in f32 — parameters
    and the returned activations stay f32 (standard mixed precision)."""
    if compute_dtype is not None and compute_dtype != jnp.float32:
        y = jax.lax.dot(x.astype(compute_dtype),
                        params["w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
    else:
        y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array],
            deterministic: bool) -> jnp.ndarray:
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def compute_pnorm(params) -> float:
    """Parameter L2 norm (reference nn_utils.py:11-19)."""
    leaves = jax.tree_util.tree_leaves(params)
    return float(jnp.sqrt(sum(jnp.sum(p ** 2) for p in leaves)))


def compute_gnorm(grads) -> float:
    """Gradient L2 norm (reference nn_utils.py:22-30)."""
    return compute_pnorm(grads)
