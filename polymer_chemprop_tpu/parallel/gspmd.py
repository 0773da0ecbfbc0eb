"""GSPMD-partitioned training: shard the graph, let XLA insert collectives.

The third parallelism mode (alongside explicit shard_map data parallelism
and edge partitioning): the jitted train step is given input shardings —
parameters replicated, the batched graph's atom/bond axes sharded over the
mesh — and XLA's SPMD partitioner propagates shardings through the segment
sums, gathers and matmuls, inserting psum/all-gather collectives where
needed. This is the scaling-book recipe ("pick a mesh, annotate shardings,
let XLA insert collectives") applied to graph message passing; it handles
arbitrary model code (FFN, losses, optimizer) without hand-written
collective placement, at the cost of giving up manual control over where
the halo traffic happens.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ModelConfig
from ..train.step import make_loss_fn


def graph_shardings(mesh: Mesh, axis: str = "gp") -> dict:
    """PartitionSpecs for one GraphBatch arrays dict: bond/atom axes sharded,
    per-molecule arrays replicated (small)."""
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return {
        "f_atoms": row, "f_bonds": row, "w_atoms": row, "w_bonds": row,
        "b2a": row, "b2dst": row, "b2revb": row, "a2mol": row,
        "degree_of_polym": rep, "mol_mask": rep,
    }


def make_gspmd_train_step(cfg: ModelConfig,
                          tx: optax.GradientTransformation,
                          mesh: Mesh,
                          axis: str = "gp") -> Callable:
    """Jitted train step whose batch arrays are sharded over the mesh.

    Batch pytree layout matches train.step.batch_pytree; array axes must be
    divisible by the mesh size along ``axis``.
    """
    loss_fn = make_loss_fn(cfg)
    rep = NamedSharding(mesh, P())
    gshard = graph_shardings(mesh, axis)

    batch_shardings = {
        "graphs": [gshard],
        "targets": rep, "mask": rep, "weights": rep,
    }

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng))(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    def step(params, opt_state, batch, rng):
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        batch = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.asarray(x), s),
            batch, batch_shardings)
        return train_step(params, opt_state, batch, rng)

    return step
