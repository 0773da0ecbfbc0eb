"""Data-parallel training over a device mesh.

Green-field TPU design (the reference is single-device, SURVEY.md §2.9):
each device owns a full padded GraphBatch shard (leading ``dp`` axis);
parameters and optimizer state are replicated; gradients are combined with
``psum`` over ICI inside ``shard_map``.

The global masked loss is exact, not a mean-of-means: the mask denominator
is ``psum``-reduced first, every shard scales its local numerator by the
global denominator, and the gradient psum then reconstructs the identical
gradient a single-device run on the concatenated batch would produce.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..models import ModelConfig, apply_model
from ..train.loss import get_loss_fn


def stack_device_batches(batches) -> Dict:
    """Stack per-device batch pytrees along a new leading dp axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def make_dp_train_step(cfg: ModelConfig,
                       tx: optax.GradientTransformation,
                       mesh: Mesh,
                       axis: str = "dp",
                       target_weights: Optional[jnp.ndarray] = None,
                       alternative_loss_function: Optional[str] = None,
                       spectra_target_floor: Optional[float] = None) -> Callable:
    """Build the jitted multi-device training step.

    batch pytree leaves are (D, ...) host arrays sharded on the leading axis;
    rng is a (D, 2) stacked key array (one dropout stream per shard).
    Spectra losses (SID / Wasserstein) normalize within each molecule's
    spectrum — row-local, so the exact-global-masked-loss scheme below
    holds for them unchanged.
    """
    elementwise = get_loss_fn(cfg.dataset_type, alternative_loss_function)

    def local_loss_terms(params, batch, rng):
        preds = apply_model(params, batch["graphs"], cfg,
                            features=batch.get("features"),
                            atom_descriptors=batch.get("atom_descriptors"),
                            dropout_key=rng, deterministic=False)
        targets, mask = batch["targets"], batch["mask"]
        if cfg.dataset_type == "multiclass":
            preds3 = preds.reshape(preds.shape[0], -1, cfg.multiclass_num_classes)
            elem = elementwise(preds3, targets)
        elif cfg.dataset_type == "spectra":
            elem = elementwise(preds, targets, mask, spectra_target_floor)
        else:
            elem = elementwise(preds, targets)
        x = elem * mask * batch["weights"]
        if target_weights is not None:
            x = x * target_weights
        return x.sum(), mask.sum()

    def sharded_grads(params, batch, rng):
        # local shard views keep a leading length-1 dp axis; drop it
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = rng[0]
        # exact global masked mean: scale local numerator by global denominator
        _, denom_local = local_loss_terms(params, batch, rng)
        denom = jax.lax.psum(denom_local, axis)

        def scaled_loss(p):
            numer, _ = local_loss_terms(p, batch, rng)
            return numer / jnp.maximum(denom, 1.0)

        loss_local, grads_local = jax.value_and_grad(scaled_loss)(params)
        grads = jax.lax.psum(grads_local, axis)
        loss = jax.lax.psum(loss_local, axis)
        return loss, grads

    # params/opt replicated, batch + rng sharded on dp
    smapped = shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)

    @jax.jit
    def train_step(params, opt_state, batch, rngs):
        loss, grads = smapped(params, batch, rngs)
        gnorm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, gnorm

    return train_step


def shard_batch(batch_stacked: Dict, mesh: Mesh, axis: str = "dp"):
    """Place a (D, ...) stacked batch pytree on the mesh, sharded on dp."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch_stacked)
