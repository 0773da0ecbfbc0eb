"""Edge-partitioned message passing: one giant batched graph sharded across
chips.

Green-field TPU design (SURVEY.md §5 "long-context": the reference's only
scaling axis is ragged concatenation on one device). This is the graph
analogue of sequence parallelism: the *bond axis* is sharded over the mesh
while parameters stay replicated.

Partitioning invariant: bonds are sharded in their natural (fwd, rev)
adjacent pairs, so the reverse-message gather ``msg[rev(b)]`` is always
LOCAL. The only cross-chip dependency per layer is the atom-state
aggregation: each shard computes a partial weighted segment-sum over the
full atom axis and the partials are combined with ``psum`` over ICI
(bandwidth: A x H per layer — the direct analogue of the all-reduce in
Megatron-style tensor parallelism; a future halo-exchange variant can
reduce this to boundary atoms only via ppermute).

Atoms (f_atoms, readout) are kept replicated; molecule readout runs on
shard 0's copy (cheap: A x H -> M x H segment sum).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.encoder import EncoderConfig
from ..models.nn import get_activation, linear
from ..ops.segment import molecule_readout, weighted_segment_sum

shard_map = jax.shard_map


def build_edge_shards(arrays: Dict[str, np.ndarray], n_shards: int
                      ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Host-side: split the bond axis into per-shard arrays.

    Returns (sharded, replicated): ``sharded`` leaves have a leading
    (n_shards, ...) axis over pair-aligned bond chunks; ``replicated``
    carries the atom/molecule arrays. Local rev indices are rebased so
    msg[rev] is a shard-local gather.
    """
    B = arrays["f_bonds"].shape[0]
    n_pairs = (B - 1) // 2
    pairs_per_shard = -(-n_pairs // n_shards)
    Bs = pairs_per_shard * 2 + 1  # +1: every shard gets its own zero slot 0

    def shard_bond_array(x, fill=0):
        out_shape = (n_shards, Bs) + x.shape[1:]
        out = np.full(out_shape, fill, dtype=x.dtype)
        for s in range(n_shards):
            lo = 1 + s * pairs_per_shard * 2
            hi = min(1 + (s + 1) * pairs_per_shard * 2, B)
            n = max(0, hi - lo)
            if n > 0:
                out[s, 1:1 + n] = x[lo:hi]
        return out

    sharded = {
        "f_bonds": shard_bond_array(arrays["f_bonds"]),
        "w_bonds": shard_bond_array(arrays["w_bonds"]),
        "b2a": shard_bond_array(arrays["b2a"]),
        "b2dst": shard_bond_array(arrays["b2dst"]),
    }
    # local rev: global pair structure (2k+1, 2k+2) -> local (2j+1, 2j+2)
    rev_local = np.zeros((n_shards, Bs), np.int32)
    for s in range(n_shards):
        idx = np.arange(1, Bs, dtype=np.int32)
        swapped = np.where(idx % 2 == 1, idx + 1, idx - 1)
        rev_local[s, 1:] = np.clip(swapped, 0, Bs - 1)
    sharded["b2revb_local"] = rev_local

    replicated = {k: arrays[k] for k in
                  ("f_atoms", "w_atoms", "a2mol", "degree_of_polym",
                   "mol_mask")}
    return sharded, replicated


def make_edge_parallel_forward(cfg: EncoderConfig, mesh: Mesh,
                               axis: str = "ep"):
    """Jitted encoder forward over edge shards: parameters replicated,
    bond arrays sharded, per-layer psum of atom partials."""
    act = get_activation(cfg.activation)

    def local_forward(params, sharded, replicated):
        sh = jax.tree_util.tree_map(lambda x: x[0], sharded)
        f_atoms = replicated["f_atoms"]
        num_atoms = f_atoms.shape[0]
        inputs = linear(params["W_i"], sh["f_bonds"])
        message = act(inputs)
        for _ in range(cfg.depth - 1):
            partial = weighted_segment_sum(message, sh["w_bonds"],
                                           sh["b2dst"], num_atoms)
            a_message = jax.lax.psum(partial, axis)       # ICI all-reduce
            m_new = a_message[sh["b2a"]] - message[sh["b2revb_local"]]
            message = act(inputs + linear(params["W_h"], m_new))
        partial = weighted_segment_sum(message, sh["w_bonds"], sh["b2dst"],
                                       num_atoms)
        a_message = jax.lax.psum(partial, axis)
        a_input = jnp.concatenate([f_atoms, a_message], axis=1)
        atom_hiddens = act(linear(params["W_o"], a_input))
        num_mols = replicated["degree_of_polym"].shape[0]
        return molecule_readout(atom_hiddens, replicated["w_atoms"],
                                replicated["a2mol"], num_mols,
                                replicated["degree_of_polym"],
                                cfg.aggregation, cfg.aggregation_norm)

    smapped = shard_map(local_forward, mesh=mesh,
                        in_specs=(P(), P(axis), P()),
                        out_specs=P(),
                        check_vma=False)
    return jax.jit(smapped)
