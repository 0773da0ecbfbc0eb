"""Alternative TPU aggregation strategies for the wD-MPNN message step.

TPUs dislike random scatter: ``jax.ops.segment_sum`` lowers to a scatter-add
HLO that serializes on-chip. The classic TPU trick is to re-express the
segment reduction as a *masked matmul* that runs on the MXU:

    a_msg = P @ message,   P[a, b] = w[b] * [b2dst[b] == a]

Dense P costs A*B*H*2 FLOPs — wasteful but fully systolic. With bonds
sorted by destination atom, P is band-diagonal: each 128-row atom tile only
overlaps a contiguous run of bond tiles, so the Pallas kernel
(:mod:`.pallas_mpnn`) walks the band and skips empty pairs, recovering
near-bandwidth cost while staying on the MXU.

These pure-XLA variants are used by the benchmark to pick the best strategy
per shape and as correctness oracles for the Pallas path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_scatter(values: jnp.ndarray, weights: jnp.ndarray,
                        segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Baseline: XLA scatter-add."""
    return jax.ops.segment_sum(values * weights[:, None], segment_ids,
                               num_segments=num_segments)


def segment_sum_onehot(values: jnp.ndarray, weights: jnp.ndarray,
                       segment_ids: jnp.ndarray, num_segments: int,
                       block: int = 512) -> jnp.ndarray:
    """Masked-matmul segment sum: builds (num_segments, B) one-hot blocks and
    contracts them on the MXU. O(A*B*H) FLOPs, zero scatter."""
    B = values.shape[0]
    out = jnp.zeros((num_segments, values.shape[1]), values.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_segments, 1), 0)
    num_blocks = (B + block - 1) // block

    def body(i, acc):
        start = i * block
        seg = jax.lax.dynamic_slice(segment_ids, (start,), (block,))
        w = jax.lax.dynamic_slice(weights, (start,), (block,))
        vals = jax.lax.dynamic_slice(values, (start, 0), (block, values.shape[1]))
        P = jnp.where(seg[None, :] == rows, w[None, :], 0.0)
        return acc + jnp.dot(P, vals, preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(0, num_blocks, body, out)


def bond_message_step_onehot(message: jnp.ndarray, w_bonds: jnp.ndarray,
                             b2a: jnp.ndarray, b2dst: jnp.ndarray,
                             b2revb: jnp.ndarray, num_atoms: int) -> jnp.ndarray:
    """wD-MPNN aggregation with the one-hot matmul segment sum."""
    a_message = segment_sum_onehot(message, w_bonds, b2dst, num_atoms)
    return a_message[b2a] - message[b2revb]


def bond_message_step_pairflip(message: jnp.ndarray, w_bonds: jnp.ndarray,
                               b2a: jnp.ndarray, b2dst: jnp.ndarray,
                               num_atoms: int) -> jnp.ndarray:
    """Aggregation exploiting the (fwd, rev) adjacent-pair layout the batcher
    guarantees: slot 0 is padding, real bonds start at index 1 in pairs
    (1,2), (3,4), ... The reverse-bond gather collapses to a pairwise swap —
    a reshape+flip, free on TPU — replacing a random B-row gather.

    z[b] = a_msg[dst(b)] is gathered once; then
    m_new[b] = a_msg[src(b)] - msg[rev(b)] = z[rev(b)] - msg[rev(b)]
    because src(b) = dst(rev(b)).
    """
    a_message = jax.ops.segment_sum(message * w_bonds[:, None], b2dst,
                                    num_segments=num_atoms)
    z = a_message[b2dst] - message  # indexed by bond: a_msg at dst, minus self
    B = message.shape[0]
    # pairwise swap of bonds 1..2k (slot 0 maps to itself; an odd trailing
    # padding slot passes through unswapped — its value is never consumed).
    k = (B - 1) // 2
    body = z[1:1 + 2 * k].reshape(k, 2, -1)[:, ::-1, :].reshape(2 * k, -1)
    return jnp.concatenate([z[:1], body, z[1 + 2 * k:]], axis=0)
