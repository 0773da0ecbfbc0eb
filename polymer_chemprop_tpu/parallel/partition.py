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
Megatron-style tensor parallelism). The halo-exchange variant below
(:func:`build_edge_shards_halo` / :func:`make_edge_parallel_forward_halo`)
cuts that to two neighbour ``ppermute`` shifts of one (A/n_shards, H)
atom window per layer — ~n_shards x less ICI traffic — by exploiting
GraphBatch's molecule-contiguous atom numbering.

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


# ---------------------------------------------------------------------------
# halo-exchange variant: neighbour ppermute instead of global psum
# ---------------------------------------------------------------------------

def build_edge_shards_halo(arrays: Dict[str, np.ndarray], n_shards: int,
                           atom_window: int = None,
                           atom_descriptors: np.ndarray = None
                           ) -> Tuple[Dict[str, np.ndarray],
                                      Dict[str, np.ndarray]]:
    """Host-side partitioner for the halo-exchange forward.

    GraphBatch numbers atoms contiguously per molecule and emits bonds in
    molecule order, so a contiguous chunk of bond pairs references one
    contiguous atom window. Each shard gets a window of width ``Aw``
    (max over shards, padded); adjacent windows overlap only at the
    molecule split across the boundary. The per-layer combine then only
    needs the two neighbouring shards' partials (``ppermute``), shrinking
    ICI traffic from an (A, H) all-reduce to two (Aw, H) shifts —
    ~n_shards x less.

    Raises ValueError when a single molecule spans 3+ shards (windows of
    non-adjacent shards would overlap); callers should fall back to
    :func:`build_edge_shards` + psum in that case.

    ``atom_window``: fixed window width for compile-once training loops —
    every batch of a fold then produces identically-shaped shards (the
    trainer passes the loader's stable ``pad_atoms`` envelope). Raises
    ValueError if the derived width exceeds it.
    """
    B = arrays["f_bonds"].shape[0]
    A = arrays["f_atoms"].shape[0]
    n_pairs = (B - 1) // 2
    pairs_per_shard = -(-n_pairs // n_shards)
    Bs = pairs_per_shard * 2 + 1

    b2a = arrays["b2a"]
    b2dst = arrays["b2dst"]
    w_bonds = arrays["w_bonds"]

    # per-shard referenced atom windows
    o = np.zeros(n_shards, np.int64)
    hi_atom = np.zeros(n_shards, np.int64)
    for s in range(n_shards):
        lo = 1 + s * pairs_per_shard * 2
        hi = min(1 + (s + 1) * pairs_per_shard * 2, B)
        real = np.zeros(0, np.int64)
        if hi > lo:
            ref = np.concatenate([b2a[lo:hi], b2dst[lo:hi]])
            real = ref[ref > 0]
        if real.size == 0:
            # empty tail shard: window past the end (owns nothing, all
            # zero rows; keeps the o array monotone for searchsorted)
            o[s] = hi_atom[s] = A
        else:
            o[s], hi_atom[s] = real.min(), real.max() + 1
    # monotonicity + the <=2-consecutive-shards invariant
    for s in range(n_shards - 2):
        if hi_atom[s] > o[s + 2]:
            raise ValueError(
                "a molecule spans 3+ edge shards; use build_edge_shards "
                "(psum variant) instead")
    # extend windows to cover gaps between them: atoms with NO incoming
    # bonds (single-atom fragments after H folding, e.g. water) are never
    # referenced by any shard's bonds but still contribute to the readout
    # via W_o(f_atoms || 0) — every real atom (w > 0) must lie in a window
    w_atoms_all = arrays["w_atoms"]
    nz = np.nonzero(w_atoms_all > 0)[0]
    real_hi = int(nz.max()) + 1 if nz.size else 1
    first_real = int(nz.min()) if nz.size else 1
    if n_shards > 0 and o[0] > first_real:
        o[0] = first_real
    for s in range(n_shards - 1):
        if o[s] < A:  # skip empty tail shards
            hi_atom[s] = max(hi_atom[s], min(int(o[s + 1]), real_hi))
    for s in range(n_shards - 1, -1, -1):
        if o[s] < A:
            hi_atom[s] = max(hi_atom[s], real_hi)
            break
    Aw = int(((hi_atom - o).max() + 7) // 8 * 8)
    if atom_window is not None:
        if Aw > atom_window:
            raise ValueError(
                f"derived halo window {Aw} exceeds the fixed atom_window "
                f"{atom_window}; enlarge the envelope or fall back")
        Aw = int(atom_window)

    def shard_bond_array(x, fill=0):
        out = np.full((n_shards, Bs) + x.shape[1:], fill, dtype=x.dtype)
        for s in range(n_shards):
            lo = 1 + s * pairs_per_shard * 2
            hi = min(1 + (s + 1) * pairs_per_shard * 2, B)
            if hi > lo:
                out[s, 1:1 + hi - lo] = x[lo:hi]
        return out

    sharded = {
        "f_bonds": shard_bond_array(arrays["f_bonds"]),
        "w_bonds": shard_bond_array(w_bonds),
    }
    # atom indices rebased into the local window; padding bonds carry zero
    # weight so the clipped index is harmless
    b2a_s = shard_bond_array(b2a)
    b2dst_s = shard_bond_array(b2dst)
    loc = lambda x: np.clip(x - o[:, None], 0, Aw - 1).astype(np.int32)
    sharded["b2a_local"] = loc(b2a_s)
    sharded["b2dst_local"] = loc(b2dst_s)
    # real-bond mask: padding slots must not receive a_win gathers
    sharded["bond_mask"] = (b2dst_s > 0).astype(np.float32)

    rev_local = np.zeros((n_shards, Bs), np.int32)
    idx = np.arange(1, Bs, dtype=np.int32)
    swapped = np.where(idx % 2 == 1, idx + 1, idx - 1)
    rev_local[:, 1:] = np.clip(swapped, 0, Bs - 1)
    sharded["b2revb_local"] = rev_local

    # atom windows (zero-padded past A)
    F = arrays["f_atoms"].shape[1]
    f_win = np.zeros((n_shards, Aw, F), arrays["f_atoms"].dtype)
    w_win = np.zeros((n_shards, Aw), arrays["w_atoms"].dtype)
    mol_win = np.zeros((n_shards, Aw), np.int32)
    own = np.zeros((n_shards, Aw), np.float32)
    for s in range(n_shards):
        lo, hi = int(o[s]), min(int(o[s]) + Aw, A)
        n = hi - lo
        f_win[s, :n] = arrays["f_atoms"][lo:hi]
        w_win[s, :n] = arrays["w_atoms"][lo:hi]
        mol_win[s, :n] = arrays["a2mol"][lo:hi]
    # ownership = exact partition of the real atoms [1, A): the owner of
    # atom a is the last shard whose window starts at or before a (overlap
    # atoms belong to the later shard)
    atoms = np.arange(1, A)
    owner = np.searchsorted(o, atoms, side="right") - 1
    r = atoms - o[owner]
    valid = r < Aw
    own[owner[valid], r[valid]] = 1.0
    sharded["f_atoms_win"] = f_win
    sharded["w_atoms_win"] = w_win
    sharded["a2mol_win"] = mol_win
    sharded["own_mask"] = own
    # global atom index of window row 0: dropout on window-resident
    # tensors is keyed by GLOBAL row so the replicated halo rows draw
    # identical masks on both owning shards (see _encoder_local_halo)
    sharded["win_start"] = o.astype(np.int32)
    # shift offsets, clipped so an out-of-range neighbour (empty shard /
    # no overlap) lands entirely in the zero half of the padded buffer
    sharded["off_prev"] = np.clip(np.array(
        [0] + [int(o[s] - o[s - 1]) for s in range(1, n_shards)], np.int64),
        0, Aw).astype(np.int32)
    sharded["off_next"] = np.clip(np.array(
        [int(Aw + o[s] - o[s + 1]) for s in range(n_shards - 1)] + [Aw],
        np.int64), 0, Aw).astype(np.int32)

    if atom_descriptors is not None:
        D = atom_descriptors.shape[1]
        d_win = np.zeros((n_shards, Aw, D), atom_descriptors.dtype)
        for s in range(n_shards):
            lo, hi = int(o[s]), min(int(o[s]) + Aw, A)
            d_win[s, :hi - lo] = atom_descriptors[lo:hi]
        sharded["atom_desc_win"] = d_win

    # real (unpadded) window extents, for the overlapped strip exchange:
    # rows >= ext are pure padding and carry no bond contributions
    ext = np.clip(hi_atom - o, 0, Aw).astype(np.int32)
    sharded["ext"] = ext
    sharded["ext_prev"] = np.concatenate([[0], ext[:-1]]).astype(np.int32)
    sharded["ext_next"] = np.concatenate([ext[1:], [0]]).astype(np.int32)

    replicated = {k: arrays[k] for k in ("degree_of_polym", "mol_mask")}
    return sharded, replicated


def _make_halo_combine(mesh: Mesh, axis: str):
    """own partial + shifted neighbour partials (missing ppermute
    sources deliver zeros, so the boundary shards need no masks)."""
    n = mesh.shape[axis]
    fwd_perm = [(i, i + 1) for i in range(n - 1)]   # s receives from s-1
    bwd_perm = [(i + 1, i) for i in range(n - 1)]   # s receives from s+1

    def combine(partial, off_prev, off_next):
        Aw = partial.shape[0]
        zeros = jnp.zeros_like(partial)
        from_prev = jax.lax.ppermute(partial, axis, fwd_perm)
        from_next = jax.lax.ppermute(partial, axis, bwd_perm)
        prev_pad = jnp.concatenate([from_prev, zeros], axis=0)
        shifted_prev = jax.lax.dynamic_slice_in_dim(prev_pad, off_prev, Aw)
        next_pad = jnp.concatenate([zeros, from_next], axis=0)
        shifted_next = jax.lax.dynamic_slice_in_dim(next_pad, off_next, Aw)
        return partial + shifted_prev + shifted_next

    return combine


def make_edge_parallel_forward_halo(cfg: EncoderConfig, mesh: Mesh,
                                    axis: str = "ep"):
    """Encoder forward over halo edge shards: per-layer neighbour
    ppermute of (Aw, H) atom-window partials instead of a global (A, H)
    psum; only the tiny (M, H) molecule readout is all-reduced."""
    act = get_activation(cfg.activation)
    combine = _make_halo_combine(mesh, axis)

    def local_forward(params, sharded, replicated):
        sh = jax.tree_util.tree_map(lambda x: x[0], sharded)
        Aw = sh["f_atoms_win"].shape[0]
        off_prev = sh["off_prev"].reshape(())
        off_next = sh["off_next"].reshape(())
        bmask = sh["bond_mask"][:, None]
        inputs = linear(params["W_i"], sh["f_bonds"])
        message = act(inputs)
        for _ in range(cfg.depth - 1):
            partial = weighted_segment_sum(message, sh["w_bonds"],
                                           sh["b2dst_local"], Aw)
            a_win = combine(partial, off_prev, off_next)
            m_new = a_win[sh["b2a_local"]] * bmask \
                - message[sh["b2revb_local"]]
            message = act(inputs + linear(params["W_h"], m_new))
        partial = weighted_segment_sum(message, sh["w_bonds"],
                                       sh["b2dst_local"], Aw)
        a_win = combine(partial, off_prev, off_next)
        a_input = jnp.concatenate([sh["f_atoms_win"], a_win], axis=1)
        atom_hiddens = act(linear(params["W_o"], a_input))
        own_w = sh["w_atoms_win"] * sh["own_mask"]
        num_mols = replicated["degree_of_polym"].shape[0]
        wsum = jax.lax.psum(
            weighted_segment_sum(atom_hiddens, own_w, sh["a2mol_win"],
                                 num_mols), axis)
        if cfg.aggregation == "mean":
            denom = jax.lax.psum(
                jax.ops.segment_sum(own_w, sh["a2mol_win"],
                                    num_segments=num_mols), axis)
            out = wsum / jnp.maximum(denom, 1e-12)[:, None]
            out = jnp.where(denom[:, None] > 0, out, 0.0)
        elif cfg.aggregation == "sum":
            out = wsum
        else:
            out = wsum / cfg.aggregation_norm
        return out * replicated["degree_of_polym"][:, None]

    smapped = shard_map(local_forward, mesh=mesh,
                        in_specs=(P(), P(axis), P()),
                        out_specs=P(),
                        check_vma=False)
    return jax.jit(smapped)


def make_halo_train_step(mcfg, tx, mesh: Mesh, axis: str = "ep",
                         target_weights=None, band: bool = False):
    """Full training step with the encoder edge-partitioned over the mesh.

    The forward is :func:`make_edge_parallel_forward_halo` (per-layer
    neighbour ppermute halo exchange); the FFN head and masked loss run on
    the replicated embeddings. Gradients flow back THROUGH the halo
    collectives — shard_map AD turns each ppermute into its reverse
    permutation and psums the replicated-parameter cotangents — so the
    updated parameters must be identical to a single-device step on the
    unsharded batch (tests/test_parallel.py pins this on 2/4/8-device
    meshes). Single-molecule-position regression/classification datasets
    (the giant-graph scaling case); the general path stays
    train.step.make_train_step."""
    import optax

    from ..models.model import apply_ffn
    from ..train.loss import get_loss_fn, masked_loss

    enc_fwd = (make_edge_parallel_forward_halo_band(mcfg.encoder, mesh,
                                                    axis) if band else
               make_edge_parallel_forward_halo(mcfg.encoder, mesh, axis))
    elementwise = get_loss_fn(mcfg.dataset_type, None)

    def loss_fn(params, sharded, replicated, targets, mask, weights):
        emb = enc_fwd(params["encoders"][0], sharded, replicated)
        preds = apply_ffn(params, emb, mcfg, dropout_key=None,
                          deterministic=True)
        elem = elementwise(preds, targets)
        return masked_loss(elem, mask, target_weights, weights)

    @jax.jit
    def halo_train_step(params, opt_state, sharded, replicated,
                        targets, mask, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, sharded, replicated, targets, mask, weights)
        updates, opt_state = tx.update(grads, opt_state, params)
        gnorm = optax.global_norm(grads)
        return (optax.apply_updates(params, updates), opt_state, loss,
                gnorm)

    return halo_train_step


# ---------------------------------------------------------------------------
# banded halo shards: the Pallas atom-aggregation band kernel INSIDE the
# shard function (docs/kernels.md "Kernel selection inside the halo shard")
# ---------------------------------------------------------------------------

def build_edge_shards_halo_band(arrays: Dict[str, np.ndarray],
                                n_shards: int,
                                atom_window: int = None
                                ) -> Tuple[Dict[str, np.ndarray],
                                           Dict[str, np.ndarray]]:
    """Halo shards + per-shard BAND layout, so each shard's atom
    aggregation runs on the MXU band kernel instead of an XLA scatter.

    The windows are molecule-contiguous, so banding is a shard-LOCAL
    re-sort: each shard's bonds are dst-sorted against its own atom
    window. Window slot 0 is reserved as the padding sink (the band aux
    uses dst==0 as the padding sentinel, and the window's first atom is
    REAL — so all local dst/src ids are shifted by +1 and the aggregation
    table carries one extra leading row that is discarded before the halo
    exchange). Raises ValueError when any shard's band windows are
    infeasible (caller falls back to :func:`build_edge_shards_halo`)."""
    from ..ops.pallas_mpnn import EXT_A, TILE_A, TILE_B, build_sorted_aux

    sharded, replicated = build_edge_shards_halo(arrays, n_shards,
                                                 atom_window)
    Bs = sharded["f_bonds"].shape[1]
    Bs_band = max(-(-Bs // TILE_B) * TILE_B, EXT_A)
    Aw = sharded["f_atoms_win"].shape[1]
    Aw1 = -(-(Aw + 1) // TILE_A) * TILE_A
    pad_b = Bs_band - Bs

    def padb(x):
        width = [(0, 0), (0, pad_b)] + [(0, 0)] * (x.ndim - 2)
        return np.pad(x, width)

    f_bonds = padb(sharded["f_bonds"])
    w_bonds = padb(sharded["w_bonds"])
    dst_l = padb(sharded["b2dst_local"])
    bmask = padb(sharded["bond_mask"])
    rev = np.zeros((n_shards, Bs_band), np.int32)
    idx = np.arange(1, Bs_band, dtype=np.int32)
    swapped = np.where(idx % 2 == 1, idx + 1, idx - 1)
    rev[:, 1:] = np.clip(swapped, 0, Bs_band - 1)
    dst_shift = np.where(bmask > 0, dst_l + 1, 0).astype(np.int32)

    f_sorted = np.zeros_like(f_bonds)
    fields = {"srev": [], "rs": [], "dst_sorted": [], "w_sorted": [],
              "ra": [], "src_sorted": []}
    for s in range(n_shards):
        aux = build_sorted_aux(dst_shift[s], rev[s], w_bonds[s],
                               num_atoms=Aw1)
        if aux.ra is None:
            raise ValueError(
                "banded halo: a shard's atom-tile windows exceed the band "
                "kernel bound; use build_edge_shards_halo")
        f_sorted[s] = f_bonds[s][aux.perm]
        for k in fields:
            fields[k].append(np.asarray(getattr(aux, k)))
    band = {
        "f_bonds_sorted": f_sorted,
        **{k: np.stack(v) for k, v in fields.items()},
    }
    for k in ("f_atoms_win", "w_atoms_win", "a2mol_win", "own_mask",
              "off_prev", "off_next"):
        band[k] = sharded[k]
    return band, replicated


def make_edge_parallel_forward_halo_band(cfg: EncoderConfig, mesh: Mesh,
                                         axis: str = "ep"):
    """Halo encoder forward with the Pallas band kernel doing each
    shard's atom aggregation (sorted-resident messages, one involution
    gather per layer); per-layer neighbour ppermute as in the plain halo
    path. Exact vs the single-device encoder (tests/test_parallel.py,
    interpret mode on the CPU mesh)."""
    act = get_activation(cfg.activation)
    combine = _make_halo_combine(mesh, axis)

    def local_forward(params, sharded, replicated):
        from ..ops.pallas_mpnn import atom_readout_sorted
        sh = jax.tree_util.tree_map(lambda x: x[0], sharded)
        H = cfg.hidden_size
        Hp = ((H + 127) // 128) * 128
        from ..ops.pallas_mpnn import TILE_A
        Aw = sh["f_atoms_win"].shape[0]
        Aw1 = sh["ra"].shape[0] * TILE_A
        off_prev = sh["off_prev"].reshape(())
        off_next = sh["off_next"].reshape(())
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[cfg.band_precision]
        aux = {"ra": sh["ra"], "w_sorted": sh["w_sorted"],
               "dst_sorted": sh["dst_sorted"]}
        wi = params["W_i"]
        if Hp != H:
            wi = dict(wi)
            wi["w"] = jnp.pad(wi["w"], ((0, 0), (0, Hp - H)))
            if "b" in wi:
                wi["b"] = jnp.pad(wi["b"], (0, Hp - H))
        wh = params["W_h"]
        if Hp != H:
            wh = dict(wh)
            wh["w"] = jnp.pad(wh["w"], ((0, Hp - H), (0, Hp - H)))
            if "b" in wh:
                wh["b"] = jnp.pad(wh["b"], (0, Hp - H))
        inputs = linear(wi, sh["f_bonds_sorted"])
        message = act(inputs)
        zero_row = jnp.zeros((1, Hp), jnp.float32)
        for _ in range(cfg.depth - 1):
            partials = atom_readout_sorted(message, aux, Aw1, Hp, prec,
                                           cfg.unit_bond_weights)
            a_win = combine(partials[1:Aw + 1], off_prev, off_next)
            a_full = jnp.concatenate([zero_row, a_win], axis=0)
            m_new = a_full[sh["src_sorted"]] - message[sh["srev"]]
            message = act(inputs + linear(wh, m_new))
        partials = atom_readout_sorted(message, aux, Aw1, Hp, prec,
                                       cfg.unit_bond_weights)
        a_win = combine(partials[1:Aw + 1], off_prev, off_next)[:, :H]
        a_input = jnp.concatenate([sh["f_atoms_win"], a_win], axis=1)
        atom_hiddens = act(linear(params["W_o"], a_input))
        own_w = sh["w_atoms_win"] * sh["own_mask"]
        num_mols = replicated["degree_of_polym"].shape[0]
        wsum = jax.lax.psum(
            weighted_segment_sum(atom_hiddens, own_w, sh["a2mol_win"],
                                 num_mols), axis)
        if cfg.aggregation == "mean":
            denom = jax.lax.psum(
                jax.ops.segment_sum(own_w, sh["a2mol_win"],
                                    num_segments=num_mols), axis)
            out = wsum / jnp.maximum(denom, 1e-12)[:, None]
            out = jnp.where(denom[:, None] > 0, out, 0.0)
        elif cfg.aggregation == "sum":
            out = wsum
        else:
            out = wsum / cfg.aggregation_norm
        return out * replicated["degree_of_polym"][:, None]

    smapped = shard_map(local_forward, mesh=mesh,
                        in_specs=(P(), P(axis), P()),
                        out_specs=P(),
                        check_vma=False)
    return jax.jit(smapped)


# ---------------------------------------------------------------------------
# overlapped halo exchange: strip-width ppermute issued before the interior
# aggregation so XLA's scheduler can run the collective concurrently with
# the bulk compute (docs/kernels.md "overlap projection", BASELINE.md:35-36)
# ---------------------------------------------------------------------------

def halo_strip_width(sharded: Dict[str, np.ndarray]) -> int:
    """Static strip width for the overlapped halo exchange: the widest
    window overlap across shards (host-side ints, so the resulting jit
    signature is shape-stable)."""
    Aw = int(sharded["f_atoms_win"].shape[-2])
    off_prev = np.asarray(sharded["off_prev"]).reshape(-1)
    off_next = np.asarray(sharded["off_next"]).reshape(-1)
    ext = np.asarray(sharded["ext"]).reshape(-1)
    ext_prev = np.asarray(sharded["ext_prev"]).reshape(-1)
    # rows consumed from the prev neighbour: [off_prev, ext_prev)
    w_prev = int(np.maximum(ext_prev - off_prev, 0).max()) if ext.size else 0
    # rows consumed from the next neighbour: [0, ext_self - (Aw-off_next))
    w_next = int(np.maximum(ext - (Aw - off_next), 0).max()) if ext.size else 0
    sw = max(w_prev, w_next, 1)
    sw = min((sw + 7) // 8 * 8, Aw)
    return max(sw, 8)


def _make_halo_combine_overlap(mesh: Mesh, axis: str, Aw: int, sw: int):
    """Overlapped combine: only the two boundary STRIPS travel over ICI
    (2*sw rows instead of the whole Aw window), and the ppermute's
    operand (partial_strip) is available before the interior aggregation
    runs, so the collective overlaps the bulk compute."""
    n = mesh.shape[axis]
    fwd_perm = [(i, i + 1) for i in range(n - 1)]   # s receives from s-1
    bwd_perm = [(i + 1, i) for i in range(n - 1)]   # s receives from s+1

    def combine(partial_interior, partial_strip, off_prev, off_next,
                ext, ext_prev):
        # the END strip is anchored at the REAL extent (rows >= ext are
        # window padding with no contributions), the BEGIN strip at row 0
        start = jnp.maximum(ext - sw, 0)
        send_next = jax.lax.dynamic_slice_in_dim(partial_strip, start, sw)
        send_prev = jax.lax.slice_in_dim(partial_strip, 0, sw)
        from_prev_strip = jax.lax.ppermute(send_next, axis, fwd_perm)
        from_next_strip = jax.lax.ppermute(send_prev, axis, bwd_perm)
        partial = partial_interior + partial_strip
        zeros = jnp.zeros_like(partial)
        from_prev = jax.lax.dynamic_update_slice_in_dim(
            zeros, from_prev_strip, jnp.maximum(ext_prev - sw, 0), 0)
        from_next = jax.lax.dynamic_update_slice_in_dim(
            zeros, from_next_strip, 0, 0)
        prev_pad = jnp.concatenate([from_prev, zeros], axis=0)
        shifted_prev = jax.lax.dynamic_slice_in_dim(prev_pad, off_prev, Aw)
        next_pad = jnp.concatenate([zeros, from_next], axis=0)
        shifted_next = jax.lax.dynamic_slice_in_dim(next_pad, off_next, Aw)
        return partial + shifted_prev + shifted_next

    return combine


def make_edge_parallel_forward_halo_overlap(cfg: EncoderConfig, mesh: Mesh,
                                            strip_width: int,
                                            axis: str = "ep"):
    """:func:`make_edge_parallel_forward_halo` with the overlapped strip
    exchange. Row-exact vs the unoverlapped forward: every window row is
    accumulated by exactly one of the two segment-sums (interior rows by
    the interior sum, strip rows by the strip sum), so no float
    reassociation is introduced."""
    act = get_activation(cfg.activation)

    def build(Aw):
        combine = _make_halo_combine_overlap(mesh, axis, Aw, strip_width)

        def aggregate(message, sh, off_prev, off_next):
            dst = sh["b2dst_local"]
            ext = sh["ext"].reshape(())
            ext_prev = sh["ext_prev"].reshape(())
            in_strip = ((dst < strip_width)
                        | (dst >= ext - strip_width)).astype(message.dtype)
            w = sh["w_bonds"]
            partial_strip = weighted_segment_sum(
                message, w * in_strip, dst, Aw)
            partial_interior = weighted_segment_sum(
                message, w * (1.0 - in_strip), dst, Aw)
            return combine(partial_interior, partial_strip,
                           off_prev, off_next, ext, ext_prev)
        return aggregate

    def local_forward(params, sharded, replicated):
        sh = jax.tree_util.tree_map(lambda x: x[0], sharded)
        Aw = sh["f_atoms_win"].shape[0]
        aggregate = build(Aw)
        off_prev = sh["off_prev"].reshape(())
        off_next = sh["off_next"].reshape(())
        bmask = sh["bond_mask"][:, None]
        inputs = linear(params["W_i"], sh["f_bonds"])
        message = act(inputs)
        for _ in range(cfg.depth - 1):
            a_win = aggregate(message, sh, off_prev, off_next)
            m_new = a_win[sh["b2a_local"]] * bmask \
                - message[sh["b2revb_local"]]
            message = act(inputs + linear(params["W_h"], m_new))
        a_win = aggregate(message, sh, off_prev, off_next)
        a_input = jnp.concatenate([sh["f_atoms_win"], a_win], axis=1)
        atom_hiddens = act(linear(params["W_o"], a_input))
        own_w = sh["w_atoms_win"] * sh["own_mask"]
        num_mols = replicated["degree_of_polym"].shape[0]
        wsum = jax.lax.psum(
            weighted_segment_sum(atom_hiddens, own_w, sh["a2mol_win"],
                                 num_mols), axis)
        if cfg.aggregation == "mean":
            denom = jax.lax.psum(
                jax.ops.segment_sum(own_w, sh["a2mol_win"],
                                    num_segments=num_mols), axis)
            out = wsum / jnp.maximum(denom, 1e-12)[:, None]
            out = jnp.where(denom[:, None] > 0, out, 0.0)
        elif cfg.aggregation == "sum":
            out = wsum
        else:
            out = wsum / cfg.aggregation_norm
        return out * replicated["degree_of_polym"][:, None]

    smapped = shard_map(local_forward, mesh=mesh,
                        in_specs=(P(), P(axis), P()),
                        out_specs=P(),
                        check_vma=False)
    return jax.jit(smapped)


# ---------------------------------------------------------------------------
# GP x DP: a 2D (dp, ep) mesh — each data-parallel replica edge-partitions
# its own batch over its ep row; gradients psum over both axes
# ---------------------------------------------------------------------------

def build_edge_shards_halo_dp(arrays_list, n_ep: int, atom_window: int,
                              atom_descriptors_list=None):
    """Partition one batch per dp replica and stack along a leading dp
    axis: sharded leaves become (n_dp, n_ep, ...), replicated leaves
    (n_dp, ...). All replicas must share the loader's padding envelopes
    (the trainer's fixed ``atom_window`` guarantees it).

    For multi-molecule datapoints pass each replica's entry as a LIST of
    per-position array dicts; the result is then a tuple of per-position
    (sharded, replicated) stacks matching make_halo_dp_train_step's
    multi-position signature."""
    multi = isinstance(arrays_list[0], (list, tuple))
    if not multi:
        arrays_list = [[a] for a in arrays_list]
    n_pos = len(arrays_list[0])
    out_sh, out_rep = [], []
    for pos in range(n_pos):
        shs, reps = [], []
        for d, arrays in enumerate(arrays_list):
            ad = (atom_descriptors_list[d]
                  if atom_descriptors_list is not None and pos == 0
                  else None)
            sh, rep = build_edge_shards_halo(arrays[pos], n_ep,
                                             atom_window=atom_window,
                                             atom_descriptors=ad)
            shs.append(sh)
            reps.append(rep)
        out_sh.append({k: np.stack([s[k] for s in shs]) for k in shs[0]})
        out_rep.append({k: np.stack([r[k] for r in reps])
                        for k in reps[0]})
    if not multi:
        return out_sh[0], out_rep[0]
    return tuple(out_sh), tuple(out_rep)

def _encoder_local_halo(mcfg, mesh, ep_axis, overlap, strip_width,
                        dropout_rngs):
    """Per-shard encoder body shared by the 2D train step: handles the
    (un)overlapped halo aggregation, per-shard dropout streams, and the
    optional windowed atom-descriptor head."""
    import jax
    import jax.numpy as jnp

    cfg = mcfg.encoder
    act = get_activation(cfg.activation)

    def run(enc_params, sh, rep, rng):
        Aw = sh["f_atoms_win"].shape[0]
        off_prev = sh["off_prev"].reshape(())
        off_next = sh["off_next"].reshape(())
        bmask = sh["bond_mask"][:, None]
        if overlap:
            sw = strip_width
            combine2 = _make_halo_combine_overlap(mesh, ep_axis, Aw, sw)
            ext = sh["ext"].reshape(())
            ext_prev = sh["ext_prev"].reshape(())

            def aggregate(vals, w):
                dst = sh["b2dst_local"]
                in_strip = ((dst < sw)
                            | (dst >= ext - sw)).astype(vals.dtype)
                ps = weighted_segment_sum(vals, w * in_strip, dst, Aw)
                pi = weighted_segment_sum(vals, w * (1.0 - in_strip),
                                          dst, Aw)
                return combine2(pi, ps, off_prev, off_next, ext, ext_prev)
        else:
            combine1 = _make_halo_combine(mesh, ep_axis)

            def aggregate(vals, w):
                partial = weighted_segment_sum(vals, w,
                                               sh["b2dst_local"], Aw)
                return combine1(partial, off_prev, off_next)

        keep = 1.0 - cfg.dropout if dropout_rngs else 1.0

        def drop(x, key):
            if not dropout_rngs or cfg.dropout <= 0.0:
                return x
            m = jax.random.bernoulli(key, keep, x.shape)
            return jnp.where(m, x / keep, 0.0)

        n_keys = cfg.depth + 2
        rngs = (jax.random.split(rng.reshape(2), n_keys)
                if dropout_rngs else [None] * n_keys)
        # Window-resident tensors (atom messages, atom_hiddens) REPLICATE
        # the halo atoms across adjacent shards. A per-shard mask stream
        # would drop the two copies of one atom differently — a dropout
        # structure no single-device run can produce (the bond path is
        # immune: bond messages are disjointly partitioned). Key those
        # masks by GLOBAL atom row instead, from a stream shared across
        # the ep row (its first shard's key), so every replica of a row
        # draws the same mask — and the step is invariant to the ep
        # split (tests/test_parallel.py::test_gp_atom_messages_dropout).
        if dropout_rngs and cfg.dropout > 0.0:
            key_row = jax.lax.all_gather(rng.reshape(2), ep_axis)[0]
            wkeys = jax.random.split(key_row, n_keys)
            row_ids = sh["win_start"].reshape(()) + jnp.arange(Aw)
            row_of = jax.vmap(jax.random.fold_in, (None, 0))

            def drop_win(x, lkey):
                rk = row_of(lkey, row_ids)
                m = jax.vmap(lambda k: jax.random.bernoulli(
                    k, keep, (x.shape[1],)))(rk)
                return jnp.where(m, x / keep, 0.0)
        else:
            wkeys = [None] * n_keys

            def drop_win(x, lkey):
                return x
        if cfg.atom_messages:
            # atom-message mode on the halo mesh: messages live on the
            # ATOM WINDOW (Aw, H); the neighbour sum is the same bond-
            # keyed segment sum + halo combine as the bond path, applied
            # to the src-gathered window messages (encoder.py:117-183
            # single-device semantics, incl. the loop-invariant hoist of
            # W_h's bond-feature half and the own-bond-weight readout)
            H = cfg.hidden_size
            f_bonds_b = sh["f_bonds"][:, -cfg.bond_fdim:]
            inputs = linear(enc_params["W_i"], sh["f_atoms_win"])
            message = act(inputs)
            wh = enc_params["W_h"]
            w1 = {"w": wh["w"][:H]}
            w2 = {"w": wh["w"][H:]}
            if "b" in wh:
                w2 = dict(w2, b=wh["b"])
            ones = sh["bond_mask"]
            const = linear(w2, aggregate(f_bonds_b, ones))
            for layer in range(cfg.depth - 1):
                m = aggregate(message[sh["b2a_local"]] * bmask, ones)
                message = act(inputs + linear(w1, m) + const)
                message = drop_win(message, wkeys[layer])
            a_win = aggregate(message[sh["b2a_local"]] * bmask,
                              sh["w_bonds"])
        else:
            inputs = linear(enc_params["W_i"], sh["f_bonds"])
            message = act(inputs)
            for layer in range(cfg.depth - 1):
                if cfg.undirected:
                    # rev pairs are co-located per shard, so the
                    # symmetrization stays local (mpn.py:101-102)
                    message = (message
                               + message[sh["b2revb_local"]]) / 2
                a_win = aggregate(message, sh["w_bonds"])
                m_new = a_win[sh["b2a_local"]] * bmask \
                    - message[sh["b2revb_local"]]
                message = act(inputs + linear(enc_params["W_h"], m_new))
                message = drop(message, rngs[layer])
            a_win = aggregate(message, sh["w_bonds"])
        a_input = jnp.concatenate([sh["f_atoms_win"], a_win], axis=1)
        atom_hiddens = act(linear(enc_params["W_o"], a_input))
        # atom_hiddens is window-resident too; its halo rows are masked
        # out of the readout by own_mask, but row-keyed masks keep the
        # whole encoder invariant to the ep split
        atom_hiddens = drop_win(atom_hiddens, wkeys[cfg.depth - 1])
        if "atom_desc_win" in sh:
            atom_hiddens = jnp.concatenate(
                [atom_hiddens, sh["atom_desc_win"]], axis=1)
            atom_hiddens = linear(enc_params["W_d"], atom_hiddens)
            atom_hiddens = drop_win(atom_hiddens, wkeys[cfg.depth])
        own_w = sh["w_atoms_win"] * sh["own_mask"]
        num_mols = rep["degree_of_polym"].shape[0]
        wsum = jax.lax.psum(
            weighted_segment_sum(atom_hiddens, own_w, sh["a2mol_win"],
                                 num_mols), ep_axis)
        if cfg.aggregation == "mean":
            denom = jax.lax.psum(
                jax.ops.segment_sum(own_w, sh["a2mol_win"],
                                    num_segments=num_mols), ep_axis)
            out = wsum / jnp.maximum(denom, 1e-12)[:, None]
            out = jnp.where(denom[:, None] > 0, out, 0.0)
        elif cfg.aggregation == "sum":
            out = wsum
        else:
            out = wsum / cfg.aggregation_norm
        return out * rep["degree_of_polym"][:, None]

    return run


def make_halo_dp_train_step(mcfg, tx, mesh: Mesh,
                            dp_axis: str = "dp", ep_axis: str = "ep",
                            target_weights=None, overlap: bool = False,
                            strip_width: int = None,
                            dropout_rngs: bool = False,
                            use_features: bool = False):
    """Training step on a 2D (dp, ep) mesh: each dp replica runs the
    halo-exchange edge-partitioned encoder over its ep row; the masked
    loss is the exact GLOBAL mean over all replicas (the dp.py scheme:
    one global denominator, so the update matches a single-device step on
    the concatenated batches).

    On a multi-host hybrid mesh (multihost.make_hybrid_mesh with
    {"dp": n_hosts} outer / {"ep": local_devices} inner) the per-layer
    halo ppermutes stay on ICI within a host and only the per-step
    gradient psum crosses DCN.

    Lifted restrictions (VERDICT r2 item 6): ``dropout_rngs`` threads a
    (n_dp, n_ep, 2) per-shard key array through encoder+FFN dropout;
    multi-molecule datapoints pass ``sharded``/``replicated`` as TUPLES
    (one entry per molecule position, encoders applied per position and
    embeddings concatenated, mpn_shared honoured); ``use_features``
    appends the replicated (n_dp, M, F) extra-feature block before the
    FFN; windowed atom descriptors ride the sharded dicts as
    ``atom_desc_win`` (build_edge_shards_halo(atom_descriptors=...)).
    ``features_only`` remains out of scope (no message passing to shard).
    """
    import optax

    from ..models.model import apply_ffn
    from ..train.loss import get_loss_fn, masked_loss  # noqa: F401

    elementwise = get_loss_fn(mcfg.dataset_type, None)
    run = _encoder_local_halo(mcfg, mesh, ep_axis, overlap, strip_width,
                              dropout_rngs)
    n_pos = mcfg.number_of_molecules

    def encoder_local(params, sharded, replicated, rng):
        embs = []
        for i in range(n_pos):
            pi = 0 if mcfg.mpn_shared else i
            sh = jax.tree_util.tree_map(lambda x: x[0, 0], sharded[i])
            rep = jax.tree_util.tree_map(lambda x: x[0], replicated[i])
            embs.append(run(params["encoders"][pi], sh, rep,
                            rng[0, 0] if dropout_rngs else rng))
        emb = jnp.concatenate(embs, axis=1) if n_pos > 1 else embs[0]
        return emb[None]        # restore the dp block axis

    enc = shard_map(encoder_local, mesh=mesh,
                    in_specs=(P(), P(dp_axis, ep_axis), P(dp_axis),
                              P(dp_axis, ep_axis)),
                    out_specs=P(dp_axis),
                    check_vma=False)

    def loss_fn(params, sharded, replicated, targets, mask, weights,
                rngs, ffn_key, features):
        embs = enc(params, sharded, replicated, rngs)
        if use_features and features is not None:
            embs = jnp.concatenate([embs, features], axis=2)
        n_dp = embs.shape[0]

        def head(emb, key):
            return apply_ffn(params, emb, mcfg,
                             dropout_key=key if dropout_rngs else None,
                             deterministic=not dropout_rngs)
        preds = jax.vmap(head)(embs, jax.random.split(ffn_key, n_dp))
        if mcfg.dataset_type == "multiclass":
            preds = preds.reshape(preds.shape[0], preds.shape[1], -1,
                                  mcfg.multiclass_num_classes)
        elem = elementwise(preds, targets)
        x = elem * mask * weights
        if target_weights is not None:
            x = x * target_weights
        # exact global masked mean over every replica's batch
        return x.sum() / jnp.maximum(mask.sum(), 1.0)

    @jax.jit
    def step(params, opt_state, sharded, replicated, targets, mask,
             weights, rngs, ffn_key, features=None):
        if not isinstance(sharded, (tuple, list)):
            sharded = (sharded,)
            replicated = (replicated,)
        sharded = tuple(sharded)
        replicated = tuple(replicated)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, sharded, replicated, targets, mask, weights,
            rngs, ffn_key, features)
        updates, opt_state = tx.update(grads, opt_state, params)
        gnorm = optax.global_norm(grads)
        return (optax.apply_updates(params, updates), opt_state, loss,
                gnorm)

    return step
