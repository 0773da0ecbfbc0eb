"""Pallas TPU kernel for the wD-MPNN directed-bond aggregation.

The hot op per message-passing depth is

    z[b] = sum_{c : dst(c) = dst(b)} w[c] * msg[c]  -  msg[b]
    m_new[b] = z[rev(b)]                       (then W_h matmul outside)

which equals the reference's gather/sum/subtract (reference mpn.py:110-120)
after the identity src(b) = dst(rev(b)). Expressed this way the whole
aggregation becomes *bond-local over a sorted band*: with bonds sorted by
destination atom, every bond's same-destination peers live within a small
window of its own position. The kernel walks fixed bond tiles, DMAs the
extended window from HBM, builds the banded same-destination one-hot
matrix Q[b, c] = w[c] * [dst(c) == dst(b)] in registers, and contracts it
on the MXU:

    z_tile = Q @ msg_window - msg_tile

No scatter anywhere — the scatter-shaped reduction runs as a systolic
matmul, which is the TPU-native formulation (scatter-add serializes on
TPU; see ops/aggregation.py for the XLA alternatives used as oracles).

The surrounding permutations (natural->sorted, and the fused
reverse+unsort index) are plain gathers whose VJPs are *gathers by the
inverse permutation* (registered via custom_vjp below), so the backward
pass also avoids scatters entirely: the band matrix S = Q is applied
transposed by reusing the same kernel with unit weights.

The production path goes one step further and eliminates the gathers
too (band_rev_layer_step_sorted): rewriting the layer as
m_new[b] = sum_{c: dst(c)=src(b)} w[c] m[c] - m[rev(b)], both terms are
molecule-local in sorted order, so the whole layer folds into a single
banded matmul M[t,c] = w[c]*[dst(c)==src(t)] - [c==srev(t)] whose VJP is
the symmetric band with src/dst swapped — zero permutation gathers in
the entire depth loop. build_sorted_aux verifies the (molecule-span)
window bound per tile and publishes rs_rev only when it holds; the
srev-gather path above remains the fallback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_B = 256     # bonds per output tile (default, r4: fastest measured)
# Extended window: must cover TILE_B + left alignment slack (<=127) + one
# max in-degree run on each side (molecular in-degree <= ~6). 512 = 2
# lanes of headroom; the window-invariant test guards the bound. NOTE the
# rev-fused span budget is ext - tile = 256 at EVERY supported size, so
# shrinking the tile does not shrink the largest-molecule tolerance.
EXT = 512
# Supported tile sizes and their windows. Larger tiles amortize the
# alignment slack (the band matmul does EXT/TILE x the minimal window
# FLOPs: 2x at 256/512, 1.5x at 512/768, 1.25x at 1024/1280) but measure
# SLOWER on v5e — the wider window burns more q@win MXU passes than the
# slack costs. Measured train step (28k edges, h300 d3, healthy tunnel):
# 256: 2.669 ms / 512: 2.702 / 1024: 4.3+; polymer 2.69 vs 2.93;
# inference 1.32 vs 1.41 (docs/kernels.md "r4: smaller band tiles").
_EXT_FOR = {256: 512, 512: 768, 1024: 1280}
LANE = 128
# Atom-readout band kernel: TILE_A atoms per output tile; their incoming
# bonds (contiguous in sorted order) must fit an EXT_A window (~2 bonds per
# atom on molecular graphs -> 512*2 + alignment slack; the host verifies
# per batch and falls back to segment_sum when exceeded).
TILE_A = 256
EXT_A = 1024
# (r4: shrunk from 512/1536 — the readout q contraction does 2*EXT_A*Hp
# FLOPs per atom, so the narrower absolute window wins like the bond
# band's tile-256 flip: interleaved on-chip A/B 2.713 vs 2.774 ms/step.
# EXT_A keeps ~2x margin over the ~2.1 incoming bonds/atom of molecular
# graphs; denser batches fall back to segment_sum via ra=None.)
def band_paths_for(B: int, nblocks: int, hp: int):
    """(fused_ok, plain_ok): VMEM feasibility of the band kernels at the
    lane-padded width hp. The encoder degrades fused -> plain band ->
    XLA-on-unsorted as these bounds fail.

    Bounds are EMPIRICAL compile probes on v5e (2026-08-19, full
    train-step fwd+bwd at HIGH precision, tile 512 / window 768): the
    kernels compile through hp=896 and stack-OOM at hp=1024 (the plain
    band's VJP fits standalone at 1024 but not inside the jitted train
    step, so the in-context bound governs). Analytic VMEM arithmetic
    undercounts because the Mosaic pipeline double-buffers every
    grid-indexed block tile — recalibrate with an in-context compile
    probe if TILE_B/EXT change."""
    tile_b = B // nblocks
    if tile_b <= 256:
        # tile 256 (window 512): the halved window lifts the fused
        # ceiling — probed on chip (2026-08-21): full train step runs at
        # hp=1024 (10.7 ms vs 13.1-13.5 chunked), compile-OOM at 1152
        return hp <= 1024, hp <= 1024
    if tile_b == 512:
        return hp <= 896, hp <= 896
    # tile 1024 (window 1280): probed OK through hp=512, OOM at 640
    return hp <= 512, hp <= 512


class SortedBondAux(NamedTuple):
    """Host-precomputed auxiliary indices for the sorted-band kernel.

    perm:     (B,) natural bond id at each sorted position
    rank:     (B,) sorted position of each natural bond id (inverse of perm)
    rev_rank: (B,) natural-domain gather index: m_new_natural = z_sorted[rev_rank]
    rev_rank_inv: inverse permutation of rev_rank (for the VJP)
    srev:     (B,) sorted-domain reverse-bond permutation
              (srev[s] = rank[rev_natural(perm[s])]); an INVOLUTION, so it
              is its own inverse — the sorted-resident encoder path uses it
              as the single per-layer gather.
    rs:       (nblocks,) window start (element offset) per bond tile
    dst_sorted: (B,) destination atom ids in sorted order
    w_sorted: (B,) bond weights in sorted order
    ra:       (num_atoms/TILE_A,) sorted-bond window start per atom tile
              for the band-matmul atom readout, or None when the batch
              violates the EXT_A window bound (falls back to segment_sum)
    src_sorted: (B,) source atom ids in sorted order
    rs_rev:   (nblocks,) window start per bond tile for the REV-FUSED layer
              kernel (band_rev_layer_step_sorted): tile j's window must
              cover, for every real bond t in the tile, the whole same-dst
              run of atom src(t) (fwd; contains srev[t]) and every bond
              whose src equals dst(t) (bwd) — all inside t's molecule's
              contiguous sorted range. None when some tile's span exceeds
              the window (falls back to the srev-gather path)
    """

    perm: np.ndarray
    rank: np.ndarray
    rev_rank: np.ndarray
    rev_rank_inv: np.ndarray
    srev: np.ndarray
    rs: np.ndarray
    dst_sorted: np.ndarray
    w_sorted: np.ndarray
    ra: "np.ndarray | None" = None
    src_sorted: "np.ndarray | None" = None
    rs_rev: "np.ndarray | None" = None


# running counts of band-layout decisions (VERDICT r3 item 8): when a
# tile's same-src/same-dst span exceeds the kernel window EXT, the batch
# silently loses the REV-FUSED layer (rs_rev=None -> srev-gather path).
# The trainer/bench read these to surface the per-run fallback rate.
# Lock-guarded: the loader featurizes batches from a thread pool, and
# a lost increment would misreport the very rate this exists to surface.
import threading as _threading

FALLBACK_STATS = {"batches": 0, "rev_fallback": 0, "atom_fallback": 0}
_FALLBACK_LOCK = _threading.Lock()


def _note_layout(rev_fallback: bool, atom_fallback: bool) -> None:
    with _FALLBACK_LOCK:
        FALLBACK_STATS["batches"] += 1
        if rev_fallback:
            FALLBACK_STATS["rev_fallback"] += 1
        if atom_fallback:
            FALLBACK_STATS["atom_fallback"] += 1


def fallback_stats() -> dict:
    with _FALLBACK_LOCK:
        return dict(FALLBACK_STATS)


def reset_fallback_stats() -> None:
    with _FALLBACK_LOCK:
        for k in FALLBACK_STATS:
            FALLBACK_STATS[k] = 0


def build_sorted_aux(b2dst: np.ndarray, b2revb: np.ndarray,
                     w_bonds: np.ndarray,
                     num_atoms: "int | None" = None,
                     tile_b: int = TILE_B) -> SortedBondAux:
    """Precompute sorted-band indices for one GraphBatch (cache per batch).

    ``tile_b`` picks the band-kernel tile size (256/512/1024); the kernels
    infer it back from ``len(rs)`` so no extra plumbing is needed."""
    ext = _EXT_FOR[tile_b]
    B = int(b2dst.shape[0])
    assert B % tile_b == 0, f"pad_bonds must be a multiple of {tile_b}"
    assert B >= ext, f"pad_bonds must be at least {ext}"
    # Sort padding bonds (dst == 0: slot 0 + batch padding) LAST via a
    # sentinel key: the padding run can exceed the window headroom, and its
    # outputs are never consumed, so it must not sit inside real tiles'
    # windows. Real runs are bounded by molecular in-degree (~6) << EXT-TILE_B.
    dst = b2dst.astype(np.int64)
    key = np.where(dst > 0, dst, np.int64(1) << 30)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    sorted_key = key[perm]
    rank = np.empty(B, np.int32)
    rank[perm] = np.arange(B, dtype=np.int32)
    # Padding bonds all carry b2revb == 0, which would make the reverse map
    # many-to-one and break the bijective (scatter-free) VJP of the
    # permutation gathers. Padding bonds become their own reverse instead —
    # a true permutation, with identical semantics for real bonds (padding
    # outputs are never consumed).
    idx = np.arange(B, dtype=b2revb.dtype)
    rev_eff = np.where((b2revb == 0) & (idx != 0), idx, b2revb)
    # m_new[b] = z[rev(b)]; producing natural order directly from z_sorted:
    # out natural position b reads z_sorted[rank[rev(b)]]
    rev_rank = rank[rev_eff].astype(np.int32)
    rev_rank_inv = np.empty(B, np.int32)
    rev_rank_inv[rev_rank] = np.arange(B, dtype=np.int32)
    srev = rank[rev_eff[perm]].astype(np.int32)
    dst_sorted = b2dst[perm].astype(np.int32)
    w_sorted = w_bonds[perm].astype(np.float32)
    nblocks = B // tile_b
    rs = np.empty(nblocks, np.int32)
    for j in range(nblocks):
        lo_key = sorted_key[j * tile_b]
        start = int(np.searchsorted(sorted_key, lo_key, side="left"))
        # Mosaic requires dynamic HBM slice starts aligned to the tiling;
        # we align to a full 128-lane row so the (B/128, 128)-packed weight
        # and dst windows slice cleanly. Rounding down only widens the
        # window left; ext leaves (ext - tile_b) slack so the right edge
        # still covers every same-dst peer (in-degree << slack).
        start &= ~127
        rs[j] = min(max(start, 0), B - ext)
    # atom-tile windows for the band-matmul readout: the incoming bonds of
    # atoms [t*TILE_A, (t+1)*TILE_A) are contiguous in sorted order
    # window-coverage invariant: every real bond's same-destination run
    # must fit its tile's [rs, rs+ext) window (guards both tile sizes;
    # sentinel/padding rows are never consumed so they are exempt)
    pad_start = int(np.searchsorted(sorted_key, np.int64(1) << 30, "left"))
    for j in range(nblocks):
        last_real = min((j + 1) * tile_b, pad_start) - 1
        if last_real < j * tile_b:
            continue
        hi = int(np.searchsorted(sorted_key, sorted_key[last_real], "right"))
        assert hi - rs[j] <= ext, (
            f"band window overflow: tile {j} needs {hi - rs[j]} > {ext}")
    # rev-fused layer windows: out[t] = sum_{dst(c)=src(t)} w[c] m[c]
    # - m[srev[t]] needs the same-dst run of atom src(t); its VJP needs
    # all bonds with src == dst(t). Both are molecule-local, so per-tile
    # exact spans are cheap to compute; if any tile's span exceeds ext the
    # whole batch falls back (rs_rev = None).
    # src(b) = dst(rev(b)); padding bonds are their own reverse -> src 0
    src_sorted = b2dst[rev_eff[perm]].astype(np.int32)
    rs_rev: "np.ndarray | None" = np.full(nblocks, max(0, B - ext), np.int32)
    if pad_start > 0:
        real_src = src_sorted[:pad_start].astype(np.int64)
        real_dst = dst[perm[:pad_start]]
        n_at = int(max(real_src.max(), real_dst.max())) + 1
        pos64 = np.arange(pad_start, dtype=np.int64)
        src_lo = np.full(n_at, B, np.int64)
        src_hi = np.zeros(n_at, np.int64)
        np.minimum.at(src_lo, real_src, pos64)
        np.maximum.at(src_hi, real_src, pos64 + 1)
        lo_all = np.minimum(
            np.searchsorted(sorted_key, real_src, side="left"),
            src_lo[real_dst])
        hi_all = np.maximum(
            np.searchsorted(sorted_key, real_src, side="right"),
            src_hi[real_dst])
        for j in range(nblocks):
            a, b = j * tile_b, min((j + 1) * tile_b, pad_start)
            t_end = min((j + 1) * tile_b, B)
            if a >= pad_start:
                # all-padding tile: srev(t) = t (padding bonds are their
                # own reverse), so the window must cover the tile's OWN
                # rows — clamping to B - ext alone can start the window
                # past the tile when tile_b < ext (caught by
                # TestRevFusedBand at tile 256)
                rs_rev[j] = min(a, B - ext)
                continue
            # cover the tile's own span too: its padding tail (rows
            # [b, t_end)) needs m[srev(t)] = m[t] in-window
            lo = min(int(lo_all[a:b].min()), a)
            hi = max(int(hi_all[a:b].max()), t_end)
            start = lo & ~127
            start = min(max(start, 0), B - ext)
            if hi - start > ext:
                rs_rev = None
                break
            rs_rev[j] = start
    ra = None
    if (num_atoms is not None and num_atoms % TILE_A == 0 and B >= EXT_A):
        n_at = num_atoms // TILE_A
        ra_arr = np.empty(n_at, np.int32)
        ok = True
        for t in range(n_at):
            lo = int(np.searchsorted(sorted_key, t * TILE_A, side="left"))
            hi = int(np.searchsorted(sorted_key, (t + 1) * TILE_A,
                                     side="left"))
            start = lo & ~127
            start = min(max(start, 0), B - EXT_A)
            if hi - start > EXT_A:
                ok = False
                break
            ra_arr[t] = start
        if ok:
            ra = ra_arr
    _note_layout(rs_rev is None, ra is None and num_atoms is not None)
    return SortedBondAux(perm, rank, rev_rank, rev_rank_inv, srev, rs,
                         dst_sorted, w_sorted, ra, src_sorted, rs_rev)


# ---------------------------------------------------------------------------
# permutation gather with gather-based VJP (avoids autodiff scatter)
# ---------------------------------------------------------------------------

def permute_rows(x, idx, inv_idx):
    """x[idx] with a gather-based VJP (grad -> g[inv_idx]) so the backward
    pass never emits a scatter. idx must be a permutation with inverse
    inv_idx."""

    @jax.custom_vjp
    def op(x_):
        return x_[idx]

    def fwd(x_):
        return x_[idx], None

    def bwd(_, g):
        return (g[inv_idx],)

    op.defvjp(fwd, bwd)
    return op(x)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

_DN = (((1,), (0,)), ((), ()))


def _dot_band(a, b, precision, a_exact: bool = False):
    """MXU matmul at the requested precision.

    Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass fp32
    emulation). HIGH (bf16_3x) is implemented manually: split both operands
    into bf16 hi/lo halves and accumulate the three significant cross terms
    (hi*hi + hi*lo + lo*hi) in f32 — ~2x the throughput of HIGHEST with
    ~1.5e-5 relative error (vs ~4e-3 for DEFAULT), comfortably inside the
    encoder's 1e-4 parity tolerance.

    a_exact=True asserts every element of ``a`` is exactly representable in
    bf16 (e.g. unit bond weights, or 0/1 one-hot bands): a_lo is then
    identically zero, so the a_lo*b_hi pass is skipped WITHOUT any
    accuracy loss (2 passes)."""
    if precision == jax.lax.Precision.HIGH:
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(a_hi, b_hi, _DN,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(a_hi, b_lo, _DN,
                                   preferred_element_type=jnp.float32)
        if not a_exact:
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += jax.lax.dot_general(a_lo, b_hi, _DN,
                                       preferred_element_type=jnp.float32)
        return acc
    return jax.lax.dot_general(a, b, _DN,
                               preferred_element_type=jnp.float32,
                               precision=precision)

# activations supported inside the fused kernel epilogue, with their
# derivatives expressible from the OUTPUT value a (so the backward needs
# no extra saved pre-activation): see _act_grad_from_output
_ACT_FNS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "leakyrelu": lambda x: jnp.where(x > 0, x, 0.1 * x),
    "prelu": lambda x: jnp.where(x > 0, x, 0.25 * x),
    "tanh": jnp.tanh,
    "elu": lambda x: jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0),
    "selu": jax.nn.selu,
}
_SELU_L = 1.0507009873554805
_SELU_AL = 1.6732632423543772 * _SELU_L


def _act_grad_from_output(name: str, a: jnp.ndarray) -> jnp.ndarray:
    """d act/d pre as a function of the activation OUTPUT a (all supported
    activations are monotone through 0, so sign(a) == sign(pre))."""
    if name == "relu":
        return (a > 0).astype(a.dtype)
    if name == "leakyrelu":
        return jnp.where(a > 0, 1.0, 0.1)
    if name == "prelu":
        return jnp.where(a > 0, 1.0, 0.25)
    if name == "tanh":
        return 1.0 - a * a
    if name == "elu":
        return jnp.where(a > 0, 1.0, a + 1.0)
    if name == "selu":
        return jnp.where(a > 0, _SELU_L, a + _SELU_AL)
    raise ValueError(name)


def _band_matmul_kernel(rs_ref, dst_tile_ref, msg_tile_ref, wh_ref,
                        msg_hbm, w_hbm, dst_hbm,
                        out_ref, z_ref,
                        msg_win, w_win, dst_win, sems, *,
                        nblocks, ext=EXT,
                        precision=jax.lax.Precision.HIGHEST,
                        w_exact=False):
    """One bond tile with the message-update matmul fused:
    out = (Q @ msg_window - msg_tile) @ W_h.

    Row-wise matmuls commute with the reverse-bond permutation applied
    outside, so fusing W_h here saves writing+re-reading the intermediate
    z to HBM as an *input* of the next op; z is still written out once
    (z_ref) so the backward pass can form dW_h = z^T g without re-running
    the band aggregation.

    The window DMAs are DOUBLE-BUFFERED: the copies for tile j+1 are
    issued before computing tile j, so the HBM fetch overlaps the MXU
    matmuls (scratch leading dim = 2 slots)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(msg_hbm.at[pl.ds(start, ext), :],
                                  msg_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(w_hbm.at[pl.ds(row, ext // 128), :],
                                  w_win.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, ext // 128), :],
                                  dst_win.at[sl], sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    dst_tile = dst_tile_ref[:, 0:1]
    dst_w = dst_win[slot].reshape(1, ext)
    w = w_win[slot].reshape(1, ext)
    q = jnp.where(dst_tile == dst_w, w, 0.0)
    z = _dot_band(q, msg_win[slot], precision, w_exact) - msg_tile_ref[:, :]
    z_ref[:, :] = z
    out_ref[:, :] = _dot_band(z, wh_ref[:, :], precision)


def _band_kernel(rs_ref, dst_tile_ref, msg_tile_ref,
                 msg_hbm, w_hbm, dst_hbm,
                 out_ref,
                 msg_win, w_win, dst_win, sems, *,
                 nblocks, ext=EXT,
                 precision=jax.lax.Precision.HIGHEST,
                 w_exact=False):
    """One bond tile: out = Q @ msg_window - msg_tile.

    Window DMAs are double-buffered across grid steps (see
    _band_matmul_kernel)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        # build_sorted_aux aligns starts to 128 rows; the hints let Mosaic
        # prove the dynamic HBM slices respect the (8, 128) tiling
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(msg_hbm.at[pl.ds(start, ext), :],
                                  msg_win.at[sl], sems.at[sl, 0]),
            # w/dst are packed (B/128, 128); the window is ext/128 rows
            pltpu.make_async_copy(w_hbm.at[pl.ds(row, ext // 128), :],
                                  w_win.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, ext // 128), :],
                                  dst_win.at[sl], sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    dst_tile = dst_tile_ref[:, 0:1]                    # (tile_b, 1)
    dst_w = dst_win[slot].reshape(1, ext)              # (1, ext)
    w = w_win[slot].reshape(1, ext)                    # (1, ext)
    # banded same-destination one-hot, weighted
    q = jnp.where(dst_tile == dst_w, w, 0.0)
    # precision: the MXU's default single-pass bf16 f32 emulation loses
    # ~1e-3 relative accuracy; the band matmul is the whole aggregation so
    # it must track the XLA segment-sum path closely — HIGH (manual 3-pass)
    # or HIGHEST (6-pass) both do (see _dot_band).
    acc = _dot_band(q, msg_win[slot], precision, w_exact)
    out_ref[:, :] = acc - msg_tile_ref[:, :]


def _band_bwd_kernel(rs_ref, dst_tile_ref, g_tile_ref, wrow_tile_ref,
                     g_hbm, dst_hbm,
                     out_ref,
                     g_win, dst_win, sems, *,
                     nblocks, ext=EXT,
                     precision=jax.lax.Precision.HIGHEST):
    """One tile of the band VJP: dm = w ∘ (K @ g_window) − g_tile, with
    K the UNIT same-destination band (K = band of ones). Equivalent to
    w∘(band1(g)+g)−g but with the row scaling fused (no separate
    elementwise pass) and no weight-window DMA at all — the unit Q is
    built from the dst comparison alone, and unit weights are bf16-exact
    so the matmul runs in the exact 2-pass mode."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(g_hbm.at[pl.ds(start, ext), :],
                                  g_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, ext // 128), :],
                                  dst_win.at[sl], sems.at[sl, 1]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    dst_tile = dst_tile_ref[:, 0:1]
    dst_w = dst_win[slot].reshape(1, ext)
    q = jnp.where(dst_tile == dst_w, 1.0, 0.0)
    acc = _dot_band(q, g_win[slot], precision, True)
    out_ref[:, :] = wrow_tile_ref[:, 0:1] * acc - g_tile_ref[:, :]


def _band_bwd_apply(g_sorted: jnp.ndarray, w_sorted: jnp.ndarray,
                    dst_sorted: jnp.ndarray, rs: jnp.ndarray,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """dm = w ∘ (K g) − g — the shared VJP of every band op w.r.t. its
    message input (S^T g − g with S^T g = w∘(K g))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = g_sorted.shape
    nblocks = int(rs.shape[0])
    tile_b = B // nblocks
    ext = _EXT_FOR[tile_b]
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)
    d_bcast = jnp.broadcast_to(dst_sorted.astype(jnp.float32)[:, None],
                               (B, LANE))
    w_bcast = jnp.broadcast_to(w_sorted[:, None], (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # dst tile
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),    # g tile
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # w rows
            pl.BlockSpec(memory_space=pl.ANY),                   # g HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # dst HBM
        ],
        out_specs=pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_bwd_kernel, precision=precision,
                          nblocks=nblocks, ext=ext),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp), jnp.float32),
    )
    return fn(rs, d_bcast, g_sorted, w_bcast, g_sorted, d2)


def _band_apply(msg_sorted: jnp.ndarray, w_sorted: jnp.ndarray,
                dst_sorted: jnp.ndarray, rs: jnp.ndarray,
                precision=jax.lax.Precision.HIGHEST,
                w_exact: bool = False) -> jnp.ndarray:
    """z_sorted = S @ msg_sorted - msg_sorted via the band kernel.

    msg_sorted: (B, Hp) f32 with Hp a multiple of 128; w/dst: (B,) arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = msg_sorted.shape
    nblocks = int(rs.shape[0])
    tile_b = B // nblocks          # aux builder's tile choice travels in rs
    ext = _EXT_FOR[tile_b]
    # pack per-bond scalars into full 128-lane rows for clean DMA slicing
    w2 = w_sorted.reshape(B // 128, 128)
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)
    # tile-side dst ids lane-broadcast so the block shape is (tile_b, 128)
    d_bcast = jnp.broadcast_to(dst_sorted.astype(jnp.float32)[:, None],
                               (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # dst tile
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),   # msg tile
            pl.BlockSpec(memory_space=pl.ANY),               # msg HBM
            pl.BlockSpec(memory_space=pl.ANY),               # w HBM
            pl.BlockSpec(memory_space=pl.ANY),               # dst HBM
        ],
        out_specs=pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_kernel, precision=precision,
                          nblocks=nblocks, ext=ext, w_exact=w_exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp), jnp.float32),
    )
    return fn(rs, d_bcast, msg_sorted, msg_sorted, w2, d2)


def _band_op(msg_sorted, w_sorted, dst_sorted, rs,
             precision=jax.lax.Precision.HIGHEST, w_exact: bool = False):
    """Band kernel with custom VJP. z = S msg - msg where
    S[b, c] = w[c] * [dst(c) == dst(b)].

    dmsg = S^T g - g, and (S^T g)[c] = w[c] * sum_b [dst b == dst c] g[b].
    The unit-weight band op computes K g - g with the symmetric pattern
    K[b, c] = [dst(c) == dst(b)], so S^T g = w * (band1(g) + g)."""

    @jax.custom_vjp
    def op(m):
        return _band_apply(m, w_sorted, dst_sorted, rs, precision, w_exact)

    def fwd(m):
        return _band_apply(m, w_sorted, dst_sorted, rs, precision,
                           w_exact), None

    def bwd(_, g):
        return (_band_bwd_apply(g, w_sorted, dst_sorted, rs, precision),)

    op.defvjp(fwd, bwd)
    return op(msg_sorted)


# -- sorted-resident encoder path -------------------------------------------
# Messages stay in dst-sorted order across the whole depth loop: the W_h
# matmul, residual and activation are row-wise so they commute with the
# permutation, leaving ONE gather per layer (srev, an involution) instead
# of sort + reverse + unsort.

def pad_lane(x: jnp.ndarray) -> jnp.ndarray:
    H = x.shape[1]
    Hp = ((H + LANE - 1) // LANE) * LANE
    return jnp.pad(x, ((0, 0), (0, Hp - H))) if Hp != H else x


def to_sorted(x: jnp.ndarray, aux: dict) -> jnp.ndarray:
    """Natural -> sorted bond order (rows padded to a lane multiple)."""
    return permute_rows(pad_lane(x), aux["perm"], aux["rank"])


BAND_CHUNK = 768   # widest chunk the bond kernels admit (probed at the
# r3 EXT=768 windows; the r4 EXT=512 default only shrinks the buffers)
ATOM_CHUNK = 512   # the atom kernels held double the bond window rows at
# the r3 EXT_A=1536, making their in-context VMEM bound tighter
# (measured: 17.3 MB > the 16 MB scoped limit at 768 inside the jitted
# train step); the r4 EXT_A=1024 halves that pressure — 512 stays the
# conservative probed value


def _chunked_cols(fn, x: jnp.ndarray, chunk: int = BAND_CHUNK) -> jnp.ndarray:
    """Apply fn per <=chunk-wide column slice and re-concatenate.

    The band kernels hold an (2, EXT, Hp) f32 window in VMEM, which
    overflows past Hp ~ 896; the banded contraction is columnwise-
    independent, so wide hidden sizes (hyperopt searches up to 2400)
    run as several narrow kernel invocations instead of degrading to
    the XLA scatter path. Each slice/concat differentiates as a
    slice/concat — the per-chunk custom VJPs keep both directions
    scatter-free. Chunk widths stay multiples of 128 (lane tiling)."""
    Hp = x.shape[1]
    if Hp <= chunk:
        return fn(x)
    return jnp.concatenate([fn(x[:, c:c + chunk])
                            for c in range(0, Hp, chunk)], axis=1)


def band_message_step_sorted(msg_sorted: jnp.ndarray, aux: dict,
                             precision=jax.lax.Precision.HIGHEST,
                             w_exact: bool = False) -> jnp.ndarray:
    """m_new (sorted order) = (S msg - msg)[srev]. Column-chunked for
    wide hidden sizes (see _chunked_cols). The 1024-bond tile variant
    holds 1280-row windows, so its chunk bound is tighter (probed OK
    through hp=512, stack-OOM at 640 — band_paths_for)."""
    tile_b = msg_sorted.shape[0] // int(aux["rs"].shape[0])
    chunk = BAND_CHUNK if tile_b == 512 else 512
    z = _chunked_cols(
        lambda m: _band_op(m, aux["w_sorted"], aux["dst_sorted"], aux["rs"],
                           precision, w_exact), msg_sorted, chunk=chunk)
    return permute_rows(z, aux["srev"], aux["srev"])


def _band_matmul_apply(msg_sorted, w_sorted, dst_sorted, rs, wh_padded,
                       precision=jax.lax.Precision.HIGHEST,
                       w_exact: bool = False):
    """((S msg - msg) @ W, S msg - msg) via the fused kernel;
    wh_padded is (Hp, Hp). The z intermediate is written out once so the
    VJP can reuse it (dW = z^T g) without re-running the aggregation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = msg_sorted.shape
    nblocks = int(rs.shape[0])
    tile_b = B // nblocks          # aux builder's tile choice travels in rs
    ext = _EXT_FOR[tile_b]
    w2 = w_sorted.reshape(B // 128, 128)
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)
    d_bcast = jnp.broadcast_to(dst_sorted.astype(jnp.float32)[:, None],
                               (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),   # dst tile
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),     # msg tile
            pl.BlockSpec((Hp, Hp), lambda j, rs: (0, 0)),         # W_h
            pl.BlockSpec(memory_space=pl.ANY),                    # msg HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # w HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # dst HBM
        ],
        out_specs=(pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
                   pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_matmul_kernel, precision=precision,
                          nblocks=nblocks, ext=ext, w_exact=w_exact),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32)),
    )
    return fn(rs, d_bcast, msg_sorted, wh_padded, msg_sorted, w2, d2)


def band_matmul_step_sorted(msg_sorted: jnp.ndarray, wh: jnp.ndarray,
                            aux: dict,
                            precision=jax.lax.Precision.HIGHEST,
                            w_exact: bool = False) -> jnp.ndarray:
    """Fused wD-MPNN layer core in sorted order:
    ((S msg - msg) @ W_h)[srev] — the message aggregation, reverse-bond
    step and update matmul, with the intermediate z never touching HBM.

    wh: (H_in, H_out) update matrix; rows/cols are zero-padded to the lane
    -padded Hp internally (zero padding is exact: padded input columns of
    msg are zero and padded output columns are discarded by the caller).
    """
    B, Hp = msg_sorted.shape
    w_sorted = aux["w_sorted"]
    dst_sorted = aux["dst_sorted"]
    rs = aux["rs"]

    def pad_w(w):
        return jnp.zeros((Hp, Hp), jnp.float32) \
            .at[:w.shape[0], :w.shape[1]].set(w)

    @jax.custom_vjp
    def op(m, w):
        return _band_matmul_apply(m, w_sorted, dst_sorted, rs, pad_w(w),
                                  precision, w_exact)[0]

    def fwd(m, w):
        out, z = _band_matmul_apply(m, w_sorted, dst_sorted, rs, pad_w(w),
                                    precision, w_exact)
        return out, (z, w)

    def bwd(res, g):
        z, w = res
        # z = S m - m (saved by the forward kernel);  out = z @ Wp
        # dW = z^T g (sliced to w's shape); dm = (S^T - I)(g @ Wp^T)
        dw = (z.T @ g)[:w.shape[0], :w.shape[1]]
        # keep gw at the padded width: g @ pad(w).T has identically-zero
        # trailing columns, replacing a (B, H) slice + (B, Hp) pad pair
        # (two full HBM round-trips of the message-sized array) with 28%
        # extra MXU work on one already-fast dot (r4 floor shave)
        gw = g @ pad_w(w).T
        dm = _band_bwd_apply(gw, w_sorted, dst_sorted, rs, precision)
        return dm, dw

    op.defvjp(fwd, bwd)
    out = op(msg_sorted, wh)
    return permute_rows(out, aux["srev"], aux["srev"])


def _band_matmul_act_kernel(rs_ref, dst_tile_ref, msg_tile_ref, wh_ref,
                            inp_tile_ref,
                            msg_hbm, w_hbm, dst_hbm,
                            out_ref, z_ref,
                            msg_win, w_win, dst_win, sems, *,
                            nblocks, ext=EXT, act="relu",
                            precision=jax.lax.Precision.HIGHEST,
                            w_exact=False):
    """_band_matmul_kernel with the layer epilogue fused as well:
    out = act(inputs_tile + (Q @ msg_window - msg_tile) @ W_h).

    The residual/activation elementwise pass otherwise costs a full extra
    read+write of the (B, Hp) message array through HBM per layer.
    ``inputs_tile`` must be pre-permuted by srev by the caller so that the
    subsequent srev gather of the output reproduces
    act(inputs + z_wh[srev]) (srev is an involution)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(msg_hbm.at[pl.ds(start, ext), :],
                                  msg_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(w_hbm.at[pl.ds(row, ext // 128), :],
                                  w_win.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, ext // 128), :],
                                  dst_win.at[sl], sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    dst_tile = dst_tile_ref[:, 0:1]
    dst_w = dst_win[slot].reshape(1, ext)
    w = w_win[slot].reshape(1, ext)
    q = jnp.where(dst_tile == dst_w, w, 0.0)
    z = _dot_band(q, msg_win[slot], precision, w_exact) - msg_tile_ref[:, :]
    z_ref[:, :] = z
    pre = _dot_band(z, wh_ref[:, :], precision) + inp_tile_ref[:, :]
    out_ref[:, :] = _ACT_FNS[act](pre)


def _band_matmul_act_apply(msg_sorted, w_sorted, dst_sorted, rs, wh_padded,
                           inp_srev, act,
                           precision=jax.lax.Precision.HIGHEST,
                           w_exact=False):
    """(act(inp_srev + (S msg - msg) @ W), S msg - msg) via the fused
    kernel with the activation epilogue."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = msg_sorted.shape
    nblocks = int(rs.shape[0])
    tile_b = B // nblocks
    ext = _EXT_FOR[tile_b]
    w2 = w_sorted.reshape(B // 128, 128)
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)
    d_bcast = jnp.broadcast_to(dst_sorted.astype(jnp.float32)[:, None],
                               (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),   # dst tile
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),     # msg tile
            pl.BlockSpec((Hp, Hp), lambda j, rs: (0, 0)),         # W_h
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),     # inputs
            pl.BlockSpec(memory_space=pl.ANY),                    # msg HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # w HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # dst HBM
        ],
        out_specs=(pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
                   pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_matmul_act_kernel, precision=precision,
                          nblocks=nblocks, ext=ext, act=act,
                          w_exact=w_exact),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32)),
    )
    return fn(rs, d_bcast, msg_sorted, wh_padded, inp_srev,
              msg_sorted, w2, d2)


def band_matmul_act_step_sorted(msg_sorted: jnp.ndarray, wh: jnp.ndarray,
                                inp_srev: jnp.ndarray, aux: dict,
                                act: str,
                                precision=jax.lax.Precision.HIGHEST,
                                w_exact: bool = False) -> jnp.ndarray:
    """Whole wD-MPNN layer in one fused kernel + one gather:

        act(inputs + ((S m - m) @ W_h)[srev])
      = act(inp_srev + (S m - m) @ W_h)[srev]      (srev is an involution)

    Returns the NEW message in sorted order. The backward pass derives the
    activation derivative from the saved output (all supported
    activations are monotone through zero), so it needs no extra
    residuals beyond (z, out)."""
    B, Hp = msg_sorted.shape
    w_sorted = aux["w_sorted"]
    dst_sorted = aux["dst_sorted"]
    rs = aux["rs"]

    def pad_w(w):
        return jnp.zeros((Hp, Hp), jnp.float32) \
            .at[:w.shape[0], :w.shape[1]].set(w)

    @jax.custom_vjp
    def op(m, w, inp):
        return _band_matmul_act_apply(m, w_sorted, dst_sorted, rs, pad_w(w),
                                      inp, act, precision, w_exact)[0]

    def fwd(m, w, inp):
        out, z = _band_matmul_act_apply(m, w_sorted, dst_sorted, rs,
                                        pad_w(w), inp, act, precision,
                                        w_exact)
        return out, (z, w, out)

    def bwd(res, g):
        z, w, a = res
        g_pre = g * _act_grad_from_output(act, a)
        dw = (z.T @ g_pre)[:w.shape[0], :w.shape[1]]
        # padded-width gw: see band_matmul_step_sorted bwd
        gw = g_pre @ pad_w(w).T
        dm = _band_bwd_apply(gw, w_sorted, dst_sorted, rs, precision)
        return dm, dw, g_pre

    op.defvjp(fwd, bwd)
    out = op(msg_sorted, wh, inp_srev)
    return permute_rows(out, aux["srev"], aux["srev"])


# ---------------------------------------------------------------------------
# rev-fused layer: the reverse-bond permutation folded INTO the band matrix
# ---------------------------------------------------------------------------
#
# The layer update in natural bond terms is
#     m_new[b] = sum_{c : dst(c) = src(b)} w[c] m[c]  -  m[rev(b)]
# (reference mpn.py:110-120 after src(b) = dst(rev(b))). In sorted order
# both terms are molecule-local, so the WHOLE right-hand side is one banded
# matmul with
#     M[t, c] = w[c] * [dst(c) == src(t)]  -  [c == srev(t)]
# (the rev bond sits inside the same-src run, so its combined entry is
# w - 1). This removes the per-layer srev permutation gather entirely —
# fwd AND bwd (the VJP band is the symmetric M^T, built the same way with
# src/dst swapped) — at the cost of windows that must span the molecule's
# sorted range instead of a single dst run (build_sorted_aux checks the
# span per tile and disables the path via rs_rev=None when it overflows).


def _band_rev_act_kernel(rs_ref, src_tile_ref, srev_tile_ref,
                         wh_ref, inp_tile_ref,
                         msg_hbm, w_hbm, dst_hbm,
                         *out_and_scratch,
                         nblocks, ext=EXT, act="relu",
                         precision=jax.lax.Precision.HIGHEST,
                         w_exact=False, write_z=True):
    """Whole wD-MPNN layer tile, zero gathers:
    out = act(inputs_tile + (M @ msg_window) @ W_h) with M as above.
    The -m[rev] term rides the band, so no msg tile operand is needed.
    ``write_z=False`` (inference: the custom_vjp primal) skips the z
    output — z is only needed by the backward for dW_h."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if write_z:
        out_ref, z_ref, msg_win, w_win, dst_win, sems = out_and_scratch
    else:
        out_ref, msg_win, w_win, dst_win, sems = out_and_scratch
        z_ref = None

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(msg_hbm.at[pl.ds(start, ext), :],
                                  msg_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(w_hbm.at[pl.ds(row, ext // 128), :],
                                  w_win.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, ext // 128), :],
                                  dst_win.at[sl], sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    src_t = src_tile_ref[:, 0:1]
    srev_t = srev_tile_ref[:, 0:1]
    dst_w = dst_win[slot].reshape(1, ext)
    w = w_win[slot].reshape(1, ext)
    # window columns' absolute sorted positions (int32: Mosaic iota)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1) + rs_ref[j]
    q = jnp.where(dst_w == src_t, w, 0.0) - (pos == srev_t).astype(
        jnp.float32)
    z = _dot_band(q, msg_win[slot], precision, w_exact)
    if z_ref is not None:
        z_ref[:, :] = z
    pre = _dot_band(z, wh_ref[:, :], precision) + inp_tile_ref[:, :]
    out_ref[:, :] = _ACT_FNS[act](pre)


def _band_rev_bwd_kernel(rs_ref, dst_tile_ref, w_tile_ref, srev_tile_ref,
                         g_hbm, src_hbm,
                         out_ref,
                         g_win, src_win, sems, *,
                         nblocks, ext=EXT,
                         precision=jax.lax.Precision.HIGHEST,
                         w_exact=False):
    """VJP of the rev-fused band w.r.t. the message input: dm = M^T @ g.

    M^T[c, t] = w[c] * [src(t) == dst(c)] - [t == srev(c)] (c == srev(t)
    iff t == srev(c); srev is an involution) — the same banded build with
    the roles of src/dst swapped and the weight on the OUTPUT row."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(rs_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(g_hbm.at[pl.ds(start, ext), :],
                                  g_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(src_hbm.at[pl.ds(row, ext // 128), :],
                                  src_win.at[sl], sems.at[sl, 1]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    dst_t = dst_tile_ref[:, 0:1]
    w_t = w_tile_ref[:, 0:1]
    srev_t = srev_tile_ref[:, 0:1]
    src_w = src_win[slot].reshape(1, ext)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1) + rs_ref[j]
    q = jnp.where(src_w == dst_t, w_t, 0.0) - (pos == srev_t).astype(
        jnp.float32)
    out_ref[:, :] = _dot_band(q, g_win[slot], precision, w_exact)


def _band_rev_act_apply(msg_sorted, w_sorted, dst_sorted, src_sorted,
                        srev, rs_rev, wh_padded, inputs, act,
                        precision=jax.lax.Precision.HIGHEST,
                        w_exact=False, write_z=True):
    """(act(inputs + (M msg) @ W_h), M msg) via the rev-fused kernel;
    with write_z=False returns only the activation (inference)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = msg_sorted.shape
    nblocks = int(rs_rev.shape[0])
    tile_b = B // nblocks
    ext = _EXT_FOR[tile_b]
    w2 = w_sorted.reshape(B // 128, 128)
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)
    src_bcast = jnp.broadcast_to(src_sorted.astype(jnp.float32)[:, None],
                                 (B, LANE))
    srev_bcast = jnp.broadcast_to(srev.astype(jnp.int32)[:, None],
                                  (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),   # src tile
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),   # srev tile
            pl.BlockSpec((Hp, Hp), lambda j, rs: (0, 0)),         # W_h
            pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),     # inputs
            pl.BlockSpec(memory_space=pl.ANY),                    # msg HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # w HBM
            pl.BlockSpec(memory_space=pl.ANY),                    # dst HBM
        ],
        out_specs=(pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
                   pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)))
        if write_z else pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_rev_act_kernel, precision=precision,
                          nblocks=nblocks, ext=ext, act=act,
                          w_exact=w_exact, write_z=write_z),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32))
        if write_z else jax.ShapeDtypeStruct((B, Hp), jnp.float32),
    )
    return fn(rs_rev, src_bcast, srev_bcast, wh_padded, inputs,
              msg_sorted, w2, d2)


def _band_rev_bwd_apply(g_sorted, w_sorted, dst_sorted, src_sorted,
                        srev, rs_rev,
                        precision=jax.lax.Precision.HIGHEST,
                        w_exact=False):
    """dm = M^T @ g via the symmetric rev-fused band."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = g_sorted.shape
    nblocks = int(rs_rev.shape[0])
    tile_b = B // nblocks
    ext = _EXT_FOR[tile_b]
    s2 = src_sorted.astype(jnp.float32).reshape(B // 128, 128)
    dst_bcast = jnp.broadcast_to(dst_sorted.astype(jnp.float32)[:, None],
                                 (B, LANE))
    w_bcast = jnp.broadcast_to(w_sorted[:, None], (B, LANE))
    srev_bcast = jnp.broadcast_to(srev.astype(jnp.int32)[:, None],
                                  (B, LANE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # dst tile
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # w rows
            pl.BlockSpec((tile_b, LANE), lambda j, rs: (j, 0)),  # srev tile
            pl.BlockSpec(memory_space=pl.ANY),                   # g HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # src HBM
        ],
        out_specs=pl.BlockSpec((tile_b, Hp), lambda j, rs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext, Hp), jnp.float32),
            pltpu.VMEM((2, ext // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_band_rev_bwd_kernel, precision=precision,
                          nblocks=nblocks, ext=ext, w_exact=w_exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp), jnp.float32),
    )
    return fn(rs_rev, dst_bcast, w_bcast, srev_bcast, g_sorted, s2)


def band_rev_layer_step_sorted(msg_sorted: jnp.ndarray, wh: jnp.ndarray,
                               inputs: jnp.ndarray, aux: dict,
                               act: str,
                               precision=jax.lax.Precision.HIGHEST,
                               w_exact: bool = False) -> jnp.ndarray:
    """Whole wD-MPNN layer, ZERO permutation gathers:

        m_new = act(inputs + (M m) @ W_h)

    with the reverse-bond selection folded into the band matrix M (see
    module comment above). Both the layer and its VJP are single fused
    kernels; ``inputs`` is the unpermuted layer-0 residual. Requires
    aux["rs_rev"] (build_sorted_aux leaves it out when some tile's
    molecule span exceeds the window)."""
    B, Hp = msg_sorted.shape
    w_sorted = aux["w_sorted"]
    dst_sorted = aux["dst_sorted"]
    src_sorted = aux["src_sorted"]
    srev = aux["srev"]
    rs_rev = aux["rs_rev"]

    def pad_w(w):
        return jnp.zeros((Hp, Hp), jnp.float32) \
            .at[:w.shape[0], :w.shape[1]].set(w)

    @jax.custom_vjp
    def op(m, w, inp):
        # primal (non-differentiated = inference): skip the z output
        return _band_rev_act_apply(m, w_sorted, dst_sorted, src_sorted,
                                   srev, rs_rev, pad_w(w), inp, act,
                                   precision, w_exact, write_z=False)

    def fwd(m, w, inp):
        out, z = _band_rev_act_apply(m, w_sorted, dst_sorted, src_sorted,
                                     srev, rs_rev, pad_w(w), inp, act,
                                     precision, w_exact)
        return out, (z, w, out)

    def bwd(res, g):
        z, w, a = res
        g_pre = g * _act_grad_from_output(act, a)
        dw = (z.T @ g_pre)[:w.shape[0], :w.shape[1]]
        # padded-width gw: see band_matmul_step_sorted bwd
        gw = g_pre @ pad_w(w).T
        dm = _band_rev_bwd_apply(gw, w_sorted, dst_sorted, src_sorted,
                                 srev, rs_rev, precision, w_exact)
        return dm, dw, g_pre

    op.defvjp(fwd, bwd)
    return op(msg_sorted, wh, inputs)


def _atom_band_kernel(ra_ref, msg_hbm, w_hbm, dst_hbm,
                      out_ref,
                      msg_win, w_win, dst_win, sems, *,
                      nblocks,
                      precision=jax.lax.Precision.HIGHEST,
                      w_exact=False):
    """One atom tile of the readout: out[a] = sum_c w[c][dst(c)==a] msg[c].

    The incoming bonds of a TILE_A-atom range are contiguous in sorted
    order, so the scatter-shaped segment sum becomes another banded
    one-hot matmul on the MXU. Window DMAs are double-buffered as in
    _band_kernel."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)

    def copies(idx, sl):
        start = pl.multiple_of(ra_ref[idx], 128)
        row = pl.multiple_of(start // 128, 1)
        return (
            pltpu.make_async_copy(msg_hbm.at[pl.ds(start, EXT_A), :],
                                  msg_win.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(w_hbm.at[pl.ds(row, EXT_A // 128), :],
                                  w_win.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(dst_hbm.at[pl.ds(row, EXT_A // 128), :],
                                  dst_win.at[sl], sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nblocks)
    def _():
        for c in copies(j + 1, jax.lax.rem(j + 1, 2)):
            c.start()

    for c in copies(j, slot):
        c.wait()

    # row atom ids for this tile (exact in f32 up to 2^24 atoms)
    aid = (j * TILE_A
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_A, 1), 0)
           ).astype(jnp.float32)
    dst_w = dst_win[slot].reshape(1, EXT_A)
    w = w_win[slot].reshape(1, EXT_A)
    q = jnp.where(aid == dst_w, w, 0.0)
    out_ref[:, :] = _dot_band(q, msg_win[slot], precision, w_exact)


def _atom_band_apply(msg_sorted, w_sorted, dst_sorted, ra, num_atoms,
                     precision=jax.lax.Precision.HIGHEST,
                     w_exact: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp = msg_sorted.shape
    nblocks = num_atoms // TILE_A
    w2 = w_sorted.reshape(B // 128, 128)
    d2 = dst_sorted.astype(jnp.float32).reshape(B // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # msg HBM
            pl.BlockSpec(memory_space=pl.ANY),               # w HBM
            pl.BlockSpec(memory_space=pl.ANY),               # dst HBM
        ],
        out_specs=pl.BlockSpec((TILE_A, Hp), lambda j, ra: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, EXT_A, Hp), jnp.float32),
            pltpu.VMEM((2, EXT_A // 128, 128), jnp.float32),
            pltpu.VMEM((2, EXT_A // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_atom_band_kernel, precision=precision,
                          nblocks=nblocks, w_exact=w_exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_atoms, Hp), jnp.float32),
    )
    return fn(ra, msg_sorted, w2, d2)


@functools.lru_cache(maxsize=64)
def _atom_band_op(num_atoms: int, precision, w_exact: bool):
    """custom_vjp wrapper of the banded atom aggregation with the aux
    arrays as FORMAL arguments (closure-free: closed-over tracers break
    shard_map AD — the banded halo path differentiates this inside
    shard_map). int arrays get float0 cotangents; w's cotangent is zero
    (bond weights are data, never differentiated — same contract as the
    previous closure implementation)."""
    import numpy as _np

    @jax.custom_vjp
    def op(m, w_sorted, dst_sorted, ra):
        return _atom_band_apply(m, w_sorted, dst_sorted, ra, num_atoms,
                                precision, w_exact)

    def fwd(m, w_sorted, dst_sorted, ra):
        out = _atom_band_apply(m, w_sorted, dst_sorted, ra, num_atoms,
                               precision, w_exact)
        return out, (w_sorted, dst_sorted, ra)

    def bwd(res, g):
        w_sorted, dst_sorted, ra = res
        f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
        return (w_sorted[:, None] * g[dst_sorted],
                jnp.zeros_like(w_sorted), f0(dst_sorted), f0(ra))

    op.defvjp(fwd, bwd)
    return op


def atom_readout_sorted(msg_sorted: jnp.ndarray, aux: dict,
                        num_atoms: int, out_dim: int,
                        precision=jax.lax.Precision.HIGHEST,
                        w_exact: bool = False) -> jnp.ndarray:
    """Final weighted incoming-bond aggregation from sorted messages.

    Uses the banded MXU readout kernel when the host published atom-tile
    windows ("ra" in aux); otherwise the XLA segment sum. The VJP of the
    kernel path is the weighted row-gather d_msg = w * g[dst] — no
    scatter in either direction."""
    # VMEM: the readout's (2, EXT_A, hp) windows + double-buffered out
    # tile measured 18.6 MB at hp=1024 (stack OOM; limit 16 MB) and
    # project to ~16.2 MB at 896 — hp <= 768 per kernel invocation is
    # safely inside; wider messages run column-chunked (_chunked_cols)
    if "ra" in aux:
        w_sorted, dst_sorted, ra = (aux["w_sorted"], aux["dst_sorted"],
                                    aux["ra"])
        # aux arrays travel as FORMAL custom_vjp args, not closures:
        # closed-over tracers break shard_map AD (the banded halo path
        # differentiates this op inside shard_map)
        op = _atom_band_op(num_atoms, precision, w_exact)
        agg = _chunked_cols(lambda m: op(m, w_sorted, dst_sorted, ra),
                            msg_sorted, chunk=ATOM_CHUNK)
        return agg[:, :out_dim]
    agg = jax.ops.segment_sum(
        msg_sorted * aux["w_sorted"][:, None], aux["dst_sorted"],
        num_segments=num_atoms, indices_are_sorted=False)
    return agg[:, :out_dim]


def bond_message_step_pallas(message: jnp.ndarray,
                             aux_arrays: dict) -> jnp.ndarray:
    """Drop-in replacement for ops.segment.bond_message_step using the
    Pallas band kernel. ``aux_arrays`` carries the device copies of
    SortedBondAux fields (see GraphBatch sorted aux plumbing).

    Returns m_new in natural bond order.
    """
    B, H = message.shape
    Hp = ((H + LANE - 1) // LANE) * LANE
    msg_p = jnp.pad(message, ((0, 0), (0, Hp - H))) if Hp != H else message
    msg_sorted = permute_rows(msg_p, aux_arrays["perm"], aux_arrays["rank"])
    tile_b = msg_sorted.shape[0] // int(aux_arrays["rs"].shape[0])
    chunk = BAND_CHUNK if tile_b == 512 else 512
    z_sorted = _chunked_cols(
        lambda m: _band_op(m, aux_arrays["w_sorted"],
                           aux_arrays["dst_sorted"], aux_arrays["rs"]),
        msg_sorted, chunk=chunk)
    m_new = permute_rows(z_sorted, aux_arrays["rev_rank"],
                         aux_arrays["rev_rank_inv"])
    return m_new[:, :H] if Hp != H else m_new


# ---------------------------------------------------------------------------
# atom-message mode: scatter-free neighbour aggregation over atoms
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _atom_neighbor_op(num_atoms: int, precision):
    """out[v] = sum_{u in N(v)} h[u] (bond multiplicity), as h[src] gather
    + the banded atom aggregation. The operator is the (symmetric)
    undirected adjacency, hence SELF-ADJOINT: its VJP is the same op
    applied to the cotangent — no scatter in either direction. This is
    the hot op of the reference's atom_messages mode (mpn.py:104-108)."""
    import numpy as _np

    @jax.custom_vjp
    def op(h, ones_sorted, src_sorted, dst_sorted, ra):
        return _atom_band_apply(h[src_sorted], ones_sorted, dst_sorted, ra,
                                num_atoms, precision, True)

    def fwd(h, ones_sorted, src_sorted, dst_sorted, ra):
        return op(h, ones_sorted, src_sorted, dst_sorted, ra), \
            (ones_sorted, src_sorted, dst_sorted, ra)

    def bwd(res, g):
        ones_sorted, src_sorted, dst_sorted, ra = res
        f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
        dh = _atom_band_apply(g[src_sorted], ones_sorted, dst_sorted, ra,
                              num_atoms, precision, True)
        return (dh, jnp.zeros_like(ones_sorted), f0(src_sorted),
                f0(dst_sorted), f0(ra))

    op.defvjp(fwd, bwd)
    return op


def atom_neighbor_sum_sorted(h: jnp.ndarray, aux: dict, num_atoms: int,
                             precision=jax.lax.Precision.HIGHEST
                             ) -> jnp.ndarray:
    """Banded unweighted neighbour sum for atom_messages (h: (A, Hp) f32,
    lane-padded). Caller guards on "ra" in aux; wide hidden sizes run
    column-chunked."""
    op = _atom_neighbor_op(num_atoms, precision)
    ones = jnp.ones_like(aux["w_sorted"])
    return _chunked_cols(
        lambda m: op(m, ones, aux["src_sorted"], aux["dst_sorted"],
                     aux["ra"]), h, chunk=ATOM_CHUNK)


@functools.lru_cache(maxsize=64)
def _src_readout_op(num_atoms: int, precision, w_exact: bool):
    """a[v] = sum_{c: dst(c)=v} w[c] * h[src(c)] — the atom_messages final
    readout (reference mpn.py:126-131 with a2x = a2a). Scatter-free VJP via
    the bond involution srev (src(c) = dst(srev(c))):
    dh[u] = sum_{c: src(c)=u} w[c] g[dst(c)]
          = sum_{c': dst(c')=u} w[srev(c')] g[src(c')]."""
    import numpy as _np

    @jax.custom_vjp
    def op(h, w_sorted, w_srev, src_sorted, dst_sorted, ra):
        return _atom_band_apply(h[src_sorted], w_sorted, dst_sorted, ra,
                                num_atoms, precision, w_exact)

    def fwd(h, w_sorted, w_srev, src_sorted, dst_sorted, ra):
        return op(h, w_sorted, w_srev, src_sorted, dst_sorted, ra), \
            (w_sorted, w_srev, src_sorted, dst_sorted, ra)

    def bwd(res, g):
        w_sorted, w_srev, src_sorted, dst_sorted, ra = res
        f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
        dh = _atom_band_apply(g[src_sorted], w_srev, dst_sorted, ra,
                              num_atoms, precision, w_exact)
        return (dh, jnp.zeros_like(w_sorted), jnp.zeros_like(w_srev),
                f0(src_sorted), f0(dst_sorted), f0(ra))

    op.defvjp(fwd, bwd)
    return op


def src_readout_sorted(h: jnp.ndarray, aux: dict, num_atoms: int,
                       out_dim: int,
                       precision=jax.lax.Precision.HIGHEST,
                       w_exact: bool = False) -> jnp.ndarray:
    """Weighted src-gather readout for atom_messages (h: (A, Hp) f32)."""
    op = _src_readout_op(num_atoms, precision, w_exact)
    w_srev = aux["w_sorted"][aux["srev"]]
    agg = _chunked_cols(
        lambda m: op(m, aux["w_sorted"], w_srev, aux["src_sorted"],
                     aux["dst_sorted"], aux["ra"]), h, chunk=ATOM_CHUNK)
    return agg[:, :out_dim]
