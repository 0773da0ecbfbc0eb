"""wD-MPNN graph encoder — functional JAX implementation.

Semantics match the reference MPNEncoder exactly (reference mpn.py:14-173):

* ``input = W_i(f_bonds)``; ``message = act(input)``              (mpn.py:93-97)
* depth-1 iterations of the weighted directed-bond update
  ``m(a1->a2) = [sum_{a0 in N(a1)} w(a0->a1) m(a0->a1)] - m(a2->a1)``
  followed by ``message = dropout(act(input + W_h(message)))`` — the
  residual is to the *layer-0* input (mpn.py:110-124)
* atom readout: weighted incoming sum, concat with f_atoms, W_o, act,
  dropout (mpn.py:126-134)
* molecule readout: stoichiometry-weighted aggregation scaled by
  1+log10(Xn) (mpn.py:145-171)

Mechanics differ TPU-first: flat edge-parallel segment sums instead of
dense max-in-degree gathers, static shapes, and an optional Pallas fused
message kernel (ops/pallas_mpnn.py) for the hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.segment import (
    atom_readout,
    bond_message_step,
    molecule_readout,
    segment_sum,
    weighted_segment_sum,
)
from .nn import dropout, get_activation, init_linear, linear


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Static encoder hyperparameters (subset of reference TrainArgs used by
    MPNEncoder, args.py:309-359). Hashable so it can be a jit static arg."""

    atom_fdim: int
    bond_fdim: int
    hidden_size: int = 300
    depth: int = 3
    dropout: float = 0.0
    activation: str = "relu"
    aggregation: str = "mean"
    aggregation_norm: float = 100.0
    bias: bool = False
    undirected: bool = False
    atom_messages: bool = False
    atom_descriptors: Optional[str] = None
    atom_descriptors_size: int = 0
    compute_dtype: str = "float32"  # 'bfloat16' runs matmuls on the MXU fast path
    band_precision: str = "high"  # Pallas band-matmul MXU precision:
    # 'high' (default; manual 3-pass bf16 emulation, ~1.5e-5 relative error,
    # ~2x the speed of 'highest' — see ops/pallas_mpnn._dot_band),
    # 'highest' (6-pass fp32 emulation, bit-matches the XLA oracle), or
    # 'default' (1-pass bf16, fastest but ~1e-3 relative error — experimental)
    unit_bond_weights: bool = False  # all w_bonds are BAND-EXACT:
    # multiples of 1/256 in [0,1], so w, -w and w-1 (the rev-fused own-
    # reverse entry) are bf16-exact. True for every non-polymer
    # featurization (all 1.0) and for polymer data with tidy edge rules
    # (0.5/0.25/... — detected from the dataset by
    # trainer.build_model_config): the band kernel's Q hi/lo split drops
    # the identically-zero q_lo pass, bitwise-identically


def init_encoder(key: jax.Array, cfg: EncoderConfig) -> Dict:
    """Parameters of one MPNEncoder (reference mpn.py:46-64)."""
    k_i, k_h, k_o, k_d = jax.random.split(key, 4)
    input_dim = cfg.atom_fdim if cfg.atom_messages else cfg.bond_fdim
    w_h_input = cfg.hidden_size + (cfg.bond_fdim if cfg.atom_messages else 0)
    params = {
        "W_i": init_linear(k_i, input_dim, cfg.hidden_size, bias=cfg.bias),
        "W_h": init_linear(k_h, w_h_input, cfg.hidden_size, bias=cfg.bias),
        "W_o": init_linear(k_o, cfg.atom_fdim + cfg.hidden_size,
                           cfg.hidden_size, bias=True),
    }
    if cfg.atom_descriptors == "descriptor":
        d = cfg.hidden_size + cfg.atom_descriptors_size
        params["W_d"] = init_linear(k_d, d, d, bias=True)
    return params


def apply_encoder(params: Dict,
                  batch: Dict[str, jnp.ndarray],
                  cfg: EncoderConfig,
                  dropout_key: Optional[jax.Array] = None,
                  deterministic: bool = True,
                  atom_descriptors: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Encode a GraphBatch (arrays dict) -> (num_mols, hidden) embeddings."""
    act = get_activation(cfg.activation)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    f_atoms = batch["f_atoms"]
    f_bonds = batch["f_bonds"]
    w_atoms = batch["w_atoms"]
    w_bonds = batch["w_bonds"]
    b2a = batch["b2a"]
    b2dst = batch["b2dst"]
    b2revb = batch["b2revb"]
    a2mol = batch["a2mol"]
    num_atoms = f_atoms.shape[0]
    num_mols = batch["degree_of_polym"].shape[0]

    keys = iter(jax.random.split(dropout_key, cfg.depth + 2)) \
        if dropout_key is not None else iter([None] * (cfg.depth + 2))

    if cfg.atom_messages and cfg.undirected:
        raise ValueError("Undirected is unnecessary when using "
                         "atom_messages (reference args.py:588-590)")
    pallas_aux = batch.get("pallas_aux")
    # VMEM note: very large hidden sizes overflow the band kernels'
    # ~16 MB scoped VMEM per invocation; the plain band path and the
    # atom readout run COLUMN-CHUNKED there (ops/pallas_mpnn
    # _chunked_cols), so every hidden size stays on the MXU band path —
    # only the W_h-fused epilogue falls back to the separate-matmul
    # form (band_paths_for governs, checked below).
    if cfg.atom_messages:
        # atom-message mode consumes bond-only features: the last bond_fdim
        # columns of the concat(src-atom, bond) vectors (reference
        # featurization.py:838-843 get_components slicing). The reference
        # layer is W_h(concat(sum_nei(message), sum_nei(f_bonds)))
        # (mpn.py:104-108); the concat splits linearly through W_h, and the
        # bond-feature half is LOOP-INVARIANT — hoist it out of the depth
        # loop so each layer is one atom-adjacency aggregation + one
        # (hidden x hidden) matmul.
        #
        # DELIBERATE deviation: the reference's atom_messages readout
        # indexes the BOND-weight array with neighbour ATOM ids
        # (mpn.py:126-131, a2x = a2a into w_bonds) — an indexing quirk
        # that reads unrelated entries for weighted (polymer) data. We
        # weight each contribution by its own bond's w instead. For every
        # non-polymer config w_bonds is identically 1, where the two are
        # equal (see docs/parity.md).
        H = cfg.hidden_size
        f_bonds_b = f_bonds[:, -cfg.bond_fdim:]
        inputs = linear(params["W_i"], f_atoms, cdt)
        message = act(inputs)
        wh = params["W_h"]
        w1 = {"w": wh["w"][:H]}
        w2 = {"w": wh["w"][H:]}
        if "b" in wh:
            w2 = dict(w2, b=wh["b"])
        if pallas_aux is not None:
            # pallas batches carry f_bonds dst-SORTED; aggregation keys
            # come from the sorted aux arrays
            src_s = pallas_aux["src_sorted"]
            dst_s = pallas_aux["dst_sorted"]
            f_sum = segment_sum(f_bonds_b, dst_s, num_atoms)
            use_band = ("ra" in pallas_aux and cdt is None)
        else:
            f_sum = segment_sum(f_bonds_b, b2dst, num_atoms)
            use_band = False
        const = linear(w2, f_sum, cdt)
        if use_band:
            from ..ops.pallas_mpnn import (
                atom_neighbor_sum_sorted,
                pad_lane,
                src_readout_sorted,
            )
            prec = {"highest": jax.lax.Precision.HIGHEST,
                    "high": jax.lax.Precision.HIGH,
                    "default": jax.lax.Precision.DEFAULT}[cfg.band_precision]
        for _ in range(cfg.depth - 1):
            if use_band:
                m = atom_neighbor_sum_sorted(pad_lane(message), pallas_aux,
                                             num_atoms, prec)[:, :H]
            elif pallas_aux is not None:
                m = segment_sum(message[src_s], dst_s, num_atoms)
            else:
                m = segment_sum(message[b2a], b2dst, num_atoms)
            message = act(inputs + linear(w1, m, cdt) + const)
            message = dropout(message, cfg.dropout, next(keys), deterministic)
        if use_band:
            a_message = src_readout_sorted(pad_lane(message), pallas_aux,
                                           num_atoms, H, prec,
                                           cfg.unit_bond_weights)
        elif pallas_aux is not None:
            a_message = weighted_segment_sum(message[src_s],
                                             pallas_aux["w_sorted"],
                                             dst_s, num_atoms)
        else:
            a_message = weighted_segment_sum(message[b2a], w_bonds, b2dst,
                                             num_atoms)
    elif pallas_aux is not None:
        # sorted-resident Pallas path: messages stay in dst-sorted order for
        # the whole depth loop (row-wise ops commute with the permutation),
        # leaving one involution gather per layer + the MXU band kernel.
        from ..ops.pallas_mpnn import (
            atom_readout_sorted,
            band_message_step_sorted,
            band_paths_for,
            pad_lane,
            permute_rows,
        )
        aux = pallas_aux
        H = cfg.hidden_size
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[cfg.band_precision]
        # fuse the W_h matmul into the band kernel when it is a plain
        # (bias-free, f32) matrix that fits the kernel's VMEM — the z
        # intermediate never touches HBM
        _fused_ok, _ = band_paths_for(
            f_bonds.shape[0], int(aux["rs"].shape[0]),
            ((H + 127) // 128) * 128)
        fuse_wh = not cfg.bias and cdt is None and _fused_ok
        # pallas batches carry f_bonds already in dst-sorted order (the
        # host permutes at featurization time), so there is no per-step
        # natural->sorted gather. The whole depth loop runs at the
        # lane-padded width Hp: padding W_i's columns keeps the padded
        # message columns identically zero (every supported activation
        # maps 0 -> 0 and the fused kernel zero-pads W_h), so no per-layer
        # slice/re-pad copies are needed — the readout slices once.
        Hp = ((H + 127) // 128) * 128
        wi = params["W_i"]
        if Hp != H:
            wi = dict(wi)
            wi["w"] = jnp.pad(wi["w"], ((0, 0), (0, Hp - H)))
            if "b" in wi:
                wi["b"] = jnp.pad(wi["b"], (0, Hp - H))
        inputs = linear(wi, f_bonds, cdt)
        message = act(inputs)
        act_name = cfg.activation.lower()
        # rev-fused path: the reverse-bond permutation is folded into the
        # band matrix itself, so the whole layer (aggregation, reverse
        # subtraction, W_h, residual, activation) is ONE kernel with zero
        # gathers fwd and bwd. Available when the batch's molecule spans
        # fit the kernel window (aux["rs_rev"]); undirected mode still
        # needs the explicit srev gather for its symmetrization.
        use_rev = fuse_wh and not cfg.undirected and "rs_rev" in aux
        if use_rev:
            from ..ops.pallas_mpnn import band_rev_layer_step_sorted
        elif fuse_wh and cfg.depth > 1:
            # the layer's act(inputs + ·[srev]) epilogue fuses into the
            # band kernel as act(inputs[srev] + ·)[srev] (srev is an
            # involution); the srev-permuted residual is loop-invariant
            from ..ops.pallas_mpnn import band_matmul_act_step_sorted
            inputs_srev = permute_rows(inputs, aux["srev"], aux["srev"])
        for _ in range(cfg.depth - 1):
            if cfg.undirected:
                message = (message + permute_rows(message, aux["srev"],
                                                  aux["srev"])) / 2
            if use_rev:
                message = band_rev_layer_step_sorted(
                    message, params["W_h"]["w"], inputs, aux,
                    act_name, prec, cfg.unit_bond_weights)
            elif fuse_wh:
                message = band_matmul_act_step_sorted(
                    message, params["W_h"]["w"], inputs_srev, aux,
                    act_name, prec, cfg.unit_bond_weights)
            else:
                message = band_message_step_sorted(message, aux, prec,
                                                   cfg.unit_bond_weights)
                message = linear(params["W_h"], message[:, :H], cdt)
                message = pad_lane(act(inputs[:, :H] + message))
            # draw the dropout mask at the real width (B, H) so seeded
            # trajectories are identical to the XLA path (and to pre-
            # lane-padding runs); inactive dropout skips the slice/re-pad
            key_l = next(keys)
            if not deterministic and cfg.dropout > 0:
                message = pad_lane(dropout(message[:, :H], cfg.dropout,
                                           key_l, deterministic))
        # TRAINING keeps the aggregation at the lane-padded width
        # (columns >= H are identically zero): slicing here would put a
        # (B, Hp) pad on the backward path; the padding rows of W_o
        # below are zeroed instead. The deterministic path slices — the
        # sliced concat (433 -> 512 XLA pad) tiles the W_o matmul better
        # than the widened one (517 -> 640). NOTE: `deterministic` is a
        # dropout-key proxy for "will be differentiated"; a grad taken
        # with no dropout key pays the (B, Hp) backward pad again —
        # perf-only, gradients stay correct (the train step always
        # passes a key).
        ro_dim = cfg.hidden_size if deterministic else Hp
        a_message = atom_readout_sorted(message, aux, num_atoms,
                                        ro_dim, prec,
                                        cfg.unit_bond_weights)
    else:
        inputs = linear(params["W_i"], f_bonds, cdt)
        message = act(inputs)
        for _ in range(cfg.depth - 1):
            if cfg.undirected:
                message = (message + message[b2revb]) / 2
            message = bond_message_step(message, w_bonds, b2a, b2dst,
                                        b2revb, num_atoms)
            message = linear(params["W_h"], message, cdt)
            message = act(inputs + message)  # layer-0 residual (mpn.py:123)
            message = dropout(message, cfg.dropout, next(keys), deterministic)
        a_message = atom_readout(message, w_bonds, b2dst, num_atoms)

    a_input = jnp.concatenate([f_atoms, a_message], axis=1)
    wo = params["W_o"]
    if a_message.shape[1] != cfg.hidden_size:
        # lane-padded a_message: extend W_o with zero rows for the padded
        # (identically-zero) columns — exact, and pad-free in the backward
        wo = dict(wo)
        wo["w"] = jnp.concatenate(
            [wo["w"], jnp.zeros((a_message.shape[1] - cfg.hidden_size,
                                 wo["w"].shape[1]), wo["w"].dtype)])
    atom_hiddens = act(linear(wo, a_input, cdt))
    atom_hiddens = dropout(atom_hiddens, cfg.dropout, next(keys), deterministic)

    if atom_descriptors is not None:
        atom_hiddens = jnp.concatenate([atom_hiddens, atom_descriptors], axis=1)
        atom_hiddens = linear(params["W_d"], atom_hiddens, cdt)
        atom_hiddens = dropout(atom_hiddens, cfg.dropout, next(keys), deterministic)

    return molecule_readout(atom_hiddens, w_atoms, a2mol, num_mols,
                            batch["degree_of_polym"],
                            aggregation=cfg.aggregation,
                            aggregation_norm=cfg.aggregation_norm)
