"""Reference-stream parameter initialization.

The reference seeds torch once per fold (run_training.py:36
``torch.manual_seed(args.pytorch_seed)``), constructs the MoleculeModel
(every ``nn.Linear`` consumes RNG in its constructor via
kaiming_uniform_), then re-initializes all >1-dim parameters with
``xavier_normal_`` and zeroes biases (nn_utils.py:102-112, applied by
model.py:39). The final weights are therefore a deterministic function of
(pytorch_seed, module construction order, parameter shapes).

A JAX-side xavier draw matches that only in distribution — and this model
family's outcome is strongly init-dependent (measured: the regression+
morgan golden scatters 1.84-2.52 RMSE over reseeds of a reference-
equivalent torch trainer, scripts/forensic_morgan_torch.py). For golden-
score parity we reproduce the reference's ACTUAL initial weights by
replaying the construction + re-init sequence with torch itself (torch-CPU
is an allowed test/init dependency; the training math stays pure JAX).

Ensemble members: the reference seeds once and builds member i after
training member i-1. With dropout 0 (all golden configs) training consumes
no torch RNG, so member i's init equals building i+1 skeletons back to
back. With dropout > 0 the reference's member>=0 streams interleave with
training draws and cannot be replayed — callers fall back to the JAX init
for that case.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .model import ModelConfig


def _skeleton_shapes(cfg: ModelConfig) -> List[Tuple[str, int, int, bool]]:
    """(name, in_dim, out_dim, has_bias) in the reference's module
    CONSTRUCTION order (mpn.py:46-64 per encoder, then model.py:79-100)."""
    shapes: List[Tuple[str, int, int, bool]] = []
    # the reference constructs the encoder UNCONDITIONALLY — features_only
    # is a forward-time bypass (mpn.py:201-202), so its Linears still
    # consume constructor+xavier RNG ahead of the FFN draws
    n_enc = 1 if cfg.mpn_shared else cfg.number_of_molecules
    e = cfg.encoder
    input_dim = e.atom_fdim if e.atom_messages else e.bond_fdim
    w_h_input = e.hidden_size + (e.bond_fdim if e.atom_messages else 0)
    for i in range(n_enc):
        shapes.append((f"enc{i}.W_i", input_dim, e.hidden_size, e.bias))
        shapes.append((f"enc{i}.W_h", w_h_input, e.hidden_size, e.bias))
        shapes.append((f"enc{i}.W_o", e.atom_fdim + e.hidden_size,
                       e.hidden_size, True))
        if e.atom_descriptors == "descriptor":
            d = e.hidden_size + e.atom_descriptors_size
            shapes.append((f"enc{i}.W_d", d, d, True))
    dims: List[Tuple[int, int]] = []
    if cfg.ffn_num_layers == 1:
        dims.append((cfg.first_linear_dim, cfg.output_size))
    else:
        dims.append((cfg.first_linear_dim, cfg.ffn_hidden_size))
        for _ in range(cfg.ffn_num_layers - 2):
            dims.append((cfg.ffn_hidden_size, cfg.ffn_hidden_size))
        dims.append((cfg.ffn_hidden_size, cfg.output_size))
    for j, (i_d, o_d) in enumerate(dims):
        shapes.append((f"ffn{j}", i_d, o_d, True))
    return shapes


def reference_init_params(cfg: ModelConfig, pytorch_seed: int,
                          ensemble_index: int = 0) -> Dict:
    """Exact reference initial weights for ensemble member
    ``ensemble_index`` under ``torch.manual_seed(pytorch_seed)``."""
    import torch
    import torch.nn as nn

    torch.manual_seed(pytorch_seed)
    shapes = _skeleton_shapes(cfg)
    weights: Dict[str, np.ndarray] = {}
    # The reference constructs ALL modules first (each nn.Linear consumes
    # constructor RNG), THEN re-initializes every >1-dim parameter with
    # xavier_normal_ in registration order (model.py:39). Replaying
    # per-layer would interleave the two streams and desynchronize;
    # replay the two phases faithfully.
    for _ in range(ensemble_index + 1):
        layers = [nn.Linear(i, o, bias=b) for _, i, o, b in shapes]
        for (name, _i, _o, _b), layer in zip(shapes, layers):
            nn.init.xavier_normal_(layer.weight)
            # ours are (in, out); torch stores (out, in)
            weights[name] = layer.weight.detach().numpy().T.copy()

    params: Dict = {}
    if not cfg.features_only:
        n_enc = 1 if cfg.mpn_shared else cfg.number_of_molecules
        e = cfg.encoder
        encs = []
        for i in range(n_enc):
            enc = {
                "W_i": {"w": weights[f"enc{i}.W_i"]},
                "W_h": {"w": weights[f"enc{i}.W_h"]},
                "W_o": {"w": weights[f"enc{i}.W_o"],
                        "b": np.zeros(e.hidden_size, np.float32)},
            }
            if e.bias:
                enc["W_i"]["b"] = np.zeros(e.hidden_size, np.float32)
                enc["W_h"]["b"] = np.zeros(e.hidden_size, np.float32)
            if e.atom_descriptors == "descriptor":
                d = e.hidden_size + e.atom_descriptors_size
                enc["W_d"] = {"w": weights[f"enc{i}.W_d"],
                              "b": np.zeros(d, np.float32)}
            encs.append(enc)
        params["encoders"] = encs * cfg.number_of_molecules \
            if cfg.mpn_shared else encs
    ffn = []
    j = 0
    while f"ffn{j}" in weights:
        w = weights[f"ffn{j}"]
        ffn.append({"w": w, "b": np.zeros(w.shape[1], np.float32)})
        j += 1
    params["ffn"] = ffn
    return {k: _to_f32(v) for k, v in params.items()}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_f32(v) for v in tree]
    return np.asarray(tree, np.float32)
