"""Self-supervised pretraining for polymer wD-MPNNs.

One configurable module subsuming the reference's research-script family
(chemprop/train/ssl_pretrain_V1..V5.py, ssl_two_stage_V1..V5_C.py,
ssl_enhancements.py — ~8.3k LoC of per-script copies, none importable from
the package API; see SURVEY.md §2.7). Capabilities reproduced:

* node/edge masking task: mask a fraction (min 2) of atoms and directed
  bond pairs by zeroing their features, reconstruct the original features
  with MSE (reference ssl_two_stage_V5_C.py:402-466)
* graph-level task: regress a stoichiometry-weighted molecular-weight
  pseudo-label scaled by the degree of polymerization
  (ssl_two_stage_V5_C.py:301-319)
* two-stage training: stage 1 masking-only, stage 2 adds the graph-level
  head with a loss weight; plateau LR decay + early stopping
  (ssl_enhancements.py:335-358)
* transfer strategies 'a' (encoder only), 'b' (encoder + first FC layers),
  'c' (everything) — realized at load time through checkpoint_frzn +
  frzn_ffn_layers in the downstream trainer.

TPU-native mechanics: masking happens inside the jitted step via
``jax.random`` on the padded arrays; the whole pretraining step is one XLA
executable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import TrainConfig
from .data import MoleculeDataLoader, MoleculeDataset, get_data
from .models import EncoderConfig, init_encoder, init_linear, linear
from .ops.segment import atom_readout, bond_message_step, weighted_segment_sum
from .models.nn import get_activation
from .train.scheduler import build_optimizer
from .train.step import batch_pytree
from .utils.checkpoint import save_checkpoint
from .utils.logging import get_logger


@dataclasses.dataclass
class SSLConfig:
    """(reference ssl_two_stage_V5_C.py:733-766 CLI surface)."""

    data_path: str = ""
    save_dir: Optional[str] = None
    polymer: bool = True
    hidden_size: int = 300
    depth: int = 3
    mask_ratio: float = 0.15
    min_mask: int = 2           # per-graph minimum masked atoms/bond pairs
    graph_loss_weight: float = 0.5
    # enhanced mode (reference ssl_enhancements.py): edge-loss weighting,
    # warmup+cosine LR over each stage, stochastic perturbation of
    # inter-monomer edge weights as augmentation
    use_enhanced_ssl: bool = False
    edge_loss_weight: float = 1.5
    augment_ratio: float = 0.3
    epochs_stage1: int = 20
    epochs_stage2: int = 10
    batch_size: int = 50
    lr: float = 1e-3
    lr_graph: Optional[float] = None   # stage-2 LR (defaults to lr)
    dropout: float = 0.0
    weight_decay: float = 0.0
    pretrain_frac: float = 1.0
    val_frac: float = 0.0       # held-out fraction for early stopping
    pretrain_folds_file: Optional[str] = None  # pickle of pretrain indices
    save_graph_embeddings: bool = False
    graph_embeddings_path: Optional[str] = None
    seed: int = 0
    patience: int = 5          # early stopping (reference two-stage main)
    lr_decay: float = 0.5      # ReduceLROnPlateau factor
    transfer_strategy: str = "a"  # a: encoder, b: +2 FC, c: all
    num_workers: int = 4
    max_data_size: Optional[int] = None
    quiet: bool = False


def molecular_weight_label(dataset: MoleculeDataset, cfg_feat) -> np.ndarray:
    """Stoichiometry-weighted molecular weight pseudo-label, Xn-scaled
    (reference ssl_two_stage_V5_C.py:301-319). Computed from the graph's
    own atom masses and weights — no extra chemistry pass."""
    labels = []
    for d in dataset:
        g = d.mol_graphs(cfg_feat)[0]
        # mass channel is the last atom feature (0.01 * amu)
        masses = np.asarray([f[132] * 100.0 for f in g.f_atoms])
        w = np.asarray(g.w_atoms)
        labels.append(float((masses * w).sum()) * g.degree_of_polym)
    arr = np.asarray(labels, np.float32)
    # standardize for a stable regression target
    return (arr - arr.mean()) / max(arr.std(), 1e-8)


def init_ssl_model(key: jax.Array, enc_cfg: EncoderConfig) -> Dict:
    """Encoder + reconstruction/graph heads
    (reference SSLPretrainModel, ssl_two_stage_V5_C.py:140-180)."""
    k_enc, k_n, k_e, k_g1, k_g2 = jax.random.split(key, 5)
    h = enc_cfg.hidden_size
    return {
        "encoder": init_encoder(k_enc, enc_cfg),
        "node_head": init_linear(k_n, h, enc_cfg.atom_fdim, bias=True),
        "edge_head": init_linear(k_e, h, enc_cfg.bond_fdim, bias=True),
        "graph_head": [init_linear(k_g1, h, h, bias=True),
                       init_linear(k_g2, h, 1, bias=True)],
    }


def _mask_batch(batch: Dict, rng: jax.Array, mask_ratio: float,
                min_mask: int = 0):
    """Zero out a random fraction of real atom rows and bond-pair rows;
    returns (masked batch, atom_mask, bond_mask) with masks over the padded
    axes (1 = masked position to reconstruct). With ``min_mask`` > 0, every
    graph gets at least that many masked atoms (reference V5_C masking:
    mask 15%% with a per-graph minimum of 2)."""
    f_atoms, f_bonds = batch["f_atoms"], batch["f_bonds"]
    A, B = f_atoms.shape[0], f_bonds.shape[0]
    k1, k2 = jax.random.split(rng)
    real_atom = (batch["w_atoms"] > 0)
    # real bonds: exclude slot 0 / padding (zero weight rows are padding,
    # but stochastic-bond weights are in (0,1]; padding rows have w == 0)
    real_bond = (batch["w_bonds"] > 0)
    if min_mask > 0:
        # rank each atom's random score within its molecule; mask the
        # max(min_mask, ratio * n_g) lowest-scoring atoms per graph
        score = jnp.where(real_atom, jax.random.uniform(k1, (A,)), 2.0)
        a2mol = batch["a2mol"]
        same = a2mol[:, None] == a2mol[None, :]
        rank = (same & (score[None, :] < score[:, None])).sum(axis=1)
        n_g = jax.ops.segment_sum(real_atom.astype(jnp.int32), a2mol,
                                  num_segments=batch["degree_of_polym"].shape[0])
        k_g = jnp.maximum(jnp.minimum(min_mask, n_g),
                          (mask_ratio * n_g).astype(jnp.int32))
        atom_mask = (rank < k_g[a2mol]) & real_atom
    else:
        atom_mask = (jax.random.uniform(k1, (A,)) < mask_ratio) & real_atom
    pair_mask = (jax.random.uniform(k2, (B // 2,)) < mask_ratio)
    bond_mask = jnp.repeat(pair_mask, 2, total_repeat_length=B - B % 2)
    if B % 2:
        bond_mask = jnp.concatenate([bond_mask, jnp.zeros((1,), bool)])
    # bond rows start at 1 in (fwd, rev) pairs: roll mask by one slot
    bond_mask = jnp.roll(bond_mask, 1) & real_bond
    masked = dict(batch)
    masked["f_atoms"] = jnp.where(atom_mask[:, None], 0.0, f_atoms)
    masked["f_bonds"] = jnp.where(bond_mask[:, None], 0.0, f_bonds)
    return masked, atom_mask, bond_mask


def make_ssl_step(enc_cfg: EncoderConfig, tx, mask_ratio: float,
                  graph_loss_weight: float, with_graph_task: bool,
                  min_mask: int = 0, edge_loss_weight: float = 1.0,
                  augment_ratio: float = 0.0):
    act = get_activation(enc_cfg.activation)

    def encode_parts(params, batch):
        """Encoder internals shared by the heads: final bond messages and
        atom hiddens (mirrors apply_encoder's bond-message path)."""
        f_atoms, f_bonds = batch["f_atoms"], batch["f_bonds"]
        num_atoms = f_atoms.shape[0]
        inputs = linear(params["encoder"]["W_i"], f_bonds)
        message = act(inputs)
        for _ in range(enc_cfg.depth - 1):
            m = bond_message_step(message, batch["w_bonds"], batch["b2a"],
                                  batch["b2dst"], batch["b2revb"], num_atoms)
            message = act(inputs + linear(params["encoder"]["W_h"], m))
        a_message = atom_readout(message, batch["w_bonds"], batch["b2dst"],
                                 num_atoms)
        atom_hiddens = act(linear(params["encoder"]["W_o"],
                                  jnp.concatenate([f_atoms, a_message], 1)))
        num_mols = batch["degree_of_polym"].shape[0]
        wsum = weighted_segment_sum(atom_hiddens, batch["w_atoms"],
                                    batch["a2mol"], num_mols)
        return message, atom_hiddens, wsum * batch["degree_of_polym"][:, None]

    def loss_fn(params, batch, labels, rng):
        if augment_ratio > 0:
            # perturb inter-monomer stochastic edges (0 < w < 1) in a
            # random fraction of batches (ssl_enhancements.py:313-333)
            rng, k_gate, k_noise = jax.random.split(rng, 3)
            w = batch["w_bonds"]
            inter = (w > 0) & (w < 1.0)
            noise = jax.random.normal(k_noise, w.shape) * 0.05
            w_aug = jnp.where(inter, jnp.clip(w + noise, 0.01, 0.99), w)
            gate = jax.random.bernoulli(k_gate, augment_ratio)
            batch = dict(batch)
            batch["w_bonds"] = jnp.where(gate, w_aug, w)
        masked, atom_mask, bond_mask = _mask_batch(batch, rng, mask_ratio,
                                                   min_mask)
        message, atom_hiddens, mol_emb = encode_parts(params, masked)
        node_rec = linear(params["node_head"], atom_hiddens)
        edge_rec = linear(params["edge_head"], message)
        node_se = ((node_rec - batch["f_atoms"]) ** 2).mean(axis=1)
        edge_se = ((edge_rec - batch["f_bonds"]) ** 2).mean(axis=1)
        node_loss = (node_se * atom_mask).sum() / jnp.maximum(atom_mask.sum(), 1)
        edge_loss = (edge_se * bond_mask).sum() / jnp.maximum(bond_mask.sum(), 1)
        loss = node_loss + edge_loss_weight * edge_loss
        if with_graph_task:
            h = act(linear(params["graph_head"][0], mol_emb))
            pred = linear(params["graph_head"][1], h)[:, 0]
            gmask = batch["mol_mask"]
            graph_loss = (((pred - labels) ** 2) * gmask).sum() / \
                jnp.maximum(gmask.sum(), 1)
            loss = loss + graph_loss_weight * graph_loss
        return loss

    @jax.jit
    def step(params, opt_state, batch, labels, rng, lr_scale):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, labels, rng))(params)
        grads = jax.tree_util.tree_map(lambda g: g * lr_scale, grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return step


def ssl_pretrain(cfg: SSLConfig) -> str:
    """Two-stage pretraining; returns the checkpoint path consumed by
    --checkpoint_frzn downstream (reference run_training.py:272-285)."""
    log = get_logger("ssl", cfg.save_dir, cfg.quiet)
    tcfg = TrainConfig(data_path=cfg.data_path, polymer=cfg.polymer,
                       dataset_type="regression")
    fcfg = tcfg.featurization()
    data = get_data(cfg.data_path, config=fcfg, target_columns=[],
                    max_data_size=cfg.max_data_size)
    # pretrain subset: explicit fold file > fraction subsample
    # (reference V5_C --pretrain_folds_file / --pretrain_frac)
    import random as _random
    if cfg.pretrain_folds_file:
        import pickle
        with open(cfg.pretrain_folds_file, "rb") as f:
            idx = list(pickle.load(f))
        if idx and isinstance(idx[0], (list, tuple)):
            idx = [i for fold in idx for i in fold]
        data = MoleculeDataset([data[i] for i in idx if i < len(data)])
    elif cfg.pretrain_frac < 1.0:
        rnd = _random.Random(cfg.seed)
        idx = list(range(len(data)))
        rnd.shuffle(idx)
        keep = idx[:max(1, int(len(data) * cfg.pretrain_frac))]
        data = MoleculeDataset([data[i] for i in sorted(keep)])
    # held-out validation split for early stopping (--val_frac)
    val_data = None
    if cfg.val_frac > 0 and len(data) > 4:
        n_val = max(1, int(len(data) * cfg.val_frac))
        rnd = _random.Random(cfg.seed + 1)
        idx = list(range(len(data)))
        rnd.shuffle(idx)
        val_idx = set(idx[:n_val])
        val_data = MoleculeDataset([data[i] for i in sorted(val_idx)])
        data = MoleculeDataset([data[i] for i in range(len(data))
                                if i not in val_idx])
    labels_all = molecular_weight_label(data, fcfg)
    val_labels = molecular_weight_label(val_data, fcfg) \
        if val_data is not None else None

    enc_cfg = EncoderConfig(atom_fdim=fcfg.atom_fdim,
                            bond_fdim=fcfg.bond_fdim(),
                            hidden_size=cfg.hidden_size, depth=cfg.depth,
                            dropout=cfg.dropout)
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = init_ssl_model(init_key, enc_cfg)
    tx = build_optimizer("adamw" if cfg.weight_decay > 0 else "adam",
                         lambda step: cfg.lr,
                         weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    loader = MoleculeDataLoader(data, fcfg, batch_size=cfg.batch_size,
                                shuffle=False, num_workers=cfg.num_workers)
    val_loader = MoleculeDataLoader(val_data, fcfg,
                                    batch_size=cfg.batch_size,
                                    shuffle=False,
                                    num_workers=cfg.num_workers) \
        if val_data is not None else None

    def run_stage(params, opt_state, epochs, with_graph, key, stage):
        # stage-2 LR override (reference --learning_rate_graph)
        base_scale = (cfg.lr_graph / cfg.lr) \
            if (with_graph and cfg.lr_graph) else 1.0
        step = make_ssl_step(
            enc_cfg, tx, cfg.mask_ratio, cfg.graph_loss_weight, with_graph,
            min_mask=cfg.min_mask,
            edge_loss_weight=cfg.edge_loss_weight if cfg.use_enhanced_ssl
            else 1.0,
            augment_ratio=cfg.augment_ratio if cfg.use_enhanced_ssl else 0.0)

        def enhanced_lr(epoch):
            # 10%->100% linear warmup then cosine decay over the stage
            # (ssl_enhancements.py:25-45)
            import math
            warm = max(1, min(5, epochs // 10))
            if epoch < warm:
                return 0.1 + 0.9 * epoch / warm
            return 0.5 * (1 + math.cos(
                math.pi * (epoch - warm) / max(1, epochs - warm)))

        def epoch_loss(params, opt_state, ld, labels_arr, key2, scale,
                       train=True):
            losses = []
            offset = 0
            for batch in ld:
                pt = batch_pytree(batch)["graphs"][0]
                pt["mol_mask"] = batch.mol_mask
                labels = np.zeros(batch.mol_mask.shape[0], np.float32)
                labels[:batch.size] = labels_arr[offset:offset + batch.size]
                offset += batch.size
                k = jax.random.fold_in(key2, offset)
                if train:
                    params, opt_state, loss = step(params, opt_state, pt,
                                                   jnp.asarray(labels), k,
                                                   scale)
                else:
                    loss = step(params, opt_state, pt, jnp.asarray(labels),
                                k, 0.0)[2]  # zero-scaled update = eval
                losses.append(float(loss))
            return params, opt_state, float(np.mean(losses))

        best = float("inf")
        bad_epochs = 0
        lr_scale = base_scale
        for epoch in range(epochs):
            if cfg.use_enhanced_ssl:
                lr_scale = base_scale * enhanced_lr(epoch)
            key2 = jax.random.fold_in(key, epoch)
            params, opt_state, train_loss = epoch_loss(
                params, opt_state, loader, labels_all, key2, lr_scale)
            if val_loader is not None:
                # early-stopping criterion = held-out loss (--val_frac)
                _, _, crit = epoch_loss(params, opt_state, val_loader,
                                        val_labels,
                                        jax.random.fold_in(key2, 999),
                                        0.0, train=False)
            else:
                crit = train_loss
            log.debug(f"[stage {stage}] epoch {epoch} loss "
                      f"{train_loss:.5f} crit {crit:.5f} "
                      f"(lr x{lr_scale:.3f})")
            if crit < best - 1e-5:
                best = crit
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs >= cfg.patience:
                    log.info(f"[stage {stage}] early stop at epoch {epoch}")
                    break
                lr_scale *= cfg.lr_decay  # plateau decay
        return params, opt_state

    log.info("SSL stage 1: node/edge masking")
    key, k1 = jax.random.split(key)
    params, opt_state = run_stage(params, opt_state, cfg.epochs_stage1,
                                  False, k1, 1)
    log.info("SSL stage 2: masking + graph-level pseudo-label")
    key, k2 = jax.random.split(key)
    params, opt_state = run_stage(params, opt_state, cfg.epochs_stage2,
                                  True, k2, 2)

    # Export in downstream MoleculeModel layout: encoder (+ FC layers for
    # strategy b/c) so _load_frzn_into finds matching subtrees.
    export: Dict = {"encoders": [params["encoder"]]}
    if cfg.transfer_strategy in ("b", "c"):
        export["ffn"] = params["graph_head"]
    path = os.path.join(cfg.save_dir or ".", "ssl_pretrained.ckpt")
    save_checkpoint(path, export, dataclasses.asdict(cfg),
                    extra_meta={"ssl": True,
                                "transfer_strategy": cfg.transfer_strategy})
    log.info(f"Saved SSL checkpoint to {path}")

    if cfg.save_graph_embeddings:
        # graph-level embedding export (reference --save_graph_embeddings)
        from .models import apply_encoder
        import functools
        embed = jax.jit(functools.partial(apply_encoder, cfg=enc_cfg))
        chunks = []
        for batch in loader:
            pt = batch_pytree(batch)["graphs"][0]
            emb = np.asarray(embed(params["encoder"], pt))
            chunks.append(emb[:batch.size])
        emb_path = cfg.graph_embeddings_path or \
            os.path.join(cfg.save_dir or ".", "ssl_graph_embeddings.npy")
        np.save(emb_path, np.concatenate(chunks, axis=0))
        log.info(f"Saved graph embeddings to {emb_path}")
    return path


def ssl_pretrain_cli(argv: Optional[List[str]] = None) -> None:
    import argparse
    from .config import _add_field_args
    parser = argparse.ArgumentParser(prog="polymer_chemprop_tpu ssl_pretrain")
    _add_field_args(parser, SSLConfig)
    ns = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(SSLConfig)}
    ssl_pretrain(SSLConfig(**{k: v for k, v in vars(ns).items() if k in known}))
