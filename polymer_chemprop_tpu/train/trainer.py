"""Per-fold training orchestration (reference train/run_training.py:28-499).

Flow parity with the reference: split -> feature/target scaling -> loaders
-> per-ensemble-member init (or resume) -> epoch loop (train epoch, eval
val, per-epoch CSV logging, every-epoch resume checkpoint, best-model
tracking) -> best-model test evaluation -> ensemble-averaged test preds.

TPU-native mechanics: the whole optimizer step is one jitted XLA
executable; the Noam schedule is folded into optax; checkpoints are
numpy/JSON (utils/checkpoint.py) rather than torch pickles.
"""

from __future__ import annotations

import csv
import time
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..data import (
    MoleculeDataLoader,
    MoleculeDataset,
    set_cache_graph,
    split_data,
)
from ..models import EncoderConfig, ModelConfig, init_model, param_count
from ..utils.checkpoint import load_checkpoint, load_opt_state, save_checkpoint
from ..utils.logging import get_logger
from .evaluate import evaluate
from .metrics import evaluate_predictions
from .predict import predict
from .scheduler import build_optimizer, build_schedule
from .step import batch_pytree, make_predict_step, make_train_step


def build_model_config(cfg: TrainConfig, num_tasks: int,
                       features_size: int = 0,
                       atom_descriptors_size: int = 0,
                       atom_fdim: Optional[int] = None,
                       bond_fdim: Optional[int] = None,
                       data_smiles=None) -> ModelConfig:
    fcfg = cfg.featurization()
    # bond weights are bf16-exact for every non-polymer featurization
    # (all 1.0) AND for polymer data whose edge-rule weights are exact
    # (0.5/0.25/... — the common case); the band kernel then drops its
    # identically-zero q_lo MXU pass, bitwise-identically. data_smiles
    # must cover every set the model will consume (train+val+test, or
    # the prediction set) — without it, polymer stays conservative.
    w_exact = not cfg.polymer
    if cfg.polymer and data_smiles is not None:
        from ..features.featurization import polymer_bond_weights_bf16_exact
        w_exact = polymer_bond_weights_bf16_exact(data_smiles)
    enc = EncoderConfig(
        atom_fdim=atom_fdim or fcfg.atom_fdim,
        bond_fdim=bond_fdim or fcfg.bond_fdim(cfg.atom_messages),
        hidden_size=cfg.hidden_size,
        depth=cfg.depth,
        dropout=cfg.dropout,
        activation=cfg.activation,
        aggregation=cfg.aggregation,
        aggregation_norm=cfg.aggregation_norm,
        bias=cfg.bias,
        undirected=cfg.undirected,
        atom_messages=cfg.atom_messages,
        atom_descriptors=cfg.atom_descriptors,
        atom_descriptors_size=atom_descriptors_size,
        compute_dtype="bfloat16" if cfg.param_dtype in ("bfloat16", "bf16")
        else "float32",
        band_precision=cfg.band_precision,
        unit_bond_weights=w_exact,
    )
    return ModelConfig(
        encoder=enc,
        dataset_type=cfg.dataset_type,
        num_tasks=num_tasks,
        multiclass_num_classes=cfg.multiclass_num_classes,
        number_of_molecules=cfg.number_of_molecules,
        mpn_shared=cfg.mpn_shared,
        ffn_num_layers=cfg.ffn_num_layers,
        ffn_hidden_size=cfg.ffn_hidden_size,
        features_size=features_size,
        features_only=cfg.features_only,
        use_input_features=features_size > 0,
        spectra_activation=cfg.spectra_activation,
        atom_descriptors=cfg.atom_descriptors,
        atom_descriptors_size=atom_descriptors_size,
    )


def _trainable_mask(params, cfg: TrainConfig):
    """Parameter-freezing mask for transfer learning (reference
    model.py:49-55, 118-121: freeze encoders and/or first FFN layers)."""
    # fork semantics (run_training.py:277-288): checkpoint_frzn alone only
    # warm-starts; the encoder is frozen only when frzn_encoder is set
    freeze_encoder = cfg.checkpoint_frzn is not None and cfg.frzn_encoder

    def mask_tree(tree, trainable):
        return jax.tree_util.tree_map(lambda _: trainable, tree)

    mask = {}
    for key, sub in params.items():
        if key == "encoders" and freeze_encoder:
            if cfg.freeze_first_only:
                mask[key] = [mask_tree(sub[0], False)] + \
                    [mask_tree(s, True) for s in sub[1:]]
            else:
                mask[key] = mask_tree(sub, False)
        elif key == "ffn" and cfg.checkpoint_frzn is not None and cfg.frzn_ffn_layers > 0:
            n = cfg.frzn_ffn_layers
            mask[key] = [mask_tree(l, i >= n) for i, l in enumerate(sub)]
        else:
            mask[key] = mask_tree(sub, True)
    return mask


def _merge_matching(params, loaded):
    """Shape-checked partial parameter load (reference utils.py:116-130):
    take every leaf from ``loaded`` whose path and shape match ``params``;
    keep the fresh initialization elsewhere. Returns (merged, used,
    skipped) where skipped counts fresh leaves not overwritten."""
    used = skipped = 0

    def merge(dst, src):
        nonlocal used, skipped
        if isinstance(dst, dict):
            return {k: merge(dst[k], src[k]) if isinstance(src, dict)
                    and k in src else _skip(dst[k]) for k in dst}
        if isinstance(dst, list):
            src_l = src if isinstance(src, list) else []
            return [merge(d, src_l[i]) if i < len(src_l) else _skip(d)
                    for i, d in enumerate(dst)]
        if src is not None and not isinstance(src, (dict, list)) \
                and np.shape(src) == np.shape(dst):
            used += 1
            return np.asarray(src)
        skipped += 1
        return dst

    def _skip(leaf):
        nonlocal skipped
        skipped += len(jax.tree_util.tree_leaves(leaf))
        return leaf

    return merge(params, loaded), used, skipped


def _load_frzn_into(params, frzn_path: str, cfg: TrainConfig):
    """Overwrite encoder (+ optionally first FFN layers) weights from an
    SSL/teacher checkpoint (reference utils.py:172-261 load_frzn_model)."""
    frzn_params, _, _, _ = load_checkpoint(frzn_path)

    def copy_matching(dst, src):
        if isinstance(dst, dict):
            return {k: copy_matching(dst[k], src[k]) if k in src else dst[k]
                    for k in dst}
        if isinstance(dst, list):
            return [copy_matching(d, s) for d, s in zip(dst, src)] + dst[len(src):]
        if src is not None and np.shape(src) == np.shape(dst):
            return np.asarray(src)
        return dst

    out = dict(params)
    if "encoders" in frzn_params:
        out["encoders"] = copy_matching(params["encoders"], frzn_params["encoders"])
    if cfg.frzn_ffn_layers > 0 and "ffn" in frzn_params:
        n = cfg.frzn_ffn_layers
        out["ffn"] = [copy_matching(params["ffn"][i], frzn_params["ffn"][i])
                      if i < n else params["ffn"][i]
                      for i in range(len(params["ffn"]))]
    return out


def run_training(cfg: TrainConfig,
                 data: MoleculeDataset,
                 logger=None) -> Dict[str, List[float]]:
    """Train one fold, return test scores per metric
    (reference run_training.py:28-499)."""
    log = logger or get_logger("train", cfg.save_dir, cfg.quiet)
    debug, info = log.debug, log.info
    from ..ops.pallas_mpnn import fallback_stats as _fb_stats
    _fb_start = _fb_stats()   # per-run delta for the fallback report
    fcfg = cfg.featurization()
    # widen featurization with dataset-provided extra atom/bond features
    # (reference cross_validate.py:83-91 descriptor-size plumbing)
    if len(data):
        sample = data[0]
        if sample.atom_features is not None and \
                not cfg.overwrite_default_atom_features:
            fcfg = fcfg.replace(
                extra_atom_fdim=np.asarray(sample.atom_features).shape[1])
        if sample.bond_features is not None and \
                not cfg.overwrite_default_bond_features:
            fcfg = fcfg.replace(
                extra_bond_fdim=np.asarray(sample.bond_features).shape[1])

    # ---- split (reference run_training.py:57-105) -------------------------
    if cfg.separate_val_path or cfg.separate_test_path:
        from ..data import get_data
        val_data = get_data(cfg.separate_val_path, cfg.smiles_columns,
                            cfg.target_columns, cfg.ignore_columns,
                            cfg.number_of_molecules, fcfg,
                            features_path=cfg.separate_val_features_path
                            or cfg.features_path,
                            features_generators=cfg.features_generator,
                            atom_descriptors=cfg.atom_descriptors,
                            atom_descriptors_path=(
                                cfg.separate_val_atom_descriptors_path),
                            bond_features_path=(
                                cfg.separate_val_bond_features_path),
                            phase_features_path=(
                                cfg.separate_val_phase_features_path)) \
            if cfg.separate_val_path else None
        test_data = get_data(cfg.separate_test_path, cfg.smiles_columns,
                             cfg.target_columns, cfg.ignore_columns,
                             cfg.number_of_molecules, fcfg,
                             features_path=cfg.separate_test_features_path
                             or cfg.features_path,
                             features_generators=cfg.features_generator,
                             atom_descriptors=cfg.atom_descriptors,
                             atom_descriptors_path=(
                                 cfg.separate_test_atom_descriptors_path),
                             bond_features_path=(
                                 cfg.separate_test_bond_features_path),
                             phase_features_path=(
                                 cfg.separate_test_phase_features_path)) \
            if cfg.separate_test_path else None
        if val_data is not None and test_data is not None:
            train_data = data
        elif val_data is not None:
            train_data, _, test_data = split_data(
                data, cfg.split_type, (0.8, 0.0, 0.2), cfg.seed,
                cfg.num_folds, cfg.folds_file, cfg.val_fold_index,
                cfg.test_fold_index)
        else:
            train_data, val_data, _ = split_data(
                data, cfg.split_type, (0.8, 0.2, 0.0), cfg.seed,
                cfg.num_folds, cfg.folds_file, cfg.val_fold_index,
                cfg.test_fold_index)
    else:
        crossval_sets = None
        if cfg.crossval_index_file:
            import pickle
            with open(cfg.crossval_index_file, "rb") as f:
                crossval_sets = pickle.load(f)
        train_data, val_data, test_data = split_data(
            data, cfg.split_type, cfg.split_sizes, cfg.seed, cfg.num_folds,
            cfg.folds_file, cfg.val_fold_index, cfg.test_fold_index,
            crossval_index_sets=crossval_sets,
            crossval_index_dir=cfg.crossval_index_dir)

    # ---- train_frac subsampling (fork addition, run_training.py:132-137) --
    if cfg.train_frac < 1.0:
        from random import Random
        n_keep = int(len(train_data) * cfg.train_frac)
        idx = list(range(len(train_data)))
        Random(cfg.seed).shuffle(idx)
        train_data = MoleculeDataset([train_data[i] for i in idx[:n_keep]])

    num_tasks = data.num_tasks or 0
    info(f"Total size = {len(data):,} | train size = {len(train_data):,} | "
         f"val size = {len(val_data):,} | test size = {len(test_data):,}")

    if cfg.save_smiles_splits and cfg.save_dir:
        from ..utils.splits_io import save_smiles_splits
        save_smiles_splits(cfg.save_dir, train_data, val_data, test_data,
                           data_path=cfg.data_path,
                           smiles_columns=cfg.smiles_columns)

    # ---- feature scaling (reference run_training.py:111-130) --------------
    features_scaler = None
    if train_data.features() is not None and not cfg.no_features_scaling:
        features_scaler = train_data.normalize_features(replace_nan_token=0)
        val_data.normalize_features(features_scaler)
        test_data.normalize_features(features_scaler)
    # per-atom/bond extra feature scaling (reference run_training.py:118-130)
    ad_scaler = None
    bf_scaler = None
    if len(train_data) and (train_data[0].atom_descriptors is not None or
                            train_data[0].atom_features is not None) \
            and not cfg.no_atom_descriptor_scaling:
        ad_scaler = train_data.normalize_features(
            replace_nan_token=0, scale_atom_descriptors=True)
        val_data.normalize_features(ad_scaler, scale_atom_descriptors=True)
        test_data.normalize_features(ad_scaler, scale_atom_descriptors=True)
    if len(train_data) and train_data[0].bond_features is not None \
            and not cfg.no_bond_features_scaling:
        bf_scaler = train_data.normalize_features(
            replace_nan_token=0, scale_bond_features=True)
        val_data.normalize_features(bf_scaler, scale_bond_features=True)
        test_data.normalize_features(bf_scaler, scale_bond_features=True)

    # ---- target scaling (reference run_training.py:143-158) ---------------
    scaler = None
    if cfg.dataset_type == "regression":
        debug("Fitting scaler")
        scaler = train_data.normalize_targets()
    elif cfg.dataset_type == "spectra":
        debug("Normalizing spectra and excluding spectra regions based on phase")
        scaler = None
        _normalize_spectra_targets(train_data, val_data, test_data, cfg)

    # ---- data parallelism over local devices (green-field: the reference
    # is single-device, SURVEY.md §2.9). The global batch is split into
    # per-device micro-batches with a shared envelope; gradients psum over
    # the mesh with an exact global masked loss (parallel/dp.py).
    import math as _math
    n_dev = jax.device_count()
    dp_enabled = cfg.data_parallel
    if dp_enabled is None:  # auto: on for multi-device TPU backends
        dp_enabled = jax.default_backend() in ("tpu", "axon") and n_dev > 1
    dp_enabled = bool(dp_enabled) and n_dev > 1
    train_batch_size = cfg.batch_size
    if dp_enabled:
        train_batch_size = max(1, _math.ceil(cfg.batch_size / n_dev))

    # ---- graph parallelism: edge-partitioned halo training ---------------
    # (SURVEY.md §7 Phase 4 / §5 long-context analogue: ONE batched graph
    # sharded over the mesh by bond pairs, per-layer neighbour halo
    # exchange — parallel/partition.py. The scaling axis for batches whose
    # edge count exceeds a single chip's throughput sweet spot.)
    gp_reasons = []
    if n_dev <= 1:
        gp_reasons.append("single device")
    if cfg.dataset_type not in ("regression", "classification",
                                "multiclass"):
        gp_reasons.append(f"dataset_type {cfg.dataset_type}")
    if cfg.features_only:
        gp_reasons.append("features_only (no message passing to shard)")
    gp_dp = max(1, int(getattr(cfg, "graph_parallel_dp", 1)))
    if gp_dp > 1 and n_dev % gp_dp:
        gp_reasons.append(f"graph_parallel_dp {gp_dp} does not divide "
                          f"device count {n_dev}")
    gp_supported = not gp_reasons
    gp_enabled = cfg.graph_parallel
    if gp_enabled and not gp_supported:
        raise ValueError("--graph_parallel is unsupported for this run: "
                         + ", ".join(gp_reasons))
    if gp_enabled:
        dp_enabled = False
        train_batch_size = cfg.batch_size

    # ---- loaders ----------------------------------------------------------
    set_cache_graph(len(data) <= cfg.cache_cutoff and not cfg.no_cache_mol)
    loader_kw = dict(batch_size=cfg.batch_size, num_workers=cfg.num_workers,
                     use_native=cfg.use_native_featurizer,
                     use_pallas=cfg.use_pallas)
    train_loader_kw = dict(loader_kw, batch_size=train_batch_size)
    if gp_enabled:
        # the halo partitioner needs the natural (fwd, rev) pair layout,
        # not the Pallas band layout
        train_loader_kw["use_pallas"] = False
    train_loader = MoleculeDataLoader(
        train_data, fcfg, shuffle=True, seed=cfg.seed,
        class_balance=cfg.class_balance, **train_loader_kw)
    if gp_enabled is None:
        # auto: edge-partition when the per-batch bond envelope exceeds
        # ~2x the single-chip throughput optimum (docs/kernels.md: per-edge
        # cost rises past ~28k edges/chip; beyond ~2x, sharding the graph
        # beats growing the working set)
        GP_AUTO_BOND_ENVELOPE = 57344
        gp_enabled = (gp_supported and
                      train_loader.estimated_pad_bonds()
                      > GP_AUTO_BOND_ENVELOPE)
        if gp_enabled:
            dp_enabled = False
            train_batch_size = cfg.batch_size
            train_loader = MoleculeDataLoader(
                train_data, fcfg, shuffle=True, seed=cfg.seed,
                class_balance=cfg.class_balance,
                **dict(loader_kw, batch_size=cfg.batch_size,
                       use_pallas=False))
    gp_enabled = bool(gp_enabled)
    if gp_enabled:
        info(f"Graph-parallel training: edge-partitioned halo exchange "
             f"over {n_dev} devices"
             + (f" ({gp_dp} dp x {n_dev // gp_dp} ep)" if gp_dp > 1
                else ""))
    elif dp_enabled:
        info(f"Data-parallel training over {n_dev} devices "
             f"(micro-batch {train_batch_size})")
    val_loader = MoleculeDataLoader(val_data, fcfg, **loader_kw)
    test_loader = MoleculeDataLoader(test_data, fcfg, **loader_kw)
    # unshuffled train loader for per-epoch train-set evaluation
    # (reference run_training.py:188-203 train_data_loader for eval)
    train_eval_loader = MoleculeDataLoader(train_data, fcfg, **loader_kw)

    model_cfg = build_model_config(
        cfg, num_tasks,
        features_size=train_data.features_size(),
        atom_descriptors_size=train_data.atom_descriptors_size(),
        atom_fdim=fcfg.atom_fdim,
        bond_fdim=fcfg.bond_fdim(cfg.atom_messages),
        data_smiles=(s for d in (train_data, val_data, test_data)
                     for dp in d for s in dp.smiles))
    predict_step = make_predict_step(model_cfg)

    save_dir = cfg.save_dir
    # reference quirk kept for parity: the Noam schedule is built with
    # steps_per_epoch = train_size // batch_size (utils.py:501 FLOOR on
    # args.train_data_size) even though the trainer steps once per actual
    # batch (ceil) — with a ragged last batch the LR therefore decays
    # slightly faster than the nominal horizon and clamps at final_lr.
    # This was the round-2 "better-side spectra drift": the spectra
    # fixtures are the only golden configs whose train split (160) is not
    # divisible by the batch size (50) (docs/parity.md).
    steps_per_epoch = max(1, len(train_data) // cfg.batch_size)
    if dp_enabled:
        steps_per_epoch = max(1, _math.ceil(steps_per_epoch / n_dev))
    elif gp_enabled and gp_dp > 1:
        # each gp optimizer step consumes gp_dp loader batches (one per dp
        # row of the 2D mesh) — shrink the Noam horizon to the steps taken
        steps_per_epoch = max(1, _math.ceil(steps_per_epoch / gp_dp))

    # ---- ensemble loop (reference run_training.py:208-436) ----------------
    best_params_all = []
    for model_idx in range(cfg.ensemble_size):
        model_dir = os.path.join(save_dir, f"model_{model_idx}") if save_dir else None
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)

        key = jax.random.fold_in(jax.random.PRNGKey(cfg.pytorch_seed), model_idx)
        key, init_key = jax.random.split(key)
        params = None
        use_ref_init = cfg.reference_init
        if use_ref_init is None or use_ref_init:
            # reference-stream init: bit-identical to the reference's
            # torch.manual_seed(pytorch_seed) initial weights. For
            # dropout > 0 ensembles, member >= 1 streams interleave with
            # the reference's training-time dropout draws and cannot be
            # replayed — those members keep the JAX init.
            replayable = cfg.dropout == 0 or model_idx == 0
            if replayable:
                try:
                    from ..models.torch_init import reference_init_params
                    params = reference_init_params(
                        model_cfg, cfg.pytorch_seed, model_idx)
                    debug(f"Model {model_idx}: reference-stream torch init "
                          f"(pytorch_seed {cfg.pytorch_seed})")
                except ImportError:
                    if use_ref_init:
                        raise
            elif use_ref_init:
                info(f"Model {model_idx}: reference init not replayable "
                     f"with dropout > 0; using JAX init")
        if params is None:
            params = init_model(init_key, model_cfg)
        # warm-start from existing checkpoints (reference run_training loads
        # args.checkpoint_paths[model_idx] as the initial weights). Like the
        # reference's shape-checked partial load (utils.py:116-130), only
        # matching-shape parameters are taken; everything else keeps its
        # fresh initialization — so reference .pt files (possibly partial,
        # possibly differently sized) warm-start safely.
        if cfg.checkpoint_paths:
            warm = cfg.checkpoint_paths[model_idx % len(cfg.checkpoint_paths)]
            loaded, _, _, _ = load_checkpoint(warm)
            params, n_used, n_skipped = _merge_matching(params, loaded)
            info(f"Warm-started model {model_idx} from {warm} "
                 f"({n_used} parameters loaded, {n_skipped} kept fresh)")
        info(f"Number of parameters = {param_count(params):,}")

        schedule = build_schedule(
            cfg.scheduler, init_lr=cfg.init_lr, max_lr=cfg.max_lr,
            final_lr=cfg.final_lr, warmup_epochs=cfg.warmup_epochs,
            epochs=cfg.epochs, steps_per_epoch=steps_per_epoch)
        tx = build_optimizer(cfg.optimizer, schedule, cfg.weight_decay,
                             cfg.grad_clip)
        if cfg.checkpoint_frzn is not None:
            params = _load_frzn_into(params, cfg.checkpoint_frzn, cfg)
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()},
                jax.tree_util.tree_map(
                    lambda t: "train" if t else "freeze",
                    _trainable_mask(params, cfg)))
        opt_state = tx.init(params)

        start_epoch = 0
        # full resume (fork addition, reference run_training.py:241-263)
        resume_path = None
        if cfg.resume_from_checkpoint:
            resume_path = cfg.resume_from_checkpoint
        elif cfg.resume_experiment and model_dir and \
                os.path.exists(os.path.join(model_dir, "model.ckpt")):
            resume_path = os.path.join(model_dir, "model.ckpt")
        if resume_path and os.path.exists(resume_path):
            params, _, _, saved_epoch = load_checkpoint(resume_path)
            restored = load_opt_state(resume_path, opt_state)
            if restored is not None:
                opt_state = restored
            start_epoch = (saved_epoch or 0) + 1
            info(f"Resumed from {resume_path} at epoch {start_epoch}")

        target_weights = (jnp.asarray(cfg.target_weights, jnp.float32)
                          if cfg.target_weights is not None else None)
        # NOTE: the reference's spectra TRAINING loss runs with
        # threshold=None (train.py:70-71 passes only preds/targets/mask;
        # utils.py:362 returns the bare sid_loss) — the
        # spectra_target_floor applies to TARGET normalization only
        # (run_training.py:155). Passing the floor into the loss was the
        # round-2 source of the better-side spectra drift (docs/parity.md
        # "better-side drift, root-caused").
        train_step = make_train_step(
            model_cfg, tx, target_weights,
            cfg.alternative_loss_function, None)
        if gp_enabled:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import (build_edge_shards_halo_dp,
                                    halo_strip_width,
                                    make_halo_dp_train_step, make_mesh)
            gp_n_ep = n_dev // gp_dp
            gp_mesh = make_mesh(n_dev, ("dp", "ep"), shape=(gp_dp, gp_n_ep))
            gp_dropout = cfg.dropout > 0
            gp_use_features = bool(train_data.features_size())
            gp_overlap = bool(getattr(cfg, "graph_parallel_overlap", True))
            gp_steps = {}   # strip-width bucket -> compiled step

            def gp_step_for(sw_bucket):
                if not gp_overlap:
                    # strip_width is unused by the unoverlapped step —
                    # collapse all buckets onto one compiled executable
                    sw_bucket = 64
                if sw_bucket not in gp_steps:
                    gp_steps[sw_bucket] = make_halo_dp_train_step(
                        model_cfg, tx, gp_mesh, target_weights=target_weights,
                        overlap=gp_overlap, strip_width=sw_bucket,
                        dropout_rngs=gp_dropout,
                        use_features=gp_use_features)
                return gp_steps[sw_bucket]
            gp_shard = NamedSharding(gp_mesh, P("dp", "ep"))
            gp_fallback_warned = False
        if dp_enabled:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import (make_dp_train_step, make_mesh,
                                    shard_batch, stack_device_batches)
            dp_mesh = make_mesh(n_dev, ("dp",))
            dp_step = make_dp_train_step(
                model_cfg, tx, dp_mesh, "dp", target_weights,
                cfg.alternative_loss_function, None)
            dp_shard = NamedSharding(dp_mesh, P("dp"))
            dp_replicate = NamedSharding(dp_mesh, P())
            params = jax.device_put(params, dp_replicate)
            opt_state = jax.device_put(opt_state, dp_replicate)

        # per-epoch CSV metric log (fork addition, run_training.py:212-231:
        # per-metric train/val averages + per-task columns)
        csv_path = os.path.join(model_dir, "train_val_loss_log.csv") \
            if model_dir else None
        try:
            from ..data import get_task_names
            task_names = get_task_names(
                cfg.data_path, cfg.smiles_columns, cfg.target_columns,
                cfg.ignore_columns, cfg.number_of_molecules)
        except (OSError, ValueError):
            task_names = []
        if len(task_names) != num_tasks:
            task_names = [f"task_{i}" for i in range(num_tasks)]
        if csv_path and start_epoch == 0:
            header = ["epoch", "train_loss"]
            for metric in cfg.metrics:
                header += [f"train_avg_{metric}", f"val_avg_{metric}"]
                header += [f"train_{t}_{metric}" for t in task_names]
                header += [f"val_{t}_{metric}" for t in task_names]
            header += ["param_norm", "gradient_norm"]
            with open(csv_path, "w", newline="") as f:
                csv.writer(f).writerow(header)

        best_score = float("inf") if cfg.minimize_score else -float("inf")
        best_epoch = 0
        best_params = jax.device_get(params) \
            if (dp_enabled or gp_enabled) else params

        # TensorBoard scalars (reference run_training.py:233-236,393-402;
        # train.py:91-111 logs loss/pnorm/gnorm/lr) — best-effort import
        tb_writer = None
        if cfg.tensorboard and model_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                tb_writer = SummaryWriter(log_dir=model_dir)
            except Exception as exc:  # pragma: no cover - env-dependent
                info(f"TensorBoard unavailable ({exc}); skipping event logs")

        profiling = False
        for epoch in range(start_epoch, cfg.epochs):
            # jax.profiler trace of the first epoch (tracing/observability;
            # the reference has no profiler integration, SURVEY.md §5)
            if cfg.profile_dir and epoch == start_epoch and model_idx == 0:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            losses = []
            gnorms = []
            t_epoch = time.perf_counter()
            if dp_enabled:
                group: List[Dict] = []

                def dp_flush():
                    nonlocal params, opt_state, key
                    # ragged tail: pad with fully-masked copies of the last
                    # micro-batch (mask/weights zero -> no loss contribution;
                    # the global mask denominator is psum'd, so scores are
                    # unchanged)
                    while len(group) < n_dev:
                        group.append(_masked_out_copy(group[-1]))
                    key, sub = jax.random.split(key)
                    sharded = shard_batch(stack_device_batches(group),
                                          dp_mesh, "dp")
                    rngs = jax.device_put(
                        np.asarray(jax.random.split(sub, n_dev)), dp_shard)
                    p2, o2, loss, gnorm = dp_step(params, opt_state,
                                                  sharded, rngs)
                    params, opt_state = p2, o2
                    losses.append(loss)
                    gnorms.append(gnorm)
                    group.clear()

                for batch in train_loader:
                    group.append(batch_pytree(batch))
                    if len(group) == n_dev:
                        dp_flush()
                if group:
                    dp_flush()
            elif gp_enabled:
                aw = (train_loader.estimated_pad_atoms() + 7) // 8 * 8
                gp_group = []

                def gp_run_single(d):
                    nonlocal params, opt_state, key
                    key, sub = jax.random.split(key)
                    p2, o2, loss, gnorm = train_step(params, opt_state,
                                                     d, sub)
                    params, opt_state = p2, o2
                    losses.append(loss)
                    gnorms.append(gnorm)

                def gp_flush():
                    nonlocal params, opt_state, key, gp_fallback_warned
                    group = list(gp_group)
                    gp_group.clear()
                    n_real = len(group)
                    while len(group) < gp_dp:
                        group.append(_masked_out_copy(group[-1]))
                    try:
                        sharded, replicated = build_edge_shards_halo_dp(
                            [g["graphs"] for g in group], gp_n_ep,
                            atom_window=aw,
                            atom_descriptors_list=[
                                g.get("atom_descriptors") for g in group]
                            if group[0].get("atom_descriptors") is not None
                            else None)
                    except ValueError as exc:
                        # a molecule spans 3+ edge shards (or the window
                        # overflowed): run the group single-device — the
                        # math is identical, only the sharding differs
                        if not gp_fallback_warned:
                            info(f"graph_parallel: single-device fallback "
                                 f"for an unshardable batch ({exc})")
                            gp_fallback_warned = True
                        for g in group[:n_real]:
                            gp_run_single(g)
                        return
                    sw_list = (sharded if isinstance(sharded, tuple)
                               else (sharded,))
                    sw = max(halo_strip_width(sh) for sh in sw_list)
                    bucket = 64
                    while bucket < sw:
                        bucket *= 2
                    bucket = min(bucket, aw)
                    step_fn = gp_step_for(bucket)
                    sharded = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, gp_shard), sharded)
                    targets = np.stack([g["targets"] for g in group])
                    mask = np.stack([g["mask"] for g in group])
                    weights = np.stack([g["weights"] for g in group])
                    feats = None
                    if group[0].get("features") is not None:
                        feats = np.stack([g["features"] for g in group])
                    key, sub = jax.random.split(key)
                    rngs = np.asarray(jax.random.split(
                        sub, gp_dp * gp_n_ep)).reshape(gp_dp, gp_n_ep, 2)
                    p2, o2, loss, gnorm = step_fn(
                        params, opt_state, sharded, replicated,
                        jnp.asarray(targets), jnp.asarray(mask),
                        jnp.asarray(weights), jnp.asarray(rngs),
                        sub, feats)
                    params, opt_state = p2, o2
                    losses.append(loss)
                    gnorms.append(gnorm)

                for batch in train_loader:
                    gp_group.append(batch_pytree(batch))
                    if len(gp_group) == gp_dp:
                        gp_flush()
                if gp_group:
                    gp_flush()
            else:
                for batch in train_loader:
                    key, sub = jax.random.split(key)
                    params, opt_state, loss, gnorm = train_step(
                        params, opt_state, batch_pytree(batch), sub)
                    # defer D2H: a per-step scalar readback costs a full
                    # tunnel round-trip (~30 ms on axon) — fetch the whole
                    # epoch's scalars in ONE stacked transfer below
                    losses.append(loss)
                    gnorms.append(gnorm)
            if losses:
                fetched = np.asarray(jnp.stack(losses + gnorms))
                n_l = len(losses)
                losses = fetched[:n_l].tolist()
                gnorms = fetched[n_l:].tolist()
            epoch_s = time.perf_counter() - t_epoch
            if profiling:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                profiling = False
            eval_params = jax.device_get(params) \
                if (dp_enabled or gp_enabled) else params
            val_scores = evaluate(eval_params, predict_step, val_loader,
                                  num_tasks, cfg.metrics, cfg.dataset_type,
                                  scaler)
            train_scores = evaluate(eval_params, predict_step,
                                    train_eval_loader, num_tasks,
                                    cfg.metrics, cfg.dataset_type,
                                    scaler) if csv_path else None
            avg_val = float(np.nanmean(val_scores[cfg.metric]))
            mean_loss = float(np.mean(losses)) if losses else float("nan")
            from ..models import compute_pnorm
            pnorm = compute_pnorm(eval_params)
            mean_gnorm = float(np.mean(gnorms)) if gnorms else float("nan")
            debug(f"Epoch {epoch}: train loss = {mean_loss:.6f}, "
                  f"val {cfg.metric} = {avg_val:.6f}, "
                  f"PNorm = {pnorm:.4f}, GNorm = {mean_gnorm:.4f}, "
                  f"{len(losses) / max(epoch_s, 1e-9):.1f} steps/s")
            if csv_path:
                row = [epoch, mean_loss]
                for metric in cfg.metrics:
                    tv, vv = train_scores[metric], val_scores[metric]
                    row += [float(np.nanmean(tv)), float(np.nanmean(vv))]
                    row += list(tv) + list(vv)
                row += [pnorm, mean_gnorm]
                with open(csv_path, "a", newline="") as f:
                    csv.writer(f).writerow(row)
            if tb_writer is not None:
                tb_writer.add_scalar("train_loss", mean_loss, epoch)
                tb_writer.add_scalar(f"validation_{cfg.metric}", avg_val,
                                     epoch)
                tb_writer.add_scalar("param_norm", pnorm, epoch)
                tb_writer.add_scalar("gradient_norm", mean_gnorm, epoch)
            # every-epoch resume checkpoint (reference run_training.py:404-409)
            if model_dir:
                save_checkpoint(
                    os.path.join(model_dir, "model.ckpt"), params,
                    cfg.to_dict(),
                    scalers={"data_scaler": scaler,
                             "features_scaler": features_scaler,
                             "atom_descriptor_scaler": ad_scaler,
                             "bond_feature_scaler": bf_scaler},
                    opt_state=opt_state, epoch=epoch)
            improved = (avg_val < best_score) if cfg.minimize_score \
                else (avg_val > best_score)
            if improved or epoch == start_epoch:
                best_score, best_epoch = avg_val, epoch
                best_params = eval_params
                if model_dir:
                    save_checkpoint(
                        os.path.join(model_dir, "best_model.ckpt"), params,
                        cfg.to_dict(),
                        scalers={"data_scaler": scaler,
                                 "features_scaler": features_scaler,
                                 "atom_descriptor_scaler": ad_scaler,
                                 "bond_feature_scaler": bf_scaler},
                        epoch=epoch)

        if tb_writer is not None:
            tb_writer.close()
        info(f"Model {model_idx} best validation {cfg.metric} = "
             f"{best_score:.6f} on epoch {best_epoch}")
        best_params_all.append(best_params)

    # ---- test evaluation with ensemble averaging (run_training.py:440-491) -
    test_targets = test_loader.targets()
    sum_preds = None
    for params in best_params_all:
        preds, _ = predict(params, predict_step, test_loader, scaler=scaler)
        arr = np.array(preds, dtype=float)
        sum_preds = arr if sum_preds is None else sum_preds + arr
        scores = evaluate_predictions(preds, test_targets, num_tasks,
                                      cfg.metrics, cfg.dataset_type)
        for metric, vals in scores.items():
            info(f"Model test {metric} = {np.nanmean(vals):.6f}")
    avg_preds = (sum_preds / len(best_params_all)).tolist()
    ensemble_scores = evaluate_predictions(avg_preds, test_targets, num_tasks,
                                           cfg.metrics, cfg.dataset_type)
    for metric, vals in ensemble_scores.items():
        info(f"Ensemble test {metric} = {np.nanmean(vals):.6f}")

    if save_dir and cfg.save_preds and len(test_data) > 0:
        _write_test_preds(save_dir, cfg, test_data, avg_preds)
    if save_dir:
        import json
        with open(os.path.join(save_dir, "test_scores.json"), "w") as f:
            json.dump(ensemble_scores, f, indent=4, sort_keys=True)

    # band-layout fallback accounting (VERDICT r3 item 8): batches whose
    # molecule spans overflow the kernel window silently lose the
    # rev-fused layer — surface the rate so it is never invisible.
    # Reported as the DELTA over this run (folds/trials in one process
    # each report their own counts).
    from ..ops.pallas_mpnn import fallback_stats
    fs = {k: v - _fb_start.get(k, 0) for k, v in fallback_stats().items()}
    if fs["batches"] and (fs["rev_fallback"] or fs["atom_fallback"]):
        info(f"Pallas band layout: {fs['rev_fallback']}/{fs['batches']} "
             f"batches fell back to the srev-gather path, "
             f"{fs['atom_fallback']} lost the banded atom readout "
             f"(molecule spans exceed the kernel window; docs/kernels.md)")

    return ensemble_scores


def _masked_out_copy(batch_dict: Dict) -> Dict:
    """Copy of a batch pytree with mask and weights zeroed — used to pad
    the last data-parallel device group; contributes nothing to the psum'd
    loss numerator or denominator."""
    out = dict(batch_dict)
    out["mask"] = np.zeros_like(np.asarray(batch_dict["mask"]))
    out["weights"] = np.zeros_like(np.asarray(batch_dict["weights"]))
    return out


def _normalize_spectra_targets(train_data, val_data, test_data,
                               cfg: TrainConfig) -> None:
    """Spectra normalization with optional phase masks
    (reference spectra_utils.py:162-208 + run_training.py:147-158)."""
    phase_mask = None
    if cfg.spectra_phase_mask_path:
        phase_mask = _load_phase_mask(cfg.spectra_phase_mask_path)
    for ds in (train_data, val_data, test_data):
        if len(ds) == 0:
            continue
        # dedicated phase features when provided (reference data.py:327-336),
        # else fall back to RAW molecule features as one-hot phases — the
        # phase indicator must never be the scaled features
        if phase_mask is not None:
            phase_feats = ds.phase_features() or [d.raw_features for d in ds]
        else:
            phase_feats = None
        new_targets = []
        for i, t in enumerate(ds.targets()):
            arr = np.array([np.nan if x is None else x for x in t], dtype=float)
            if phase_mask is not None and phase_feats is not None \
                    and phase_feats[i] is not None:
                phase = np.asarray(phase_feats[i], dtype=float)
                mask_row = phase @ np.asarray(phase_mask, dtype=float)
                arr = np.where(mask_row > 0, arr, np.nan)
            arr = np.where(arr < cfg.spectra_target_floor,
                           cfg.spectra_target_floor, arr)
            total = np.nansum(arr)
            arr = arr / total if total > 0 else arr
            new_targets.append([None if np.isnan(x) else float(x) for x in arr])
        ds.set_targets(new_targets)


def _load_phase_mask(path: str):
    """(reference spectra_utils.py:244-264)."""
    import csv as _csv
    with open(path) as f:
        reader = _csv.reader(f)
        next(reader)
        return [[float(v) for v in row[1:]] for row in reader]


def _write_test_preds(save_dir: str, cfg: TrainConfig, test_data,
                      avg_preds) -> None:
    """(reference run_training.py:493-497)."""
    import csv as _csv
    path = os.path.join(save_dir, "test_preds.csv")
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["smiles"] + [f"pred_{i}" for i in
                                 range(len(avg_preds[0]) if avg_preds else 0)])
        for d, p in zip(test_data, avg_preds):
            row_p = p if isinstance(p, list) else [p]
            w.writerow([".".join(d.smiles)] + row_p)
