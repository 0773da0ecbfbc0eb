"""Checkpoint save/load.

One self-describing format replaces the reference's two torch-pickle
formats (inference checkpoint utils.py:47-73; resume checkpoint
run_training.py:404-421): a ``.ckpt`` directory-in-a-zip (numpy .npz of the
flattened parameter pytree) + JSON metadata carrying the train config,
scalers, and optionally optimizer state and epoch for full resume.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

from ..data.scaler import StandardScaler


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}#/"))
    elif tree is None:
        out[prefix + "@none"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    """Rebuild the pytree from path-keyed arrays ('#' marks list levels)."""
    if list(flat.keys()) == [""]:
        return flat[""]
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        if key.endswith("@none"):
            parts = key.split("/")[:-1]
            node = root
            for p in parts[:-1] if parts else []:
                node = node.setdefault(p, {})
            continue
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.endswith("#") for k in keys):
            idx = sorted(keys, key=lambda k: int(k[:-1]))
            return [listify(node[k]) for k in idx]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str,
                    params,
                    config_dict: dict,
                    scalers: Optional[Dict[str, Optional[StandardScaler]]] = None,
                    opt_state=None,
                    epoch: Optional[int] = None,
                    extra_meta: Optional[dict] = None) -> None:
    """Write a .ckpt file (zip of params.npz + meta.json [+ opt.npz])."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    meta = {
        "config": config_dict,
        "epoch": epoch,
        "scalers": {k: (v.to_dict() if v is not None else None)
                    for k, v in (scalers or {}).items()},
    }
    if extra_meta:
        meta.update(extra_meta)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        with zf.open("meta.json", "w") as f:
            f.write(json.dumps(meta).encode())
        import io
        buf = io.BytesIO()
        np.savez(buf, **_flatten(params))
        zf.writestr("params.npz", buf.getvalue())
        if opt_state is not None:
            leaves, treedef = jax.tree_util.tree_flatten(
                jax.tree_util.tree_map(np.asarray, opt_state))
            buf = io.BytesIO()
            np.savez(buf, **{str(i): leaf for i, leaf in enumerate(leaves)})
            zf.writestr("opt.npz", buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Any, dict, Dict[str, Optional[StandardScaler]], Optional[int]]:
    """Read params, config dict, scalers, epoch from a checkpoint.

    Native ``.ckpt`` files are read directly; anything else (including
    every reference torch ``.pt`` shape) is dispatched to
    ``torch_import.import_reference_checkpoint``, so all checkpoint
    consumers accept reference checkpoints transparently."""
    try:
        zf = zipfile.ZipFile(path)
    except zipfile.BadZipFile:
        zf = None  # legacy torch pickle (pre-1.6 format)
    if zf is None or "meta.json" not in zf.namelist():
        # torch>=1.6 .pt files are zips too (data.pkl entries) — anything
        # without our meta.json goes through the reference importer
        if zf is not None:
            zf.close()
        from .torch_import import import_reference_checkpoint
        params, config, scaler_dicts, epoch = \
            import_reference_checkpoint(path)
        scalers = {k: StandardScaler.from_dict(v)
                   for k, v in scaler_dicts.items()}
        return params, config, scalers, epoch
    with zf:
        # a corrupt native checkpoint raises here, deliberately
        meta = json.loads(zf.read("meta.json"))
        import io
        npz = np.load(io.BytesIO(zf.read("params.npz")))
        params = _unflatten({k: npz[k] for k in npz.files})
    scalers = {k: StandardScaler.from_dict(v)
               for k, v in meta.get("scalers", {}).items()}
    return params, meta["config"], scalers, meta.get("epoch")


def load_opt_state(path: str, opt_state_template):
    """Restore optimizer state into the structure of a freshly-initialized
    state (full-resume path, reference run_training.py:241-263). Returns
    None (fresh optimizer) for checkpoints without optimizer state,
    including imported torch .pt files."""
    try:
        zf = zipfile.ZipFile(path)
    except zipfile.BadZipFile:
        return None  # legacy torch pickle: no optax state to restore
    with zf:
        if "opt.npz" not in zf.namelist():
            return None
        import io
        npz = np.load(io.BytesIO(zf.read("opt.npz")))
        leaves = [npz[str(i)] for i in range(len(npz.files))]
    treedef = jax.tree_util.tree_structure(opt_state_template)
    tmpl_leaves = jax.tree_util.tree_leaves(opt_state_template)
    coerced = [np.asarray(l, dtype=np.asarray(t).dtype).reshape(np.asarray(t).shape)
               for l, t in zip(leaves, tmpl_leaves)]
    return jax.tree_util.tree_unflatten(treedef, coerced)
