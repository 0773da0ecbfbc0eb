"""ctypes binding for the native featurization library.

Loads ``native/libpcp_native.so`` (built with ``make -C native``) and
exposes :func:`featurize_batch_native`, a drop-in producer of GraphBatch
arrays for standard molecules and (with ``polymer=True``) wD-MPNN polymer
ensemble strings. Falls back gracefully when the library is absent:
``available()``/``polymer_available()`` gate usage and the loader keeps
the Python path as default.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "native", "libpcp_native.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pcp_featurize_batch.restype = ctypes.c_int
    lib.pcp_featurize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.pcp_count.restype = ctypes.c_int
    lib.pcp_count.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    # polymer entry points are absent from pre-polymer builds of the .so;
    # gate on them so a stale library falls back to the Python path
    if hasattr(lib, "pcp_featurize_polymer_batch"):
        lib.pcp_featurize_polymer_batch.restype = ctypes.c_int
        lib.pcp_featurize_polymer_batch.argtypes = (
            lib.pcp_featurize_batch.argtypes[:12]
            + [ctypes.POINTER(ctypes.c_float)]
            + lib.pcp_featurize_batch.argtypes[12:])
        lib.pcp_count_polymer.restype = ctypes.c_int
        lib.pcp_count_polymer.argtypes = lib.pcp_count.argtypes
    if hasattr(lib, "pcp_featurize_polymer_batch_h"):
        lib.pcp_featurize_polymer_batch_h.restype = ctypes.c_int
        lib.pcp_featurize_polymer_batch_h.argtypes = (
            lib.pcp_featurize_batch.argtypes[:12]
            + [ctypes.POINTER(ctypes.c_float)]
            + lib.pcp_featurize_batch.argtypes[12:]
            + [ctypes.c_int, ctypes.c_int])
        lib.pcp_count_polymer_h.restype = ctypes.c_int
        lib.pcp_count_polymer_h.argtypes = (
            lib.pcp_count.argtypes + [ctypes.c_int, ctypes.c_int])
    if hasattr(lib, "pcp_featurize_batch_h"):
        lib.pcp_featurize_batch_h.restype = ctypes.c_int
        lib.pcp_featurize_batch_h.argtypes = (
            lib.pcp_featurize_batch.argtypes
            + [ctypes.c_int, ctypes.c_int])
    if hasattr(lib, "pcp_featurize_batch_full"):
        lib.pcp_featurize_batch_full.restype = ctypes.c_int
        lib.pcp_featurize_batch_full.argtypes = (
            lib.pcp_featurize_batch.argtypes
            + [ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)])
        lib.pcp_count_h.restype = ctypes.c_int
        lib.pcp_count_h.argtypes = (
            lib.pcp_count.argtypes + [ctypes.c_int, ctypes.c_int])
    if hasattr(lib, "pcp_featurize_reaction_batch"):
        lib.pcp_featurize_reaction_batch.restype = ctypes.c_int
        lib.pcp_featurize_reaction_batch.argtypes = (
            lib.pcp_featurize_batch.argtypes
            + [ctypes.c_int, ctypes.c_int, ctypes.c_int])
        lib.pcp_count_reaction.restype = ctypes.c_int
        lib.pcp_count_reaction.argtypes = (
            lib.pcp_count.argtypes + [ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int])
    if hasattr(lib, "pcp_featurize_reaction_batch_h"):
        lib.pcp_featurize_reaction_batch_h.restype = ctypes.c_int
        lib.pcp_featurize_reaction_batch_h.argtypes = (
            lib.pcp_featurize_batch.argtypes
            + [ctypes.c_int] * 4)
        lib.pcp_count_reaction_h.restype = ctypes.c_int
        lib.pcp_count_reaction_h.argtypes = (
            lib.pcp_count.argtypes + [ctypes.c_int] * 4)
    if hasattr(lib, "pcp_rdkit2d_batch"):
        lib.pcp_rdkit2d_batch.restype = ctypes.c_int
        lib.pcp_rdkit2d_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_ubyte),
        ]
    _LIB = lib
    return lib


# reaction modes (featurization.py REACTION_MODES order): C enum + balance
_RXN_MODE = {"reac_prod": (0, 0), "reac_diff": (1, 0), "prod_diff": (2, 0),
             "reac_prod_balance": (0, 1), "reac_diff_balance": (1, 1),
             "prod_diff_balance": (2, 1)}


def available() -> bool:
    return _load() is not None


def polymer_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_polymer_batch")


def reaction_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_reaction_batch")


def hydrogens_available() -> bool:
    """keep_h / add_h support for standard molecules."""
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_batch_h")


def bond_parse_available() -> bool:
    """per-directed-bond parse-order index export (per-bond extras)."""
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_batch_full")


def reaction_hydrogens_available() -> bool:
    """add_h (AddHs) support for reaction mode."""
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_reaction_batch_h")


def polymer_hydrogens_available() -> bool:
    """keep_h / add_h support for polymer ensemble strings."""
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_featurize_polymer_batch_h")


def rdkit2d_available() -> bool:
    """Native 200-descriptor rdkit_2d engine (bit-identical to the
    Python oracle in chem/descriptors/ — tests/test_native.py)."""
    lib = _load()
    return lib is not None and hasattr(lib, "pcp_rdkit2d_batch")


def rdkit2d_batch_native(smiles: List[str], n_threads: int = 2):
    """Raw 200-column rdkit_2d descriptors for a SMILES batch.

    Returns (values ndarray (n, 200) float64, ok ndarray (n,) bool);
    rows with ok=False (parse failures) must fall back to the Python
    engine. ~2.4k mol/s on 2 cores vs ~40 mol/s for the Python engine
    (docs/parity.md)."""
    import numpy as np
    lib = _load()
    n = len(smiles)
    arr, _keep = _c_strings(smiles)
    out = np.zeros((n, 200), dtype=np.float64)
    ok = np.zeros(n, dtype=np.uint8)
    lib.pcp_rdkit2d_batch(
        arr, n, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, ok.astype(bool)


def _c_strings(smiles: List[str]):
    arr = (ctypes.c_char_p * len(smiles))()
    keep = [s.encode() for s in smiles]
    arr[:] = keep
    return arr, keep


def count_native(smiles: List[str], n_threads: int = 4, polymer: bool = False,
                 reaction_mode: Optional[str] = None, keep_h: bool = False,
                 add_h: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Per-molecule (n_atoms, n_bonds) counts; -1 marks invalid SMILES."""
    lib = _load()
    arr, keep = _c_strings(smiles)
    atoms = np.zeros(len(smiles), np.int32)
    bonds = np.zeros(len(smiles), np.int32)
    base = [arr, len(smiles),
            atoms.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads]
    if reaction_mode is not None:
        mode, balance = _RXN_MODE[reaction_mode]
        if add_h:
            if not hasattr(lib, "pcp_count_reaction_h"):
                raise RuntimeError("native library predates reaction add_h "
                                   "support (rebuild with make -C native)")
            lib.pcp_count_reaction_h(*base, mode, balance, int(keep_h),
                                     int(add_h))
        else:
            lib.pcp_count_reaction(*base, mode, balance, int(keep_h))
    elif polymer and (keep_h or add_h):
        lib.pcp_count_polymer_h(*base, int(keep_h), int(add_h))
    elif polymer:
        lib.pcp_count_polymer(*base)
    elif keep_h or add_h:
        lib.pcp_count_h(*base, int(keep_h), int(add_h))
    else:
        lib.pcp_count(*base)
    return atoms, bonds


def featurize_batch_native(smiles: List[str], pad_atoms: int, pad_bonds: int,
                           pad_mols: Optional[int] = None,
                           n_threads: int = 4, polymer: bool = False,
                           reaction_mode: Optional[str] = None,
                           keep_h: bool = False, add_h: bool = False,
                           bond_parse_out: Optional[np.ndarray] = None):
    """SMILES list -> GraphBatch (standard molecules — optionally with
    explicit-H retention / AddHs — wD-MPNN polymer ensemble strings with
    polymer=True, or atom-mapped reaction SMILES with reaction_mode
    set)."""
    from .features.batching import GraphBatch

    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    if polymer and not hasattr(lib, "pcp_featurize_polymer_batch"):
        raise RuntimeError("native library predates polymer support "
                           "(rebuild with make -C native)")
    if reaction_mode is not None and \
            not hasattr(lib, "pcp_featurize_reaction_batch"):
        raise RuntimeError("native library predates reaction support "
                           "(rebuild with make -C native)")
    if reaction_mode is not None and add_h and \
            not hasattr(lib, "pcp_featurize_reaction_batch_h"):
        raise RuntimeError("native library predates reaction add_h support "
                           "(rebuild with make -C native)")
    if (keep_h or add_h) and reaction_mode is None:
        sym = ("pcp_featurize_polymer_batch_h" if polymer
               else "pcp_featurize_batch_h")
        if not hasattr(lib, sym):
            raise RuntimeError("native library predates keep_h/add_h "
                               "support (rebuild with make -C native)")
    n = len(smiles)
    M = pad_mols or n
    atom_w, bond_w = (165, 193) if reaction_mode is not None else (133, 147)
    f_atoms = np.zeros((pad_atoms, atom_w), np.float32)
    f_bonds = np.zeros((pad_bonds, bond_w), np.float32)
    w_atoms = np.zeros(pad_atoms, np.float32)
    w_bonds = np.zeros(pad_bonds, np.float32)
    b2a = np.zeros(pad_bonds, np.int32)
    b2dst = np.zeros(pad_bonds, np.int32)
    b2revb = np.zeros(pad_bonds, np.int32)
    a2mol = np.zeros(pad_atoms, np.int32)
    valid = np.zeros(n, np.uint8)
    counts = np.zeros(2, np.int32)
    arr, keep = _c_strings(smiles)
    common = [
        arr, n, pad_atoms, pad_bonds,
        f_atoms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f_bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w_atoms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w_bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b2a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b2dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b2revb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        a2mol.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    ]
    tail = [
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    ]
    degree_of_polym = np.ones(M, np.float32)
    if reaction_mode is not None:
        mode, balance = _RXN_MODE[reaction_mode]
        if add_h:
            rc = lib.pcp_featurize_reaction_batch_h(
                *common, *tail, mode, balance, int(keep_h), int(add_h))
        else:
            rc = lib.pcp_featurize_reaction_batch(*common, *tail, mode,
                                                  balance, int(keep_h))
    elif polymer:
        dop = np.ones(n, np.float32)
        dop_p = dop.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if keep_h or add_h:
            rc = lib.pcp_featurize_polymer_batch_h(*common, dop_p, *tail,
                                                   int(keep_h), int(add_h))
        else:
            rc = lib.pcp_featurize_polymer_batch(*common, dop_p, *tail)
        degree_of_polym[:n] = dop
    elif bond_parse_out is not None:
        if not hasattr(lib, "pcp_featurize_batch_full"):
            raise RuntimeError("native library predates bond parse-order "
                               "export (rebuild with make -C native)")
        assert bond_parse_out.shape == (pad_bonds,) and \
            bond_parse_out.dtype == np.int32
        rc = lib.pcp_featurize_batch_full(
            *common, *tail, int(keep_h), int(add_h),
            bond_parse_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    elif keep_h or add_h:
        rc = lib.pcp_featurize_batch_h(*common, *tail, int(keep_h),
                                       int(add_h))
    else:
        rc = lib.pcp_featurize_batch(*common, *tail)
    if rc != 0:
        raise ValueError("batch exceeds padding envelope (native)")
    mol_mask = np.zeros(M, np.float32)
    mol_mask[:n] = valid[:n].astype(np.float32)
    return GraphBatch(
        f_atoms=f_atoms, f_bonds=f_bonds, w_atoms=w_atoms, w_bonds=w_bonds,
        b2a=b2a, b2dst=b2dst, b2revb=b2revb, a2mol=a2mol,
        degree_of_polym=degree_of_polym, mol_mask=mol_mask,
        n_atoms_real=int(counts[0]), n_bonds_real=int(counts[1])), valid
