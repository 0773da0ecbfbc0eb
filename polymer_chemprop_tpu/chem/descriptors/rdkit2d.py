"""Placeholder — full 200-descriptor assembly is built below (filled in
as the submodules land)."""
RDKIT2D_NAMES = []
def rdkit2d_raw(mol): raise NotImplementedError
def rdkit2d_raw_dict(mol): raise NotImplementedError
