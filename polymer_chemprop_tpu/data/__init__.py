"""Data layer: datapoints, datasets, CSV ingest, splitters, loaders."""

from .csv_io import (
    get_class_sizes,
    validate_dataset_type,
    get_data,
    get_data_from_smiles,
    get_header,
    get_task_names,
    preprocess_smiles_columns,
    validate_data,
)
from .datapoint import (
    CACHE_CUTOFF,
    MoleculeDatapoint,
    MoleculeDataset,
    empty_cache,
    set_cache_graph,
)
from .loader import DeviceBatch, MoleculeDataLoader
from .scaler import StandardScaler
from .splits import scaffold_split, scaffold_to_indices, split_data

__all__ = [
    "CACHE_CUTOFF", "DeviceBatch", "MoleculeDataLoader", "MoleculeDatapoint",
    "MoleculeDataset", "StandardScaler", "empty_cache", "get_data",
    "get_data_from_smiles", "get_header", "get_task_names",
    "get_class_sizes", "preprocess_smiles_columns", "scaffold_split", "scaffold_to_indices", "validate_dataset_type",
    "set_cache_graph", "split_data", "validate_data",
]
