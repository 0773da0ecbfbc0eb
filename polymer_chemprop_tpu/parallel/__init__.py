"""Multi-chip parallelism: device meshes, data-parallel training.

All green-field TPU design — the reference is strictly single-device
(SURVEY.md §2.9). Scaling strategy:

* data parallelism (dp.py): per-device GraphBatch shards, psum gradient
  reduction over ICI, exact global masked loss.
* edge partitioning (planned, partition.py): shard one giant batched graph's
  bond axis across devices with halo exchange of boundary bond states
  between message-passing layers — the graph analogue of sequence
  parallelism; reverse-edge pairs are co-located by construction because
  the batcher stores (fwd, rev) adjacently.
"""

from .dp import make_dp_train_step, shard_batch, stack_device_batches
from .multihost import (global_batch_from_local, initialize_multihost,
                        make_hybrid_mesh, process_batch_indices)
from .mesh import make_mesh
from .gspmd import graph_shardings, make_gspmd_train_step
from .partition import (build_edge_shards, build_edge_shards_halo,
                        build_edge_shards_halo_dp,
                        halo_strip_width,
                        make_halo_dp_train_step,
                        make_halo_train_step,
                        build_edge_shards_halo_band,
                        make_edge_parallel_forward_halo_band,
                        make_edge_parallel_forward,
                        make_edge_parallel_forward_halo,
                        make_edge_parallel_forward_halo_overlap)

__all__ = ["build_edge_shards", "build_edge_shards_halo",
           "build_edge_shards_halo_dp", "halo_strip_width",
           "make_halo_dp_train_step",
           "make_edge_parallel_forward_halo_overlap",
           "global_batch_from_local", "initialize_multihost",
           "make_hybrid_mesh", "process_batch_indices",
           "make_edge_parallel_forward_halo", "make_halo_train_step", "build_edge_shards_halo_band", "make_edge_parallel_forward_halo_band", "graph_shardings", "make_dp_train_step", "make_gspmd_train_step",
           "make_edge_parallel_forward", "make_mesh", "shard_batch",
           "stack_device_batches"]
