"""Multi-host (multi-process) training over DCN + ICI.

Green-field TPU design — the reference is single-process, single-device
(SURVEY.md §2.9: no torch.distributed/NCCL/MPI anywhere). Here:

* ``initialize_multihost`` brings up the JAX distributed runtime (PJRT
  coordination service; Gloo collectives on CPU, ICI/DCN on TPU pods).
* ``make_hybrid_mesh`` builds a device mesh whose OUTER axes span hosts
  (slow DCN links) and INNER axes stay within a host's slice (fast ICI) —
  lay out shardings so the high-traffic collectives ride ICI.
* Input sharding is host-local: every process computes the SAME seeded
  global sample order (seeded shuffles are deterministic, mirroring the
  reference's MoleculeSampler semantics), featurizes only its slab of each
  global batch, and ``global_batch_from_local`` assembles the global
  jax.Array from per-process shards without any cross-host data movement.

The dp train step itself is unchanged (``dp.make_dp_train_step``): under a
global mesh its gradient psum compiles to an ICI all-reduce within hosts
and a DCN all-reduce across them. Verified by tests/test_multihost.py on a
2-process × 4-virtual-CPU-device cluster against a single-process oracle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op for a single process).

    On TPU pods the three arguments are inferred from the environment; on
    CPU/GPU clusters pass them explicitly (coordinator "host:port")."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_hybrid_mesh(dcn_axes: Dict[str, int],
                     ici_axes: Dict[str, int]) -> Mesh:
    """Mesh with host-spanning (DCN) axes outermost and within-host (ICI)
    axes innermost.

    dcn_axes: e.g. {"dp": n_hosts}; ici_axes: e.g. {"ep": devices_per_host}.
    The product of dcn sizes must equal the process count and the product
    of ici sizes the local device count."""
    from jax.experimental import mesh_utils

    names = tuple(dcn_axes) + tuple(ici_axes)
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    if jax.process_count() > 1:
        devs = jax.devices()
        n_slices = len({getattr(d, "slice_index", 0) for d in devs})
        if n_slices == int(np.prod(dcn_shape)):
            # TPU pods: group by slice so ICI axes stay inside a slice
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1,) * len(dcn_shape) + ici_shape,
                dcn_mesh_shape=dcn_shape + (1,) * len(ici_shape),
                devices=devs)
        else:
            # backends without slice topology (e.g. CPU clusters): group
            # hosts-major by process so ICI axes stay within a process
            devices = np.array(
                sorted(devs, key=lambda d: (d.process_index, d.id))
            ).reshape(dcn_shape + ici_shape)
    else:
        devices = mesh_utils.create_device_mesh(
            dcn_shape + ici_shape, devices=jax.devices())
    return Mesh(devices, names)


def process_batch_indices(order: Sequence[int], global_batch_size: int,
                          process_id: Optional[int] = None,
                          num_processes: Optional[int] = None) -> List[List[int]]:
    """Split a deterministic global sample order into this process's slab of
    every global batch.

    Every host runs the same seeded shuffle (deterministic, so no
    coordination is needed) and featurizes only rows
    [pid*local : (pid+1)*local] of each global batch. Trailing samples that
    do not fill a whole global batch are dropped (every host must
    contribute an equally-shaped shard)."""
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    if global_batch_size % nproc:
        raise ValueError(f"global_batch_size {global_batch_size} must be "
                         f"divisible by process count {nproc}")
    local = global_batch_size // nproc
    out = []
    for i in range(0, len(order) - global_batch_size + 1, global_batch_size):
        g = order[i:i + global_batch_size]
        out.append(list(g[pid * local:(pid + 1) * local]))
    return out


def global_batch_from_local(local_stacked: Dict, mesh: Mesh,
                            axis: str = "dp") -> Dict:
    """Assemble the global sharded batch from per-process local shards.

    ``local_stacked`` is the usual stacked-device-batch pytree with a
    leading LOCAL device axis (``dp.stack_device_batches`` over this
    host's shards). The returned pytree holds global jax.Arrays whose
    leading axis is sharded over ``axis`` across all hosts — no data
    leaves the host."""
    def leaf(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)
    return jax.tree_util.tree_map(leaf, local_stacked)
