"""Device mesh helpers.

The reference has no distributed backend at all (SURVEY.md §2.9: no
torch.distributed/NCCL/MPI anywhere; single-process, single-device). This
module is green-field TPU design: `jax.sharding.Mesh` over ICI with named
axes, used by the data-parallel trainer (dp.py) and the edge-partitioned
message passing (partition.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data-parallel mesh by default; pass ``shape`` for multi-axis
    meshes (e.g. ``make_mesh(8, ("dp", "ep"), shape=(2, 4))``)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    devs = np.array(devices[:n])
    if shape is not None:
        if int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {tuple(shape)} does not use "
                             f"{n} devices")
        return Mesh(devs.reshape(tuple(shape)), axis_names)
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # split n across the requested axes as evenly as possible (row-major)
    mshape = [1] * len(axis_names)
    mshape[0] = n
    return Mesh(devs.reshape(mshape), axis_names)
