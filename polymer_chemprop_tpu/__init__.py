"""polymer_chemprop_tpu: a TPU-native message-passing framework for molecular
and polymer property prediction.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference wD-MPNN polymer Chemprop fork (ayildiri/polymer-chemprop), designed
TPU-first: static-shape batched graphs, segment-sum message passing on the
MXU/VPU, Pallas kernels for the hot loop, and `jax.sharding` meshes for
multi-chip scaling.
"""

__version__ = "0.1.0"
version_info = (0, 1, 0)
