"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU chip (one, via the axon tunnel) is reserved for bench.py; unit
tests force the CPU backend with 8 virtual devices so sharding tests
exercise real multi-device code paths without hardware.

Note: the container's sitecustomize registers the TPU plugin at interpreter
start and pins JAX_PLATFORMS=axon, so plain env vars are not enough — we
must override through jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
