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


# ---------------------------------------------------------------------------
# fast-suite wall-time budget (VERDICT r2 item 7): the suite keeps growing
# (240 -> 276 -> 321 tests); surface the trend every run instead of
# discovering it when CI patience runs out. Informational by default —
# set PCP_SUITE_BUDGET_S to make an overrun fail the session (machine
# contention makes a hard default too flaky).
# ---------------------------------------------------------------------------

_SUITE_SOFT_BUDGET_S = 900   # ~15 min: the documented -n 4 envelope x2


def pytest_sessionstart(session):
    import time
    session._pcp_t0 = time.monotonic()


def pytest_sessionfinish(session, exitstatus):
    import time
    t0 = getattr(session, "_pcp_t0", None)
    if t0 is None:
        return
    elapsed = time.monotonic() - t0
    budget = float(os.environ.get("PCP_SUITE_BUDGET_S",
                                  _SUITE_SOFT_BUDGET_S))
    tr = session.config.pluginmanager.get_plugin("terminalreporter")
    msg = (f"[suite-budget] wall time {elapsed:.0f}s "
           f"(budget {budget:.0f}s{'' if elapsed <= budget else ' EXCEEDED'})")
    if tr is not None:
        tr.write_line(msg)
    if elapsed > budget and "PCP_SUITE_BUDGET_S" in os.environ:
        session.exitstatus = 1
