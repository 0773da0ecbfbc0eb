#!/usr/bin/env python
"""Probe: can a Pallas matmul with the 3-pass hi/lo split fused
in-register beat XLA's HIGH emulation at the train step's tail shapes
((B,384)@(384,384): the per-layer gw/dW_h matmuls)?

XLA's emulation materializes bf16 hi/lo operand copies per pass; a
fused kernel reads the f32 lhs tile once, splits in registers, and
runs the 3 MXU passes back-to-back. Measured with the two-point
RTT-cancelling harness (see band_mxu_probe2)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from polymer_chemprop_tpu.ops import pallas_mpnn as pm  # noqa: E402

B, H = 28672, 384
TILE = 512


def _fused_kernel(x_ref, bhi_ref, blo_ref, o_ref):
    x = x_ref[:, :]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x_hi, bhi_ref[:, :], dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x_hi, blo_ref[:, :], dn,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x_lo, bhi_ref[:, :], dn,
                               preferred_element_type=jnp.float32)
    o_ref[:, :] = acc


def fused_matmul(x, b_hi, b_lo):
    return pl.pallas_call(
        _fused_kernel,
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec((TILE, H), lambda j: (j, 0)),
                  pl.BlockSpec((H, H), lambda j: (0, 0)),
                  pl.BlockSpec((H, H), lambda j: (0, 0))],
        out_specs=pl.BlockSpec((TILE, H), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
    )(x, b_hi, b_lo)


def timed(step, carry0, *ops, iters=(100, 400), trials=4, sleep=6.0):
    n0, n1 = iters

    def make(n):
        return jax.jit(lambda c, *o: jax.lax.scan(
            lambda m, _: (step(m, *o), None), c, None, length=n)[0])

    f0, f1 = make(n0), make(n1)
    for f in (f0, f1):
        out = f(carry0, *ops)
        float(jnp.asarray(out).ravel()[0])
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        out = f0(carry0, *ops)
        float(jnp.asarray(out).ravel()[0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f1(carry0, *ops)
        float(jnp.asarray(out).ravel()[0])
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (n1 - n0))
        if t < trials - 1:
            time.sleep(sleep)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(B, H)).astype(np.float32))
    w = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    w_hi = jnp.asarray(w, jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    flops = 3 * 2 * B * H * H

    def xla_step(m, ww):
        return pm._dot_band(m, ww, jax.lax.Precision.HIGH, False)

    def fused_step(m, bh, bl):
        return fused_matmul(m, bh, bl)

    # correctness first
    ref = xla_step(x, w)
    got = fused_step(x, w_hi, w_lo)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    print(f"max rel err fused vs XLA-3pass: {err:.2e}", flush=True)

    dt = timed(xla_step, x, w)
    print(f"xla_3pass  {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    dt = timed(fused_step, x, w_hi, w_lo)
    print(f"fused      {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
