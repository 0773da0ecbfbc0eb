#!/usr/bin/env python
"""Differential itemization of the batch-scaling penalty (VERDICT r4
item 4): per-edge step cost rises ~20%/~39% at 2x/4x batch
(docs/kernels.md "Batch scaling") — previously diagnosed by elimination
("working-set pressure"), here measured per component.

For batch 1024/2048/4096 molecules, times on-chip:
  step      — the full jitted train step (fwd+bwd+Adam)
  band_fwd  — the rev-fused forward band kernel alone
  band_bwd  — the rev-fused backward band kernel alone
  readout   — the banded atom readout (fwd)
  elemwise  — relu(x + inp) over the (B, 384) message array
  gather    — a srev row-permutation gather (B, 384)
  matmul    — (B, 384) @ (384, 384) XLA f32 HIGH

Each row reports per-REAL-EDGE nanoseconds so superlinear growth is
directly visible. Harness: operands as jit args, scan-amortized,
value-readback fenced, best-of-trials (CLAUDE.md timing discipline).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polymer_chemprop_tpu.ops import pallas_mpnn as pm  # noqa: E402

HP = 384


def timed(step, carry0, *ops, iters=(100, 400), trials=4, sleep=6.0):
    """Two-point scan timing: (T_long - T_short)/(n_long - n_short)
    cancels dispatch + the ~30 ms tunnel readback RTT (see
    band_mxu_probe2.timed)."""
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
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f1(carry0, *ops)
        float(jnp.asarray(out).ravel()[0])
        t_long = time.perf_counter() - t0
        best = min(best, (t_long - t_short) / (n1 - n0))
        if t < trials - 1:
            time.sleep(sleep)
    return best


def step_time(batch_mols):
    """Full train step via bench.bench_tpu's own plumbing."""
    import bench
    r = bench.bench_tpu(pallas=True, batch_mols=batch_mols)
    return r["step_ms"] / 1e3, r["real_edges"], r["padded_edges"]


def component_times(batch_mols):
    import bench
    gb = bench._load_batch(batch_mols=batch_mols)
    arrays = gb.arrays(pallas=True)
    aux = arrays["pallas_aux"]
    B = arrays["f_bonds"].shape[0]
    n_real = gb.n_bonds_real - 1
    rng = np.random.default_rng(0)
    msg = jax.device_put(rng.normal(size=(B, HP)).astype(np.float32))
    inputs = jax.device_put(rng.normal(size=(B, HP)).astype(np.float32))
    wh = jax.device_put(rng.normal(size=(HP, HP)).astype(np.float32) * .05)

    rs_rev = jax.device_put(aux["rs_rev"])
    w_sorted = jax.device_put(aux["w_sorted"])
    dst_sorted = jax.device_put(aux["dst_sorted"])
    src_sorted = jax.device_put(aux["src_sorted"])
    srev = jax.device_put(aux["srev"])

    out = {"B": B, "real": n_real}

    def band_fwd(m, w):
        return pm._band_rev_act_apply(
            m, w_sorted, dst_sorted, src_sorted, srev, rs_rev, w,
            inputs, "relu", jax.lax.Precision.HIGH, w_exact=True,
            write_z=False)

    out["band_fwd"] = timed(band_fwd, msg, wh)

    def band_bwd(m):
        return pm._band_rev_bwd_apply(
            m, w_sorted, dst_sorted, src_sorted, srev, rs_rev,
            jax.lax.Precision.HIGH, w_exact=True)

    out["band_bwd"] = timed(band_bwd, msg)

    if "ra" in aux:
        ra = jax.device_put(aux["ra"])
        A = int(arrays["f_atoms"].shape[0])
        op = pm._atom_band_op(A, jax.lax.Precision.HIGH, True)

        def readout(m):
            agg = op(m, w_sorted, dst_sorted, ra)
            # carry shape must match: tile the (A, HP) result back up
            return jnp.zeros_like(m).at[:A].set(agg)

        out["readout"] = timed(readout, msg)

    def elemwise(m, inp):
        return jnp.maximum(m + inp, 0.0)

    out["elemwise"] = timed(elemwise, msg, inputs)

    srev_idx = jax.device_put(np.asarray(aux["srev"]).astype(np.int32))

    def gather(m):
        return m[srev_idx]

    out["gather"] = timed(gather, msg)

    def matmul(m, w):
        return pm._dot_band(m, w, jax.lax.Precision.HIGH, False)

    out["matmul"] = timed(matmul, msg, wh)
    return out


def main():
    sizes = [1024, 2048, 4096]
    if len(sys.argv) > 1:
        sizes = [int(x) for x in sys.argv[1:]]
    rows = {}
    for bm in sizes:
        print(f"== batch {bm} mols", flush=True)
        comp = component_times(bm)
        dt, real, padded = step_time(bm)
        comp["step"] = dt
        comp["padded"] = padded
        rows[bm] = comp
        for k in ("step", "band_fwd", "band_bwd", "readout", "elemwise",
                  "gather", "matmul"):
            if k in comp:
                print(f"  {k:9s} {comp[k]*1e3:8.3f} ms  "
                      f"{comp[k]/comp['real']*1e9:7.2f} ns/edge",
                      flush=True)
        print(f"  real={comp['real']} padded={comp['padded']}", flush=True)

    base = rows[sizes[0]]
    print(f"\nper-edge growth vs batch {sizes[0]}:", flush=True)
    for k in ("step", "band_fwd", "band_bwd", "readout", "elemwise",
              "gather", "matmul"):
        if k not in base:
            continue
        line = f"{k:9s}"
        for bm in sizes:
            c = rows[bm]
            ratio = (c[k] / c["real"]) / (base[k] / base["real"])
            line += f"  {bm}: {100*(ratio-1):+6.1f}%"
        print(line, flush=True)


if __name__ == "__main__":
    main()
