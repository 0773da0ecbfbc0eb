#!/usr/bin/env python
"""Benchmark: wD-MPNN training throughput on the TPU chip.

Measures the full jitted training step (forward + backward + Adam update,
hidden 300, depth 3 — the reference default model, args.py:312-314) on a
large batch built from the regression fixture molecules, and reports real
(unpadded) directed-bond edges processed per second.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "edges/s", "vs_baseline": N}

vs_baseline compares against the reference implementation's measured
training throughput on this container's CPU (torch 1-thread-pool defaults,
identical batch composition) — the only hardware the reference supports
(SURVEY.md §2.9: no GPU/multi-device code path exists in the fork, and the
repo publishes no hardware benchmarks, BASELINE.md). That number is
re-measured here with --baseline and cached in BASELINE_EDGES_PER_S.
"""

import csv
import json
import sys
import time

import numpy as np

# Reference-equivalent torch-CPU training-step throughput measured in this
# container (see bench.py --baseline): full train step, batch 1024 molecules
# of tests/data/regression.csv, hidden 300, depth 3.
BASELINE_EDGES_PER_S = 3386.0  # measured 2026-08-17 via `python bench.py --baseline`

BATCH_MOLS = 1024
HIDDEN = 300
DEPTH = 3


_MONOMERS = ["[*:1]c1ccc([*:2])cc1", "[*:1]CO[*:2]", "[*:1]C(C)C[*:2]",
             "[*:1]c1cc(F)c([*:2])cc1F", "[*:1]c1ccc(-c2ccc([*:2])s2)s1"]


def _polymer_smiles(n):
    """Deterministic wD-MPNN copolymer ensemble strings (stochastic
    inter-monomer bond weights, stoichiometry, Xn) for the weighted-band
    bench variant."""
    out = []
    for i in range(n):
        sa = _MONOMERS[i % len(_MONOMERS)]
        sb = _MONOMERS[(i // len(_MONOMERS) + i + 1) % len(_MONOMERS)]
        sb = sb.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        w = [0.1, 0.25, 0.5, 0.75, 0.9][i % 5]
        xn = [1, 5, 20, 100, 400][(i // 5) % 5]
        out.append(f"{sa}.{sb}|{w}|{1 - w}|<1-3:0.5:0.5<2-4:0.5:0.5~{xn}")
    return out


def _load_batch(polymer: bool = False, batch_mols: int = BATCH_MOLS):
    from polymer_chemprop_tpu.features import (FeaturizationConfig, mol2graph,
                                               round_up)
    if polymer:
        batch_smiles = _polymer_smiles(batch_mols)
        cfg = FeaturizationConfig(polymer=True)
    else:
        with open("tests/data/regression.csv") as f:
            r = csv.reader(f)
            next(r)
            smiles = [row[0] for row in r]
        batch_smiles = (smiles * ((batch_mols // len(smiles)) + 1))[:batch_mols]
        cfg = None
    # tight power-of-two-ish envelope; the probe envelope scales with
    # the batch (~28 atoms / 56 directed bonds per fixture molecule,
    # 4x margin) instead of a fixed worst case — a fixed 8*65536-bond
    # probe allocated ~0.45 GB of transient zeros per bench call
    probe_bonds = round_up(max(131072, batch_mols * 224), 1024)
    probe = mol2graph(batch_smiles, cfg, pad_atoms=probe_bonds // 2,
                      pad_bonds=probe_bonds, pad_mols=batch_mols)
    pa = round_up(probe.n_atoms_real, 1024)
    pb = round_up(probe.n_bonds_real, 1024)
    gb = mol2graph(batch_smiles, cfg, pad_atoms=pa, pad_bonds=pb,
                   pad_mols=batch_mols)
    return gb


def bench_tpu(pallas: bool = False, bf16: bool = False,
              precision: str = "high", polymer: bool = False,
              hidden: int = HIDDEN, depth: int = DEPTH,
              batch_mols: int = BATCH_MOLS, band_tile: int = None) -> dict:
    import jax
    from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
    from polymer_chemprop_tpu.train import make_train_step
    from polymer_chemprop_tpu.train.scheduler import build_optimizer, build_schedule

    # per-variant fallback accounting: --compare/--baseline runs build
    # several batches in one process, and the counters are process-global
    from polymer_chemprop_tpu.ops.pallas_mpnn import reset_fallback_stats
    reset_fallback_stats()
    gb = _load_batch(polymer=polymer, batch_mols=batch_mols)
    arrays = gb.arrays(pallas=pallas, band_tile=band_tile)
    n_real_edges = gb.n_bonds_real - 1

    # band-exact bond weights (multiples of 1/256 in [0,1] — then w and
    # w-1 are both bf16-exact) ride the 2-pass band, bitwise-identical —
    # true for unit weights AND for the polymer batch here (edge-rule
    # weights 0.5); the trainer detects this per dataset
    # (trainer.build_model_config data_smiles)
    w256 = gb.w_bonds.astype(np.float64) * 256.0
    w_exact = bool(((gb.w_bonds >= 0) & (gb.w_bonds <= 1)
                    & (w256 == np.round(w256))).all())
    enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=hidden,
                        depth=depth,
                        compute_dtype="bfloat16" if bf16 else "float32",
                        band_precision=precision,
                        unit_bond_weights=w_exact)
    mcfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                       ffn_hidden_size=hidden)
    params = init_model(jax.random.PRNGKey(0), mcfg)
    schedule = build_schedule("noam", init_lr=1e-4, max_lr=1e-3, final_lr=1e-4,
                              warmup_epochs=2, epochs=30, steps_per_epoch=100)
    tx = build_optimizer("adam", schedule)
    opt_state = tx.init(params)
    step = make_train_step(mcfg, tx)

    rng = np.random.default_rng(0)
    batch = {
        "graphs": [arrays],
        "targets": rng.normal(size=(batch_mols, 1)).astype(np.float32),
        "mask": np.ones((batch_mols, 1), np.float32),
        "weights": np.ones((batch_mols, 1), np.float32),
    }
    key = jax.random.PRNGKey(0)

    # Stage the batch on device once: a real input pipeline prefetches
    # batches to device memory, and the chip here sits behind a network
    # tunnel, so leaving ~20 MB of numpy inputs in the step call would
    # measure tunnel H2D bandwidth instead of device compute.
    batch = jax.device_put(batch)

    # warmup/compile
    params, opt_state, loss, gnorm = step(params, opt_state, batch, key)
    float(loss)

    # Sync discipline on this remote platform: jax.block_until_ready is NOT
    # a reliable fence here — on donated outputs it returns immediately, and
    # even on fresh scalars it has been observed to resolve on enqueue
    # (0.19 ms/step "measured" while a value readback proves 7.3 ms/step).
    # The only trustworthy fence is a D2H value read (float(loss)), which
    # costs one ~30 ms tunnel round-trip — amortized over the iteration
    # count.
    #
    # The chip is reached through a shared tunnel whose latency varies by
    # >100x between quiet and congested windows (observed 15 ms to 5.2 s
    # for this same step). Congestion only ever ADDS wall-clock, so the
    # honest device throughput is the FASTEST of several spaced rounds,
    # each sized adaptively to ~4 s.
    best_dt = float("inf")
    deadline = time.perf_counter() + 300.0
    for trial in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            params, opt_state, loss, gnorm = step(params, opt_state, batch,
                                                  key)
        float(loss)
        probe_dt = (time.perf_counter() - t0) / 3
        n_iters = max(10, min(300, int(4.0 / max(probe_dt, 1e-4))))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            params, opt_state, loss, gnorm = step(params, opt_state, batch,
                                                  key)
        float(loss)
        dt = (time.perf_counter() - t0) / n_iters
        best_dt = min(best_dt, dt)
        # a measurement near device speed needs no more trials; otherwise
        # wait out the congestion (bounded by the overall deadline)
        if best_dt < 0.012 or time.perf_counter() + 35 > deadline:
            break
        time.sleep(20)
    dt = best_dt

    edges_per_s = n_real_edges / dt
    kernel = ("pallas-band" if pallas else "xla-segment") + \
        ("+bf16" if bf16 else "") + ("+polymer" if polymer else "")
    from polymer_chemprop_tpu.ops.pallas_mpnn import fallback_stats
    fs = fallback_stats()
    if pallas and fs["rev_fallback"]:
        print(f"# band fallback: {fs['rev_fallback']}/{fs['batches']} "
              f"batches lost the rev-fused layer", file=sys.stderr)
    return {
        "metric": "wD-MPNN train-step throughput (real directed edges/s, "
                  f"batch {batch_mols} mols, hidden {hidden}, depth {depth}, "
                  f"{kernel}, {jax.devices()[0].device_kind})",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
        "step_ms": round(dt * 1e3, 3),
        "real_edges": n_real_edges,
        "padded_edges": int(arrays["f_bonds"].shape[0]),
    }


def bench_predict(pallas: bool = True) -> dict:
    """Post-warm inference throughput (molecules/s) on the chip — the
    serving-side number: one jitted forward over a device-resident batch."""
    import jax
    from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
    from polymer_chemprop_tpu.train.step import make_predict_step

    gb = _load_batch()
    arrays = gb.arrays(pallas=pallas)
    n_real_edges = gb.n_bonds_real - 1
    enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=HIDDEN,
                        depth=DEPTH, band_precision="high",
                        unit_bond_weights=True)
    mcfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                       ffn_hidden_size=HIDDEN)
    params = init_model(jax.random.PRNGKey(0), mcfg)
    batch = jax.device_put({"graphs": [arrays], "features": None})
    step = make_predict_step(mcfg)
    preds = step(params, batch)
    float(preds.sum())  # compile + fence

    best_dt = float("inf")
    for trial in range(5):
        n_iters = 200
        t0 = time.perf_counter()
        for _ in range(n_iters):
            preds = step(params, batch)
        float(preds.sum())
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)
        if best_dt < 0.004:
            break
        time.sleep(10)
    return {
        "metric": "wD-MPNN inference throughput (molecules/s, batch "
                  f"{BATCH_MOLS} mols, hidden {HIDDEN}, depth {DEPTH}, "
                  f"{'pallas-band' if pallas else 'xla-segment'}, "
                  f"{jax.devices()[0].device_kind})",
        "value": round(BATCH_MOLS / best_dt),
        "unit": "mol/s",
        "vs_baseline": None,
        "step_ms": round(best_dt * 1e3, 3),
        "edges_per_s": round(n_real_edges / best_dt),
    }


def bench_baseline_torch() -> dict:
    """Reference-equivalent torch CPU training step (dense index_add_
    aggregation exactly as reference mpn.py:110-131)."""
    import torch
    import torch.nn as nn

    gb = _load_batch()
    a = gb.arrays()
    n_real_edges = gb.n_bonds_real - 1
    fa = torch.tensor(a["f_atoms"]); fb = torch.tensor(a["f_bonds"])
    wb = torch.tensor(a["w_bonds"]); wa = torch.tensor(a["w_atoms"])
    b2a = torch.tensor(a["b2a"], dtype=torch.long)
    b2dst = torch.tensor(a["b2dst"], dtype=torch.long)
    b2revb = torch.tensor(a["b2revb"], dtype=torch.long)
    a2mol = torch.tensor(a["a2mol"], dtype=torch.long)
    A = fa.shape[0]; M = BATCH_MOLS; H = HIDDEN

    Wi = nn.Linear(fb.shape[1], H, bias=False)
    Wh = nn.Linear(H, H, bias=False)
    Wo = nn.Linear(fa.shape[1] + H, H)
    f1 = nn.Linear(H, H); f2 = nn.Linear(H, 1)
    model_params = (list(Wi.parameters()) + list(Wh.parameters()) +
                    list(Wo.parameters()) + list(f1.parameters()) +
                    list(f2.parameters()))
    opt = torch.optim.Adam(model_params, lr=1e-3)
    targets = torch.randn(M, 1)

    def train_step():
        inp = Wi(fb)
        msg = torch.relu(inp)
        for _ in range(DEPTH - 1):
            amsg = torch.zeros(A, H).index_add_(0, b2dst, msg * wb[:, None])
            msg = torch.relu(inp + Wh(amsg[b2a] - msg[b2revb]))
        amsg = torch.zeros(A, H).index_add_(0, b2dst, msg * wb[:, None])
        ah = torch.relu(Wo(torch.cat([fa, amsg], 1)))
        mv = torch.zeros(M, H).index_add_(0, a2mol, ah * wa[:, None])
        den = torch.zeros(M).index_add_(0, a2mol, wa).clamp(min=1e-12)
        preds = f2(torch.relu(f1(mv / den[:, None])))
        loss = ((preds - targets) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    train_step()  # warmup
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        train_step()
    dt = (time.perf_counter() - t0) / n_iters
    return {"metric": "reference-equivalent torch CPU train step",
            "value": round(n_real_edges / dt), "unit": "edges/s",
            "vs_baseline": 1.0, "step_ms": round(dt * 1e3, 3)}


if __name__ == "__main__":
    if "--baseline" in sys.argv:
        print(json.dumps(bench_baseline_torch()))
    elif "--compare" in sys.argv:
        # print both kernel variants (diagnostics; not the driver line)
        print(json.dumps(bench_tpu(pallas=False)))
        print(json.dumps(bench_tpu(pallas=True)))
    elif "--xla" in sys.argv:
        print(json.dumps(bench_tpu(pallas=False)))
    elif "--bf16" in sys.argv:
        print(json.dumps(bench_tpu(pallas=True, bf16=True)))
    elif "--predict" in sys.argv:
        # post-warm inference (serving) throughput
        print(json.dumps(bench_predict()))
    elif "--polymer" in sys.argv:
        # wD-MPNN copolymer ensembles: stochastic (non-unit) bond weights
        # through the weighted 3-pass band kernels + Xn-scaled readout
        print(json.dumps(bench_tpu(pallas=True, polymer=True)))
    elif "--wide" in sys.argv:
        # hyperopt-corner scale (hidden 2400, depth 6 — the top of the
        # reference search space, hyperparameter_optimization.py:21-27):
        # rides the column-chunked band path (hidden > fused ceiling)
        print(json.dumps(bench_tpu(pallas=True, hidden=2400, depth=6)))
    elif "--fastband" in sys.argv:
        # 1-pass bf16 MXU band kernels (diagnostics; experimental accuracy)
        print(json.dumps(bench_tpu(pallas=True, precision="default")))
    else:
        # default: Pallas band kernel; fall back to the XLA path if the
        # kernel fails to compile on this chip generation
        try:
            result = bench_tpu(pallas=True)
        except Exception:
            result = bench_tpu(pallas=False)
        print(json.dumps(result))
