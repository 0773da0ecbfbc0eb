"""Polymer cross-framework oracle: torch replica of the reference wD-MPNN
vs the JAX trainer, head-to-head (VERDICT r2 item 4).

The reference's headline feature — ``--polymer`` weighted message passing
(mpn.py:110-171: w_bonds-weighted incoming sums, w_atoms-weighted readout
divided by the weight sum, x(1+log10 Xn)) — has NO reference test, so the
goldens never exercise it and parity previously rested on
self-consistency. This script closes that gap with a torch-CPU replica of
the reference trainer (the forensic_morgan_torch.py harness extended to
polymer mode and multi-task targets) consuming OUR MolGraphs, trained
head-to-head against the JAX framework at identical seeds on:

1. the EA/IP reconstruction (scripts/make_eaip_benchmark.py, weighted arm)
2. a synthetic copolymer set with NON-UNIT stochastic bond weights and a
   spread of Xn (the exact code paths unit-weight molecule data never
   touches)

plus a per-layer activation parity check at init (torch replica weights
copied into the JAX param pytree; every intermediate must match).

Results (2026-08-21, this container, --full):
  init activation parity (24 EA/IP + 24 synthetic mols, f32):
    message0 1.2e-7, message1 8.3e-7, message2 1.1e-6,
    atom_hiddens 1.3e-6, embedding 1.4e-6 max abs err — the weighted
    readout (x w_atoms, / sum w, x (1+log10 Xn)) matches to f32 noise
  EA/IP weighted (300 mols, 15 epochs, seeds 0/1/2):
    torch replica RMSE {0.2862, 0.2901, 0.3228}  mean 0.2997
    JAX framework RMSE {0.2781, 0.2748, 0.3071}  mean 0.2867 (-4.3%)
  synthetic non-unit-weight copolymers (240 mols, 15 epochs, seeds 0/1/2):
    torch replica RMSE {0.2886, 0.2178, 0.2354}  mean 0.2473
    JAX framework RMSE {0.2617, 0.2285, 0.2363}  mean 0.2422 (-2.1%)
  => per-seed deltas are inside both frameworks' own seed spreads and
  flip sign on the synthetic set; with matched init draws and per-layer
  parity at 1e-6, the residual few-% gap is batch-composition noise
  (the two trainers shuffle with different RNG streams). The weighted
  wD-MPNN path is reference-equivalent end-to-end, not just at init.
"""
import math
import os
import sys
from random import Random

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from polymer_chemprop_tpu.data import StandardScaler
from polymer_chemprop_tpu.features import FeaturizationConfig, mol2graph

HIDDEN, DEPTH, BATCH = 300, 3, 50
WARMUP_EPOCHS, INIT_LR, MAX_LR, FINAL_LR = 2.0, 1e-4, 1e-3, 1e-4


class RefPolymerModel(nn.Module):
    """Reference wD-MPNN (mpn.py:66-171) on our packed polymer arrays."""

    def __init__(self, atom_fdim, bond_fdim, n_tasks):
        super().__init__()
        self.Wi = nn.Linear(bond_fdim, HIDDEN, bias=False)
        self.Wh = nn.Linear(HIDDEN, HIDDEN, bias=False)
        self.Wo = nn.Linear(atom_fdim + HIDDEN, HIDDEN)
        self.f1 = nn.Linear(HIDDEN, HIDDEN)
        self.f2 = nn.Linear(HIDDEN, n_tasks)
        for p in self.parameters():
            if p.dim() > 1:
                nn.init.xavier_normal_(p)
            else:
                nn.init.zeros_(p)

    def forward(self, gb, trace=None):
        a = gb.arrays()
        fa = torch.tensor(np.asarray(a["f_atoms"]))
        fb = torch.tensor(np.asarray(a["f_bonds"]))
        wb = torch.tensor(np.asarray(a["w_bonds"]))
        wa = torch.tensor(np.asarray(a["w_atoms"]))
        b2a = torch.tensor(np.asarray(a["b2a"]), dtype=torch.long)
        b2dst = torch.tensor(np.asarray(a["b2dst"]), dtype=torch.long)
        b2revb = torch.tensor(np.asarray(a["b2revb"]), dtype=torch.long)
        a2mol = torch.tensor(np.asarray(a["a2mol"]), dtype=torch.long)
        dop = torch.tensor(np.asarray(a["degree_of_polym"]))
        A = fa.shape[0]
        inp = self.Wi(fb)
        msg = torch.relu(inp)
        if trace is not None:
            trace.append(("message0", msg))
        for layer in range(DEPTH - 1):
            # weighted incoming sum MINUS the unweighted reverse message
            amsg = torch.zeros(A, HIDDEN).index_add_(
                0, b2dst, msg * wb[:, None])
            msg = torch.relu(inp + self.Wh(amsg[b2a] - msg[b2revb]))
            if trace is not None:
                trace.append((f"message{layer + 1}", msg))
        amsg = torch.zeros(A, HIDDEN).index_add_(0, b2dst, msg * wb[:, None])
        ah = torch.relu(self.Wo(torch.cat([fa, amsg], 1)))
        if trace is not None:
            trace.append(("atom_hiddens", ah))
        mv = torch.zeros(gb.n_mols, HIDDEN).index_add_(
            0, a2mol, ah * wa[:, None])
        den = torch.zeros(gb.n_mols).index_add_(0, a2mol, wa).clamp(min=1e-12)
        emb = (mv / den[:, None]) * dop[:, None]
        if trace is not None:
            trace.append(("embedding", emb))
        return self.f2(torch.relu(self.f1(emb)))


def noam_lr(step, steps_per_epoch, epochs):
    warmup_steps = WARMUP_EPOCHS * steps_per_epoch
    total_steps = epochs * steps_per_epoch
    if step <= warmup_steps:
        return INIT_LR + step * (MAX_LR - INIT_LR) / warmup_steps
    gamma = (FINAL_LR / MAX_LR) ** (1 / (total_steps - warmup_steps))
    return max(MAX_LR * gamma ** (step - warmup_steps), FINAL_LR)


def synthetic_nonunit(n=240, seed=7):
    """Copolymers with non-uniform stochastic-bond weights, mixed
    stoichiometry and a log-spread of Xn; targets are a smooth function
    of composition so both frameworks can actually learn them."""
    rng = Random(seed)
    mons = [("[*:1]CC[*:2]", 0.3), ("[*:1]c1ccc([*:2])cc1", 1.1),
            ("[*:1]CO[*:2]", -0.4), ("[*:1]C(C)C[*:2]", 0.6),
            ("[*:1]c1ccc([*:2])cc1C", 1.4), ("[*:1]CC(=O)O[*:2]", -0.9)]
    rows = []
    for _ in range(n):
        (m1, v1), (m2, v2) = rng.sample(mons, 2)
        m2 = m2.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
        fa = rng.choice([0.2, 0.35, 0.5, 0.65, 0.8])
        # non-unit directed weights: alternating-leaning chain statistics
        p = rng.choice([0.3, 0.5, 0.7])
        q = 1.0 - p
        s = (f"{m1}.{m2}|{fa}|{1 - fa}|"
             f"<1-2:{p}:{p}<3-4:{p}:{p}<1-4:{q}:{q}<2-3:{q}:{q}"
             f"~{rng.choice([5, 20, 80, 300])}")
        xn = float(s.rsplit('~', 1)[1])
        y = (fa * v1 + (1 - fa) * v2 + 0.4 * (p - 0.5)
             + 0.25 * math.log10(xn) + rng.gauss(0, 0.05))
        rows.append((s, y))
    return rows


def eaip_rows(limit=None):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_eaip_benchmark import generate
    rows = [(s, ea, ip) for s, ea, ip in generate(blind_weights=False)]
    if limit:
        Random(0).shuffle(rows)
        rows = rows[:limit]
    return rows


def run_torch(rows, n_tasks, seed, epochs, fcfg):
    rng = Random(seed)
    idx = list(range(len(rows)))
    rng.shuffle(idx)
    n = len(idx)
    tr = [rows[i] for i in idx[:int(0.8 * n)]]
    va = [rows[i] for i in idx[int(0.8 * n):int(0.9 * n)]]
    te = [rows[i] for i in idx[int(0.9 * n):]]
    y_tr = np.array([r[1:] for r in tr], float)
    scaler = StandardScaler(replace_nan_token=None).fit(y_tr)
    y_tr_n = torch.tensor(scaler.transform(y_tr), dtype=torch.float32)

    torch.manual_seed(seed)
    probe = mol2graph([tr[0][0]], fcfg)
    model = RefPolymerModel(probe.f_atoms.shape[1], probe.f_bonds.shape[1],
                            n_tasks)
    opt = torch.optim.Adam(model.parameters(), lr=INIT_LR)
    steps_per_epoch = max(1, len(tr) // BATCH)

    def rmse_on(ds):
        model.eval()
        with torch.no_grad():
            gb = mol2graph([r[0] for r in ds], fcfg)
            preds = model(gb).numpy()
        preds = scaler.inverse_transform(preds)
        y = np.array([r[1:] for r in ds], float)
        return float(np.sqrt(np.mean((preds - y) ** 2)))

    best_val, best_state = float("inf"), None
    step = 0
    order = list(range(len(tr)))
    srng = Random(seed)
    for ep in range(epochs):
        model.train()
        srng.shuffle(order)
        for s in range(0, len(order), BATCH):
            bidx = order[s:s + BATCH]
            if not bidx:
                continue
            gb = mol2graph([tr[i][0] for i in bidx], fcfg)
            preds = model(gb)
            loss = ((preds - y_tr_n[bidx]) ** 2).mean()
            opt.zero_grad()
            loss.backward()
            step += 1
            for g in opt.param_groups:
                g["lr"] = noam_lr(step, steps_per_epoch, epochs)
            opt.step()
        v = rmse_on(va)
        if v < best_val:
            best_val = v
            best_state = {k: t.clone() for k, t in
                          model.state_dict().items()}
    model.load_state_dict(best_state)
    return rmse_on(te)


def run_jax(rows, n_tasks, seed, epochs, tmpdir):
    """The actual framework path (cross_validate on a CSV)."""
    import csv as _csv
    import json

    from polymer_chemprop_tpu.config import TrainConfig
    from polymer_chemprop_tpu.train import cross_validate
    path = os.path.join(tmpdir, f"poly_{seed}.csv")
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["smiles"] + [f"t{k}" for k in range(n_tasks)])
        for r in rows:
            w.writerow([r[0]] + list(r[1:]))
    cfg = TrainConfig(data_path=path, dataset_type="regression",
                      polymer=True, epochs=epochs, num_folds=1, seed=seed,
                      pytorch_seed=seed, batch_size=BATCH,
                      save_dir=os.path.join(tmpdir, f"jax_{seed}"),
                      quiet=True)
    cross_validate(cfg)
    with open(os.path.join(tmpdir, f"jax_{seed}", "fold_0",
                           "test_scores.json")) as f:
        scores = json.load(f)
    return float(np.mean(scores["rmse"]))


def activation_parity(rows, fcfg, n_tasks=2):
    """Copy the torch replica's init weights into the JAX pytree and
    compare every intermediate on one polymer batch."""
    import jax
    import jax.numpy as jnp

    from polymer_chemprop_tpu.models import (
        EncoderConfig, ModelConfig, init_model,
    )
    from polymer_chemprop_tpu.models.encoder import apply_encoder
    from polymer_chemprop_tpu.models.nn import get_activation, linear

    smiles = [r[0] for r in rows]
    gb = mol2graph(smiles, fcfg)
    torch.manual_seed(0)
    tm = RefPolymerModel(gb.f_atoms.shape[1], gb.f_bonds.shape[1], n_tasks)
    trace = []
    with torch.no_grad():
        t_out = tm(gb, trace=trace)
    t_acts = {k: v.numpy() for k, v in trace}

    enc = EncoderConfig(atom_fdim=gb.f_atoms.shape[1],
                        bond_fdim=gb.f_bonds.shape[1],
                        hidden_size=HIDDEN, depth=DEPTH)
    mcfg = ModelConfig(encoder=enc, dataset_type="regression",
                       num_tasks=n_tasks, ffn_hidden_size=HIDDEN)
    params = init_model(jax.random.PRNGKey(0), mcfg)
    pe = params["encoders"][0]
    pe["W_i"]["w"] = jnp.asarray(tm.Wi.weight.detach().numpy().T)
    pe["W_h"]["w"] = jnp.asarray(tm.Wh.weight.detach().numpy().T)
    pe["W_o"]["w"] = jnp.asarray(tm.Wo.weight.detach().numpy().T)
    pe["W_o"]["b"] = jnp.asarray(tm.Wo.bias.detach().numpy())
    params["ffn"][0]["w"] = jnp.asarray(tm.f1.weight.detach().numpy().T)
    params["ffn"][0]["b"] = jnp.asarray(tm.f1.bias.detach().numpy())
    params["ffn"][1]["w"] = jnp.asarray(tm.f2.weight.detach().numpy().T)
    params["ffn"][1]["b"] = jnp.asarray(tm.f2.bias.detach().numpy())

    arrays = gb.arrays()
    act = get_activation(enc.activation)
    from polymer_chemprop_tpu.ops.segment import (
        bond_message_step, weighted_segment_sum,
    )
    j_acts = {}
    inputs = linear(pe["W_i"], jnp.asarray(arrays["f_bonds"]))
    msg = act(inputs)
    j_acts["message0"] = msg
    wb = jnp.asarray(arrays["w_bonds"])
    b2a = jnp.asarray(arrays["b2a"])
    b2dst = jnp.asarray(arrays["b2dst"])
    b2revb = jnp.asarray(arrays["b2revb"])
    A = arrays["f_atoms"].shape[0]
    for layer in range(DEPTH - 1):
        m = bond_message_step(msg, wb, b2a, b2dst, b2revb, A)
        msg = act(inputs + linear(pe["W_h"], m))
        j_acts[f"message{layer + 1}"] = msg
    amsg = weighted_segment_sum(msg, wb, b2dst, A)
    ah = act(linear(pe["W_o"], jnp.concatenate(
        [jnp.asarray(arrays["f_atoms"]), amsg], axis=1)))
    j_acts["atom_hiddens"] = ah
    emb = apply_encoder(pe, {k: jnp.asarray(v) for k, v in arrays.items()},
                        enc, deterministic=True)
    j_acts["embedding"] = emb

    report = {}
    for k in t_acts:
        err = float(np.max(np.abs(np.asarray(j_acts[k]) - t_acts[k])))
        report[k] = err
    return report


def main():
    import tempfile
    quick = "--quick" in sys.argv
    epochs = 3 if quick else 15
    seeds = [0] if quick else [0, 1, 2]
    fcfg = FeaturizationConfig(polymer=True)

    eaip = eaip_rows(limit=60 if quick else 300)
    syn = synthetic_nonunit(48 if quick else 240)

    print("== init activation parity ==", flush=True)
    rep = activation_parity(eaip[:24] + [(s, y, 0.0) for s, y in syn[:24]],
                            fcfg)
    for k, e in rep.items():
        print(f"  {k:14s} max abs err {e:.3e}", flush=True)
    assert max(rep.values()) < 1e-3, rep

    with tempfile.TemporaryDirectory() as td:
        for name, rows, n_tasks in (("eaip", eaip, 2),
                                    ("synthetic", syn, 1)):
            ts, js = [], []
            for seed in seeds:
                t = run_torch(rows, n_tasks, seed, epochs, fcfg)
                j = run_jax(rows, n_tasks, seed, epochs, td)
                ts.append(t)
                js.append(j)
                print(f"{name} seed {seed}: torch {t:.4f}  jax {j:.4f}",
                      flush=True)
            print(f"{name}: torch mean {np.mean(ts):.4f}  "
                  f"jax mean {np.mean(js):.4f}  "
                  f"delta {(np.mean(js) - np.mean(ts)) / np.mean(ts):+.1%}",
                  flush=True)


if __name__ == "__main__":
    main()
