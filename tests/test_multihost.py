"""Multi-host (multi-process) data-parallel training.

Spawns a real 2-process jax.distributed cluster (CPU backend, 4 virtual
devices per process, Gloo collectives) and runs two dp train steps on a
global mesh of 8 devices, with host-local input sharding
(parallel/multihost.py). The resulting losses must be identical on both
processes AND bit-match a single-process 8-device oracle run on the same
global batch — proving the DCN-spanning gradient psum reconstructs the
single-host computation exactly.

The reference has no distributed anything (SURVEY.md §2.9); this test is
the §4(d) multi-host-on-CPU-mesh strategy.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + ("4" if nproc > 1 else "8"))
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from polymer_chemprop_tpu.parallel import (
    global_batch_from_local, initialize_multihost, make_hybrid_mesh,
    process_batch_indices, make_dp_train_step, stack_device_batches,
)
if nproc > 1:
    initialize_multihost(f"localhost:{port}", nproc, pid)
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from polymer_chemprop_tpu.features import mol2graph
from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
from polymer_chemprop_tpu.train.scheduler import build_optimizer, build_schedule

SMILES = ["CCO", "c1ccccc1", "CCN", "CC(=O)O", "c1ccncc1",
          "C1CCCCC1", "CC(C)O", "CCOCC"]
# deterministic global order, identical on every process (no coordination)
import random
order = list(range(len(SMILES)))
random.Random(0).shuffle(order)

GLOBAL_BATCH = 8
local_idx = process_batch_indices(order, GLOBAL_BATCH, pid, nproc)[0]
local_devices = 4 if nproc > 1 else 8
per_dev = len(local_idx) // local_devices

enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=2)
mcfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                   ffn_hidden_size=16)
params = init_model(jax.random.PRNGKey(0), mcfg)

def device_batch(idxs):
    smi = [SMILES[i] for i in idxs]
    gb = mol2graph(smi, pad_atoms=32, pad_bonds=64, pad_mols=len(smi))
    t = np.array([[float(i)] for i in idxs], np.float32)
    return {"graphs": [gb.arrays()], "targets": t,
            "mask": np.ones_like(t), "weights": np.ones_like(t)}

local_batches = [device_batch(local_idx[d*per_dev:(d+1)*per_dev])
                 for d in range(local_devices)]
stacked = stack_device_batches(local_batches)
# hybrid mesh: dp across hosts (DCN), ep within (ICI); flatten to one dp
# axis of 8 devices keeping the hosts-major device order it produced
hybrid = make_hybrid_mesh({"dp": nproc}, {"ep": local_devices})
from jax.sharding import Mesh
mesh = Mesh(hybrid.devices.reshape(-1), ("dp",))

gbatch = global_batch_from_local(stacked, mesh, "dp")
schedule = build_schedule("constant", init_lr=1e-3, max_lr=1e-3,
                          final_lr=1e-3, warmup_epochs=1, epochs=2,
                          steps_per_epoch=1)
tx = build_optimizer("adam", schedule)
opt_state = tx.init(params)
replicate = NamedSharding(mesh, P())
params = jax.device_put(params, replicate)
opt_state = jax.device_put(opt_state, replicate)
step = make_dp_train_step(mcfg, tx, mesh, "dp")
rngs = jax.device_put(
    np.asarray(jax.random.split(jax.random.PRNGKey(0), 8)),
    NamedSharding(mesh, P("dp")))
for i in range(2):
    params, opt_state, loss, _g = step(params, opt_state, gbatch, rngs)
    print(f"LOSS {i} {float(loss):.10f}", flush=True)
"""


def _run_cluster(nproc: int, port: int):
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO},
             str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    return outs


def _losses(out: str):
    return [float(line.split()[2]) for line in out.splitlines()
            if line.startswith("LOSS")]


class TestMultihostDP:
    def test_two_process_cluster_matches_single_process(self):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        outs = _run_cluster(2, port)
        for rc, out in outs:
            assert rc == 0, out[-3000:]
        l0, l1 = _losses(outs[0][1]), _losses(outs[1][1])
        assert len(l0) == 2 and l0 == l1, (l0, l1)

        # single-process oracle on the same global batch (8 local devices)
        rc, out = _run_cluster(1, port)[0]
        assert rc == 0, out[-3000:]
        oracle = _losses(out)
        np.testing.assert_allclose(l0, oracle, rtol=1e-6, atol=1e-8)


WORKER_GP = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + ("4" if nproc > 1 else "8"))
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from polymer_chemprop_tpu.parallel import (
    initialize_multihost, make_hybrid_mesh,
    build_edge_shards_halo_dp, halo_strip_width, make_halo_dp_train_step,
)
if nproc > 1:
    initialize_multihost(f"localhost:{port}", nproc, pid)
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from polymer_chemprop_tpu.features import mol2graph
from polymer_chemprop_tpu.models import EncoderConfig, ModelConfig, init_model
from polymer_chemprop_tpu.train.scheduler import build_optimizer, build_schedule

# one batch per dp replica (= per host in the 2-process run); each host's
# halo ppermutes stay inside its own 4-device ep row (ICI), only the
# gradient psum crosses the host boundary (DCN)
BATCHES = [["CCO", "c1ccccc1", "CCN", "CC(=O)O"],
           ["c1ccncc1", "C1CCCCC1", "CC(C)O", "CCOCC"]]
TGTS = [[0.0, 1.0, 2.0, 3.0], [4.0, 5.0, 6.0, 7.0]]
pad = dict(pad_atoms=48, pad_bonds=96, pad_mols=4)
arrays = [mol2graph(b, **pad).arrays() for b in BATCHES]

enc = EncoderConfig(atom_fdim=133, bond_fdim=147, hidden_size=16, depth=2)
mcfg = ModelConfig(encoder=enc, dataset_type="regression", num_tasks=1,
                   ffn_hidden_size=16)
params = init_model(jax.random.PRNGKey(0), mcfg)
local_devices = 4 if nproc > 1 else 8
n_ep = 4
mesh = make_hybrid_mesh({"dp": nproc}, {"ep": local_devices}) \
    if nproc > 1 else make_hybrid_mesh({"dp": 2}, {"ep": 4})

sharded, replicated = build_edge_shards_halo_dp(arrays, n_ep,
                                                atom_window=48)
sw = halo_strip_width(sharded)
spec = NamedSharding(mesh, P("dp", "ep"))
sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), sharded)
targets = jnp.asarray(np.asarray(TGTS, np.float32)[..., None])
mask = jnp.ones_like(targets); weights = jnp.ones_like(targets)
schedule = build_schedule("constant", init_lr=1e-3, max_lr=1e-3,
                          final_lr=1e-3, warmup_epochs=1, epochs=2,
                          steps_per_epoch=1)
tx = build_optimizer("adam", schedule)
opt_state = tx.init(params)
rep = NamedSharding(mesh, P())
params = jax.device_put(params, rep); opt_state = jax.device_put(opt_state, rep)
step = make_halo_dp_train_step(mcfg, tx, mesh, overlap=True, strip_width=sw)
rngs = jnp.zeros((2, 4, 2), jnp.uint32)
for i in range(2):
    params, opt_state, loss, _g = step(params, opt_state, sharded,
                                       replicated, targets, mask, weights,
                                       rngs, jax.random.PRNGKey(0))
    print(f"LOSS {i} {float(loss):.10f}", flush=True)
"""


class TestMultihostGraphParallel:
    """Halo-exchange graph parallelism across a REAL 2-process cluster:
    dp spans hosts (DCN), the halo ep row stays inside each host (ICI) —
    the VERDICT r2 item 2b layout. Losses must agree across processes and
    match a single-process 8-device oracle."""

    def test_two_process_gp_dp_matches_single_process(self):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, "-c", WORKER_GP % {"repo": REPO},
                 str(pid), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=REPO))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append((p.returncode, out))
        for rc, out in outs:
            assert rc == 0, out[-3000:]
        l0, l1 = _losses(outs[0][1]), _losses(outs[1][1])
        assert len(l0) == 2 and l0 == l1, (l0, l1)

        p = subprocess.Popen(
            [sys.executable, "-c", WORKER_GP % {"repo": REPO},
             "0", "1", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO)
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-3000:]
        np.testing.assert_allclose(l0, _losses(out), rtol=1e-6, atol=1e-8)
