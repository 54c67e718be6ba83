"""Two-process multi-host smoke test on CPU.

Validates the real multi-process path end to end — `jax.distributed`
init, per-host disjoint file shards (parallel/mesh.host_shard_files),
global-batch assembly from host-local data
(`jax.make_array_from_process_local_data` via make_global_batch), a
cross-process jitted reduction over the global mesh, and an orbax sharded
checkpoint saved by all hosts and restored by all hosts
(training/checkpoint.save/load_checkpoint_sharded).

The reference has no distributed backend at all (SURVEY section 2.11);
this is the TPU framework's multi-host contract, exercised with 2
processes x 4 virtual CPU devices.

Usage: python benchmarks/multihost_smoke.py [--port 8476]
Prints MULTIHOST OK per process and exits 0 on success.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import os, sys
pid, nproc, port, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, repo)
from robot_aware_control_tpu.parallel.mesh import (
    get_mesh, host_shard_files, make_global_batch, process_info, replicate)
from robot_aware_control_tpu.training import checkpoint as ckpt

assert process_info() == (pid, nproc)
assert len(jax.devices()) == 4 * nproc
mesh = get_mesh()

files = [f"f{i}" for i in range(8)]
mine = host_shard_files(files)
others = set(files) - set(mine)
assert len(mine) == 4 and len(others) == 4  # disjoint halves

local = {"x": np.full((2, 4, 3), pid, np.float32)}
gb = make_global_batch(mesh, local, batch_axis_index=1)
assert gb["x"].shape == (2, 8, 3)

@jax.jit
def global_sum(x):
    return jnp.sum(x)

s = float(global_sum(gb["x"]))
assert s == 2 * 4 * 3 * sum(range(nproc)), s

params = {"w": gb["x"], "b": replicate(mesh, np.ones(3, np.float32))}
ckdir = sys.argv[5]
path = ckpt.save_checkpoint_sharded(ckdir, 3, {"p": params})
templates = {"p": {"w": np.zeros((2, 8, 3), np.float32),
                   "b": np.zeros(3, np.float32)}}
trees, step = ckpt.load_checkpoint_sharded(path, templates)
assert step == 3
assert float(global_sum(trees["p"]["w"])) == s

# --- full trainer loop across both processes -------------------------------
# Exercises the real multi-host training path end to end: per-host synthetic
# loaders producing LOCAL batches, device_prefetch -> shard_batch ->
# make_array_from_process_local_data global assembly (incl. the (B,)
# batch_weight axis-0 case), the jitted whole-window train step over the
# global mesh, and the coordinated orbax checkpoint save.
from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.training.trainer import PredictionTrainer

cfg = Config(
    model="det", experiment="synthetic", g_dim=8, image_height=16,
    image_width=16, batch_size=8, test_batch_size=8, niter=1, epoch_size=2,
    n_past=1, n_future=2, n_eval=3, video_length=4, checkpoint_interval=5,
    eval_interval=50, compute_dtype="float32", robot_dim=5, action_dim=5,
    robot_joint_dim=5, model_use_mask=True, model_use_robot_state=True,
    reconstruction_loss="dontcare_l1", log_dir=sys.argv[6], jobname="mh",
    data_threads=1,
)
tr = PredictionTrainer(cfg)
assert tr.mesh is not None and tr.mesh.size == 4 * nproc
tr.train()
assert tr._step == 2, tr._step
final = ckpt.latest_checkpoint(tr.log_dir)
assert final is not None and os.path.isdir(final)  # orbax sharded dir
print(f"[p{pid}] MULTIHOST TRAINER OK", flush=True)

# --- FSDP-style param sharding across hosts ---------------------------------
# params + Adam state sharded over the global data axis (each host stores
# only its slice); XLA all-gathers at use over the cross-process backend,
# and the coordinated orbax save persists the cross-host shards.
cfg_f = cfg.replace(jobname="mh_fsdp", param_sharding="data")
tr_f = PredictionTrainer(cfg_f)
sharded_leaves = [
    l for l in jax.tree_util.tree_leaves(tr_f.params)
    if hasattr(l, "sharding") and any(s is not None for s in l.sharding.spec)
]
assert sharded_leaves, "no param leaf actually sharded over the data axis"
tr_f.train()
assert tr_f._step == 2, tr_f._step
print(f"[p{pid}] MULTIHOST FSDP OK", flush=True)
print(f"[p{pid}] MULTIHOST OK", flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", default="8476")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckdir = tempfile.mkdtemp(prefix="mh_ckpt_")
    logdir = tempfile.mkdtemp(prefix="mh_log_")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), "2", args.port, repo,
             ckdir, logdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        text = out.decode()
        if p.returncode != 0 or "MULTIHOST OK" not in text:
            ok = False
            print(f"--- process {i} failed (rc={p.returncode}) ---")
            print(text[-3000:])
        else:
            print(f"process {i}: MULTIHOST OK")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
