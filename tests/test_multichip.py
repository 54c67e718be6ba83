"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
training step (gradient all-reduce via XLA) and candidate-sharded CEM."""

import jax
import numpy as np

from __graft_entry__ import dryrun_multichip, entry


def test_entry_compiles():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1:] == (48, 64, 3)


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_host_shard_files_partition():
    """Per-host file shards are disjoint and cover everything."""
    from robot_aware_control_tpu.parallel.mesh import host_shard_files

    files = [f"f{i}" for i in range(11)]
    shards = [host_shard_files(files, i, 4) for i in range(4)]
    flat = [f for s in shards for f in s]
    assert sorted(flat) == sorted(files)
    assert len(set(flat)) == len(files)
    # single host: identity
    assert host_shard_files(files, 0, 1) == files


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path):
    """orbax directory checkpoint round-trips mesh-sharded arrays and is
    found by the same ckpt_<step> auto-resume scan."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robot_aware_control_tpu.parallel.mesh import get_mesh, replicate
    from robot_aware_control_tpu.training import checkpoint as ckpt

    mesh = get_mesh(8)
    params = {
        "w": jax.device_put(
            np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
            NamedSharding(mesh, P("data")),
        ),
        "b": replicate(mesh, np.ones(3, np.float32)),
    }
    path = ckpt.save_checkpoint_sharded(str(tmp_path), 7, {"params": params})
    assert ckpt.latest_checkpoint(str(tmp_path)) == path
    templates = {"params": jax.tree_util.tree_map(np.zeros_like, params)}
    shardings = {"params": {
        "w": NamedSharding(mesh, P("data")),
        "b": NamedSharding(mesh, P()),
    }}
    trees, step = ckpt.load_checkpoint_sharded(path, templates, shardings)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(trees["params"]["w"]),
                                  np.asarray(params["w"]))
    got_sh = trees["params"]["w"].sharding
    assert got_sh.is_equivalent_to(NamedSharding(mesh, P("data")), 2)
    # generic load_checkpoint dispatches on the directory too
    trees2, step2 = ckpt.load_checkpoint(path, templates)
    assert step2 == 7
    np.testing.assert_array_equal(np.asarray(trees2["params"]["b"]),
                                  np.ones(3, np.float32))


def test_sharded_checkpoint_namedtuple_field_order(tmp_path):
    """Restore matches leaves by KEY PATH: orbax serializes namedtuples
    (e.g. optax states) as dicts whose sorted-key flatten order differs
    from field order — same-shape leaves must not transpose."""
    import collections

    from robot_aware_control_tpu.training import checkpoint as ckpt

    # field order (nu, mu) vs sorted dict order (mu, nu); same shapes
    State = collections.namedtuple("State", ["nu", "mu"])
    state = State(nu=np.full(4, 7.0, np.float32), mu=np.full(4, 3.0, np.float32))
    path = ckpt.save_checkpoint_sharded(str(tmp_path), 1, {"opt": state})
    trees, _ = ckpt.load_checkpoint_sharded(
        path, {"opt": State(nu=np.zeros(4, np.float32),
                            mu=np.zeros(4, np.float32))}
    )
    np.testing.assert_array_equal(np.asarray(trees["opt"].nu), state.nu)
    np.testing.assert_array_equal(np.asarray(trees["opt"].mu), state.mu)


def test_make_global_batch_single_process():
    """make_global_batch assembles local arrays into mesh-sharded global
    arrays (single-process: local == global)."""
    from robot_aware_control_tpu.parallel.mesh import get_mesh, make_global_batch

    mesh = get_mesh(8)
    batch = {"images": np.zeros((3, 8, 4, 4, 3), np.float32),
             "step": np.float32(1.0)}
    out = make_global_batch(mesh, batch, batch_axis_index=1)
    assert out["images"].shape == (3, 8, 4, 4, 3)
    assert len(out["images"].sharding.device_set) == 8


def test_two_process_multihost_smoke():
    """Real 2-process jax.distributed path: host shards, global-batch
    assembly, cross-process reduction, orbax sharded ckpt round-trip
    (benchmarks/multihost_smoke.py; subprocesses so the in-proc backend
    stays untouched)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "benchmarks/multihost_smoke.py", "--port", "8627"],
        capture_output=True, timeout=400, cwd="/root/repo",
    )
    out = r.stdout.decode()
    assert r.returncode == 0, out + r.stderr.decode()
    assert out.count("MULTIHOST OK") == 2
