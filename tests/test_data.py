"""Data layer tests: HDF5 round trip, snippet/normalization semantics,
loader batching, heatmaps."""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.heatmaps import create_heatmaps
from robot_aware_control_tpu.data.loader import DataLoader, collate_time_first
from robot_aware_control_tpu.data.norm import (
    LOCOBOT_HIGH,
    LOCOBOT_LOW,
    denormalize,
    normalize,
)
from robot_aware_control_tpu.data.robonet_hdf5 import (
    RoboNetHDF5Dataset,
    write_trajectory_hdf5,
)
from robot_aware_control_tpu.data.synthetic import generate_episode, synthetic_batch

CFG = Config(
    image_width=64, image_height=48, action_dim=5, robot_dim=5,
    robot_joint_dim=5, video_length=10, n_past=1, n_future=5, seed=0,
)


def _write_episode(tmp_path, name="locobot_c0/traj0.hdf5", T=12, adim=5):
    rng = np.random.RandomState(0)
    images = (rng.rand(T, 48, 64, 3) * 255).astype(np.uint8)
    states = rng.rand(T, 5).astype(np.float32) * 0.3
    actions = rng.uniform(-0.05, 0.05, (T - 1, adim)).astype(np.float32)
    masks = (rng.rand(T, 48, 64) > 0.8).astype(np.uint8)
    qpos = rng.rand(T, 5).astype(np.float32)
    path = str(tmp_path / name)
    write_trajectory_hdf5(path, images, states, actions, masks, qpos, "locobot")
    return path


def test_normalize_roundtrip(rng):
    s = rng.rand(7, 5).astype(np.float32)
    n = normalize(s, LOCOBOT_LOW, LOCOBOT_HIGH)
    d = denormalize(n, LOCOBOT_LOW, LOCOBOT_HIGH)
    np.testing.assert_allclose(d, s, rtol=1e-5, atol=1e-6)


def test_hdf5_reader_roundtrip(tmp_path):
    path = _write_episode(tmp_path)
    ds = RoboNetHDF5Dataset([path], ["locobot_c0"], CFG)
    item = ds[0]
    assert item["images"].shape == (10, 48, 64, 3)
    assert item["images"].dtype == np.float32
    assert item["images"].max() <= 1.0
    assert item["masks"].shape == (10, 48, 64, 1)
    assert set(np.unique(item["masks"])) <= {0.0, 1.0}
    assert item["states"].shape == (10, 5)
    assert item["actions"].shape == (9, 5)
    assert item["robot"] == "locobot"
    # locobot states xyz normalized into workspace bounds
    assert item["states"][:, :3].min() >= -1.5


def test_hdf5_autograsp_imputation(tmp_path):
    path = _write_episode(tmp_path, name="locobot_c0/traj1.hdf5", adim=4)
    ds = RoboNetHDF5Dataset([path], ["locobot_c0"], CFG)
    item = ds[0]
    assert item["actions"].shape == (9, 5)
    # imputed dim takes only the bound values
    assert set(np.unique(item["actions"][:, 4])) <= {
        float(LOCOBOT_LOW[-1]), float(LOCOBOT_HIGH[-1])
    }


def test_hdf5_snippet_sampling(tmp_path):
    path = _write_episode(tmp_path, T=20)
    cfg = CFG.replace(video_length=20)
    ds_full = RoboNetHDF5Dataset([path], ["locobot_c0"], cfg)
    assert ds_full[0]["images"].shape[0] == 20
    ds_snip = RoboNetHDF5Dataset([path], ["locobot_c0"], cfg, load_snippet=True)
    assert ds_snip[0]["images"].shape[0] == cfg.n_past + cfg.n_future


def test_loader_batching(tmp_path):
    paths = [
        _write_episode(tmp_path, name=f"locobot_c0/t{i}.hdf5") for i in range(5)
    ]
    ds = RoboNetHDF5Dataset(paths, ["locobot_c0"] * 5, CFG)
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (10, 2, 48, 64, 3)  # time-first
    assert b["actions"].shape == (9, 2, 5)
    assert len(b["robot"]) == 2


def test_loader_deterministic_order(tmp_path):
    paths = [
        _write_episode(tmp_path, name=f"locobot_c0/t{i}.hdf5") for i in range(4)
    ]
    ds = RoboNetHDF5Dataset(paths, ["locobot_c0"] * 4, CFG)
    a = [b["file_path"] for b in DataLoader(ds, 2, num_workers=3, seed=5)]
    b = [b["file_path"] for b in DataLoader(ds, 2, num_workers=1, seed=5)]
    assert a == b


def test_synthetic_episode_contract():
    ep = generate_episode(np.random.RandomState(0), T=8)
    assert ep["images"].shape == (8, 48, 64, 3)
    assert ep["masks"].sum() > 0
    batch = synthetic_batch(CFG, 3, 8, seed=1)
    assert batch["images"].shape == (8, 3, 48, 64, 3)
    assert batch["actions"].shape == (7, 3, 5)


def test_heatmaps():
    states = np.zeros((4, 5), np.float32)
    states[:, :3] = 0.5
    hm = create_heatmaps(states, LOCOBOT_LOW, LOCOBOT_HIGH, "locobot", "c0")
    assert hm.shape == (4, 48, 64, 1)
    assert hm.max() <= 1.0 and hm.max() > 0.0
