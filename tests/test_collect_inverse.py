"""Data collection + inverse model tests (reference:
src/dataset/collect_*.py, robonet inverse_model)."""

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import (
    collect_mask_data,
    collect_training_data,
)
from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset
from robot_aware_control_tpu.models import inverse_model


def test_collect_training_data_readable(tmp_path):
    cfg = Config(demo_length=6, video_length=6, robot_dim=5, action_dim=5,
                 robot_joint_dim=5, image_height=48, image_width=64,
                 impute_autograsp_action=False)
    paths = collect_training_data("LocobotPush", 2, str(tmp_path), cfg, seed=0)
    assert len(paths) == 2
    ds = RoboNetHDF5Dataset(paths, ["locobot_c0"] * 2, cfg)
    item = ds[0]
    assert item["images"].shape == (6, 48, 64, 3)
    assert item["images"].max() <= 1.0
    assert item["masks"].shape == (6, 48, 64, 1)
    assert item["actions"].shape == (5, 5)
    assert item["states"].shape == (6, 5)


def test_collect_mask_data(tmp_path):
    import h5py

    path = collect_mask_data("LocobotPush", 3, str(tmp_path), seed=0)
    with h5py.File(path) as hf:
        assert hf["qpos"].shape == (3, 5)
        assert hf["masks"].shape == (3, 48, 64, 1)


def test_inverse_model_learns(rng):
    cfg = Config(action_dim=2, channels=3)
    horizon = 3
    params = inverse_model.init(jax.random.PRNGKey(0), cfg, horizon)
    step, tx = inverse_model.make_inverse_train_step(cfg, horizon, lr=1e-3)
    opt = tx.init(params)
    start = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    goal = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    actions = jnp.asarray(rng.rand(8, horizon, 2), jnp.float32)
    losses = []
    for _ in range(20):
        params, opt, loss = step(params, opt, start, goal, actions)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_inverse_model_discretized(rng):
    cfg = Config(action_dim=2, channels=3)
    params = inverse_model.init(jax.random.PRNGKey(0), cfg, 2,
                                discretized=True, bins=5)
    step, tx = inverse_model.make_inverse_train_step(
        cfg, 2, discretized=True, bins=5
    )
    opt = tx.init(params)
    start = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
    goal = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
    actions = jnp.asarray(rng.uniform(-1, 1, (4, 2, 2)), jnp.float32)
    params, opt, loss = step(params, opt, start, goal, actions)
    assert np.isfinite(float(loss))
