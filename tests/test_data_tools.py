"""Dataset tooling tests (reference: src/dataset/check_mask_data.py,
locobot_data_processor.py, visualize_actions.py)."""

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.data.tools import (
    check_mask_data,
    visualize_actions,
    world_change_rate,
)


def _collect(tmp_path, n=1):
    cfg = Config(demo_length=5, video_length=5, robot_dim=5, action_dim=5,
                 robot_joint_dim=5, image_height=48, image_width=64,
                 impute_autograsp_action=False)
    return collect_training_data("LocobotPush", n, str(tmp_path), cfg, seed=0)


def test_check_mask_data_valid(tmp_path):
    paths = _collect(tmp_path)
    report = check_mask_data(paths)
    assert all(info["ok"] for info in report.values())
    assert all(0 < info["mask_coverage"] < 0.9 for info in report.values())


def test_world_change_rate(rng):
    T, H, W = 4, 8, 8
    static = np.tile(rng.rand(1, H, W, 3).astype(np.float32), (T, 1, 1, 1))
    masks = np.zeros((T, H, W, 1), np.float32)
    assert world_change_rate(static, masks) == 0.0
    moving = rng.rand(T, H, W, 3).astype(np.float32)
    assert world_change_rate(moving, masks) > 0.01


def test_visualize_actions(tmp_path, rng):
    imgs = rng.rand(4, 48, 64, 3).astype(np.float32)
    actions = rng.rand(3, 5).astype(np.float32)
    states = rng.rand(4, 5).astype(np.float32)
    path = visualize_actions(imgs, actions, states,
                             str(tmp_path / "acts.gif"))
    import os

    assert os.path.exists(path)
