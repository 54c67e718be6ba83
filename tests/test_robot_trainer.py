"""Learned robot-model trainer tests (reference:
src/prediction/joint_pos_trainer.py:36-633)."""

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.robot_trainer import (
    JointPosDataset,
    RobotPredictionTrainer,
)


def _cfg(tmp_path):
    return Config(
        niter=3,
        batch_size=32,
        test_batch_size=32,
        eval_interval=3,
        lr=1e-3,
        robot_dim=5,
        robot_joint_dim=5,
        action_dim=5,
        image_height=48,
        image_width=64,
        log_dir=str(tmp_path),
        jobname="robot",
    )


def test_robot_trainer_learns_and_saves(tmp_path):
    cfg = _cfg(tmp_path)
    tr = RobotPredictionTrainer(cfg)
    test = JointPosDataset(cfg, num=64, T=6, seed=1)
    params0 = (tr.joint_params, tr.grip_params)
    before = tr.evaluate(params0, test)
    params = tr.train(JointPosDataset(cfg, num=128, T=6, seed=0), test)
    after = tr.evaluate(params, test)
    assert after["state_rollout_mse"] < before["state_rollout_mse"]
    assert 0.0 <= after["mask_iou"] <= 1.0

    path = ckpt.latest_checkpoint(tr.log_dir)
    trees, _ = ckpt.load_checkpoint(
        path, {"joint_model": tr.joint_params, "gripper_model": tr.grip_params}
    )
    assert "joint_model" in trees and "gripper_model" in trees
