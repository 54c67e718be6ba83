"""Finetune-path tests: analytical robot model replaces masks/states during
training/eval (reference: src/prediction/trainer.py:294-319, 520-550)."""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.training.trainer import PredictionTrainer


@pytest.mark.slow
def test_finetune_locobot_uses_robot_model(tmp_path):
    cfg = Config(
        model="svg",
        experiment="finetune_locobot",
        g_dim=16,
        z_dim=4,
        image_height=48,
        image_width=64,
        batch_size=2,
        test_batch_size=2,
        niter=1,
        epoch_size=1,
        n_past=1,
        n_future=2,
        n_eval=3,
        video_length=5,
        demo_length=5,
        checkpoint_interval=5,
        eval_interval=1,
        compute_dtype="float32",
        robot_dim=5,
        action_dim=5,
        robot_joint_dim=5,
        model_use_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        data_root=str(tmp_path / "data"),
        data_threads=2,
        finetune_num_train=4,
        finetune_num_test=2,
        impute_autograsp_action=False,
        log_dir=str(tmp_path),
        jobname="ft",
        num_devices=1,
    )
    collect_training_data("LocobotPush", 6, cfg.data_root, cfg, seed=0)
    tr = PredictionTrainer(cfg)
    assert tr.robot_model is not None  # analytical model active
    tr.train()
    # metrics were produced and logged
    import os

    assert os.path.exists(os.path.join(tr.log_dir, "metrics.jsonl"))
