"""Flagship integration test: the full RAC loop on the JAX stack —
collect sim data -> train the robot-aware SVG model -> plan with CEM
through the learned model -> execute in the env via the episode runner
(reference pipeline: README.md workflow, src/mbrl/push_episode_runner.py).
"""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.episode_runner import PushEpisodeRunner
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.envs import LocobotPushEnv
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training.trainer import PredictionTrainer


@pytest.mark.slow
def test_full_rac_loop(tmp_path):
    cfg = Config(
        model="svg",
        experiment="synthetic",
        g_dim=16,
        z_dim=4,
        image_height=48,
        image_width=64,
        batch_size=2,
        test_batch_size=2,
        niter=1,
        epoch_size=2,
        n_past=1,
        n_future=3,
        n_eval=4,
        video_length=6,
        checkpoint_interval=1,
        eval_interval=5,
        compute_dtype="float32",
        robot_dim=5,
        action_dim=5,
        robot_joint_dim=5,
        model_use_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        reward_type="dontcare",
        scheduled_sampling=True,
        log_dir=str(tmp_path),
        jobname="rac",
        num_devices=1,
        # planner
        horizon=3,
        opt_iter=2,
        action_candidates=6,
        topk=2,
        cem_init_std=0.5,
        replan_every=1,
        max_episode_length=3,
        num_episodes=1,
        world_cost_success=1e9,
        robot_cost_weight=0.0,
        use_env_dynamics=False,
        record_video_interval=0,
        demo_length=5,
    )
    # 1. train (synthetic fixture)
    trainer = PredictionTrainer(cfg)
    trainer.train()

    # 2. collect a demo to follow
    env = LocobotPushEnv(cfg, seed=3)
    demo_paths = demo_io.collect_demos(env, "straight_push", 1,
                                       str(tmp_path / "demos"))

    # 3. episode runner with the LEARNED model as physics
    runner = PushEpisodeRunner(cfg, trainer.params, trainer.bn)
    summary = runner.run(demo_paths)
    assert np.isfinite(summary["final_obj_dist"])
    assert 0.0 <= summary["goal_progress"] <= 1.0 + 1e-6
