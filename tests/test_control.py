"""End-to-end control tests: demo collection, gt-physics CEM, episode
runner subgoal loop (reference: src/mbrl/episode_runner.py:25-296,
src/cem/mujoco/trajectory_sampler.py:132-316)."""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.episode_runner import PushEpisodeRunner
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.envs import LocobotPushEnv
from robot_aware_control_tpu.planning.gt_rollout import GTPushCEMPolicy
from robot_aware_control_tpu.utils.state import DemoGoalState, State


def _cfg(tmp_path, **kw):
    base = dict(
        env="LocobotPush",
        use_env_dynamics=True,
        horizon=3,
        opt_iter=2,
        action_candidates=8,
        topk=3,
        cem_init_std=0.5,
        replan_every=1,
        max_episode_length=4,
        num_episodes=1,
        demo_length=5,
        world_cost_success=1e9,  # always advance: keeps the test fast
        robot_cost_weight=0.0,
        reward_type="dense",
        log_dir=str(tmp_path),
        jobname="ctl",
        record_video_interval=0,
        seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_demo_collection_roundtrip(tmp_path):
    env = LocobotPushEnv(seed=0)
    paths = demo_io.collect_demos(env, "straight_push", 1, str(tmp_path))
    assert len(paths) == 1
    demo = demo_io.load_demo(paths[0])
    assert demo["observations"].ndim == 4
    assert "object_only_demo" in demo
    assert demo["masks"].shape[:1] == demo["observations"].shape[:1]
    # object-only images have no robot pixels where the mask was
    assert demo["object_only_demo"].shape == demo["observations"].shape


def test_gt_cem_policy(tmp_path):
    cfg = _cfg(tmp_path)
    env = LocobotPushEnv(cfg, seed=0)
    env.reset()
    policy = GTPushCEMPolicy(cfg, env)
    rng = np.random.RandomState(0)
    start = State(img=env.render(), state=np.asarray(env.state.eef))
    goal = DemoGoalState(
        imgs=[rng.rand(48, 64, 3).astype(np.float32)],
        masks=[np.zeros((48, 64), np.float32)],
    )
    plan = policy.get_action(start, goal)
    assert plan.shape == (cfg.horizon - 1, 2)
    assert np.all(np.abs(plan) <= 1.0 + 1e-6)


def test_push_episode_runner_gt(tmp_path):
    cfg = _cfg(tmp_path)
    env = LocobotPushEnv(cfg, seed=1)
    demo_paths = demo_io.collect_demos(
        env, "straight_push", 1, str(tmp_path / "demos")
    )
    runner = PushEpisodeRunner(cfg)
    summary = runner.run(demo_paths)
    assert "goal_progress" in summary
    assert 0.0 <= summary["goal_progress"] <= 1.0 + 1e-6
    assert np.isfinite(summary["final_obj_dist"])

def test_skip_subgoal_advances_past_reached_goals(tmp_path):
    """sequential_subgoal=False jumps past the most-future goal already
    under the success threshold (reference episode_runner.py:67-82 legacy
    semantics; the reference itself raises NotImplementedError here)."""
    cfg = _cfg(tmp_path, sequential_subgoal=False, world_cost_success=1.0)
    runner = PushEpisodeRunner.__new__(PushEpisodeRunner)
    runner.cfg = cfg
    from robot_aware_control_tpu.planning.cost import RobotWorldCost

    runner.cost = RobotWorldCost(cfg)
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32)
    far = rng.rand(48, 64, 3).astype(np.float32)
    # goals 0..2 match the current image (=> reachable), goal 3 is far
    runner._goal_imgs = np.stack([img, img, img, far])
    runner._goal_masks = np.zeros((4, 48, 64), np.float32)
    runner._g_i = 0
    curr = State(img=img, mask=np.zeros((48, 64), np.float32))
    goal = State(img=runner._goal_imgs[0], mask=runner._goal_masks[0])
    advanced = runner._pick_next_goal(curr, goal)
    assert advanced
    # last matching offset j=2 -> min_idx=3, +1 for new_goal => _g_i=4
    assert runner._g_i == 4

    # nothing under threshold -> no advance
    runner._g_i = 3
    advanced = runner._pick_next_goal(curr, goal)
    assert not advanced
    assert runner._g_i == 3


def test_collect_cli_demo_target(tmp_path):
    """`data.collect --collect_target demos` writes episode-runner demos
    that the runner's demo scan accepts (the CLI path the migration guide
    documents)."""
    from robot_aware_control_tpu.data.collect import main as collect_main

    demo_dir = str(tmp_path / "demos")
    collect_main([
        "--env", "LocobotPush", "--num_episodes", "2",
        "--collect_target", "demos", "--demo_dir", demo_dir,
        "--max_episode_length", "8",
    ])
    paths = demo_io.list_demos(demo_dir)
    assert len(paths) == 2
    demo = demo_io.load_demo(paths[0])
    for key in ("observations", "actions", "masks", "qpos", "robot_state"):
        assert key in demo, key
    assert demo["observations"].shape[0] == demo["actions"].shape[0] + 1
