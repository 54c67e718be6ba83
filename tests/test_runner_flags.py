"""Behavioral tests for the remaining Config flags (round-5 continuation
of the flag-consumption series; static lock in test_config_yaml_vis.py).
Each test proves the flag observably changes behavior, keyed to the
reference consumption site:
  beta1                    src/prediction/trainer.py:109-116
  random_snippet           src/prediction/trainer.py:259-276
  debug_cem                src/cem/cem.py:88-92,113-179
  debug_trajectory_path    src/cem/cem.py:182-250 (__main__ demo recipe)
  demo_timescale/demo_type src/mbrl/episode_runner.py:96-119
  subgoal_start            src/mbrl/episode_runner.py:121-129
  subgoal_step_limit       timeout-advance cadence (episode_runner.py)
  robot_cost_success       src/mbrl/episode_runner.py:46-66
  object/gripper_dist_*    fetch/pick env success thresholds
  object_demo_dir          src/mbrl/episode_runner.py:226-241
  cyclegan_ckpt            src/mbrl/push_episode_runner.py:264-283
  modified                 src/env/robotics/locobot_table_env.py:271-274
  plan_server_host/port    served-planner bind (no reference analogue)
  learned_robot_model,
  robot_model_ckpt         src/prediction/trainer.py:205-231,839-844
  wandb_entity/project/
  group/job_type           src/prediction/trainer.py:70-84
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.episode_runner import PushEpisodeRunner
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.envs import LocobotPushEnv
from robot_aware_control_tpu.training import checkpoint as ckpt


def _runner_cfg(tmp_path, **kw):
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
        world_cost_success=1e9,
        robot_cost_weight=0.0,
        reward_type="dense",
        log_dir=str(tmp_path),
        jobname="flags",
        record_video_interval=0,
        seed=0,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("demos")
    env = LocobotPushEnv(seed=0)
    demo_io.collect_demos(env, "straight_push", 1, str(d))
    return str(d)


# ---------------------------------------------------------------------------
# --beta1 (Adam momentum decay)


def test_beta1_changes_adam_update():
    from robot_aware_control_tpu.training.step import make_optimizer

    params = {"w": jnp.ones(3)}
    grads = [{"w": jnp.asarray([1.0, -1.0, 0.5])},
             {"w": jnp.asarray([-2.0, 0.0, 1.0])}]

    def run(beta1):
        tx = make_optimizer(Config(beta1=beta1))
        p, s = params, tx.init(params)
        for g in grads:
            u, s = tx.update(g, s, p)
            p = jax.tree.map(lambda a, b: a + b, p, u)
        return np.asarray(p["w"])

    a, b = run(0.9), run(0.1)
    assert np.abs(a - b).max() > 1e-6  # momentum history differs
    np.testing.assert_array_equal(run(0.9), run(0.9))


# ---------------------------------------------------------------------------
# --random_snippet (train window starts: random draw vs contiguous tiling)


def _tiny_trainer(tmp_path, **kw):
    from robot_aware_control_tpu.training.trainer import PredictionTrainer

    base = dict(
        model="det", experiment="synthetic", g_dim=8,
        image_height=16, image_width=16, batch_size=2,
        n_past=1, n_future=2, video_length=9,
        compute_dtype="float32", robot_dim=5, action_dim=5,
        robot_joint_dim=5, model_use_mask=True, model_use_robot_state=True,
        reconstruction_loss="dontcare_l1", log_dir=str(tmp_path),
        jobname="rs", num_devices=1, wandb=False,
    )
    base.update(kw)
    return PredictionTrainer(Config(**base))


def _window_starts(tr, T=9):
    """Run _train_video with a recording train_step; frame t carries the
    constant value t/10 so the first frame of each window names its start."""
    B, h, w = 2, 16, 16
    batch = {
        "images": np.broadcast_to(
            (np.arange(T, dtype=np.float32) / 10.0)[:, None, None, None, None],
            (T, B, h, w, 3)).copy(),
        "masks": np.zeros((T, B, h, w, 1), np.float32),
        "states": np.zeros((T, B, 5), np.float32),
        "actions": np.zeros((T - 1, B, 5), np.float32),
    }
    starts = []

    def rec(params, bn, opt, dev, key, prob):
        v = float(np.asarray(dev["images"])[0, 0, 0, 0, 0])
        starts.append(int(round(v * 10)))
        return params, bn, opt, {"loss": jnp.float32(0.0)}

    tr.train_step = rec
    tr._train_video(batch)
    return starts


def test_random_snippet_window_starts(tmp_path):
    # off: contiguous tiling 0, w, 2w (reference trainer.py:262 slices
    # fixed windows)
    tr = _tiny_trainer(tmp_path / "a", random_snippet=False)
    assert _window_starts(tr) == [0, 3, 6]
    # on (default): three draws from the trainer's seeded video rng
    tr = _tiny_trainer(tmp_path / "b", random_snippet=True, seed=0)
    r = np.random.RandomState(0)
    expect = [int(r.randint(0, 7)) for _ in range(3)]
    got = _window_starts(tr)
    assert got == [int(x) for x in expect]
    assert all(0 <= s <= 6 for s in got)


# ---------------------------------------------------------------------------
# --debug_trajectory_path + --debug_cem (one compile covers both: the demo
# CLI plans against a saved trajectory and the debug flag saves the top-K
# rollout strip)


def test_cem_demo_debug_trajectory_and_debug_cem_gifs(tmp_path, demo_dir):
    from robot_aware_control_tpu.planning import cem_demo

    demo_path = demo_io.list_demos(demo_dir)[0]
    log_dir = tmp_path / "cemdemo"
    cem_demo.main([
        "--model", "svg", "--g_dim", "8", "--z_dim", "4",
        "--horizon", "2", "--opt_iter", "1", "--action_candidates", "4",
        "--topk", "2", "--compute_dtype", "float32",
        "--log_dir", str(log_dir), "--jobname", "dbg",
        "--debug_trajectory_path", demo_path,
        "--debug_cem", "true",
    ])
    run_dirs = [os.path.join(r, f) for r, _, fs in os.walk(log_dir)
                for f in fs]
    names = [os.path.basename(p) for p in run_dirs]
    assert "cem_demo.gif" in names
    assert "debug_cem_ep0_step0.gif" in names


# ---------------------------------------------------------------------------
# episode-runner demo shaping flags


def test_demo_timescale_subsamples_goals(tmp_path, demo_dir):
    paths = demo_io.list_demos(demo_dir)
    demo = demo_io.load_demo(paths[0])
    T = len(demo["observations"])
    for ts, want in ((1, T), (2, (T + 1) // 2)):
        cfg = _runner_cfg(tmp_path / f"ts{ts}", demo_timescale=ts)
        runner = PushEpisodeRunner(cfg)
        runner.run_episode(0, paths[0])
        assert len(runner._goal_imgs) == want


def test_demo_type_selects_goal_stream(tmp_path, demo_dir):
    paths = demo_io.list_demos(demo_dir)
    demo = demo_io.load_demo(paths[0])
    # reference stream vocabulary: robot_demo is the with-robot render
    # (collect_clutter_data.py:94), saved as a zero-cost HDF5 hard link
    assert "robot_demo" in demo
    np.testing.assert_array_equal(demo["robot_demo"], demo["observations"])
    # default object_only_demo stream vs the reference's robot_demo name
    for key in ("object_only_demo", "robot_demo"):
        cfg = _runner_cfg(tmp_path / key, demo_type=key)
        runner = PushEpisodeRunner(cfg)
        runner.run_episode(0, paths[0])
        np.testing.assert_array_equal(
            np.asarray(runner._goal_imgs), demo[key]
        )


def test_subgoal_start_offsets_initial_goal(tmp_path, demo_dir):
    paths = demo_io.list_demos(demo_dir)
    # world_cost_success=-1e9: cost threshold can never pass, so _g_i
    # stays wherever subgoal_start put it
    cfg = _runner_cfg(tmp_path, subgoal_start=3, world_cost_success=-1e9)
    runner = PushEpisodeRunner(cfg)
    stats = runner.run_episode(0, paths[0])
    assert runner._g_i == 3
    assert stats["goal_progress"] == 0.0


def test_subgoal_step_limit_advances_on_timeout(tmp_path, demo_dir):
    paths = demo_io.list_demos(demo_dir)
    base = dict(world_cost_success=-1e9, max_episode_length=5)
    cfg = _runner_cfg(tmp_path / "off", subgoal_step_limit=0, **base)
    runner = PushEpisodeRunner(cfg)
    runner.run_episode(0, paths[0])
    assert runner._g_i == 1  # stuck: threshold never passes, no timeout

    cfg = _runner_cfg(tmp_path / "on", subgoal_step_limit=1, **base)
    runner = PushEpisodeRunner(cfg)
    runner.run_episode(0, paths[0])
    assert runner._g_i > 1  # timeout advance holds the demo cadence


def test_robot_cost_success_gates_sequential_advance():
    from robot_aware_control_tpu.planning.cost import RobotWorldCost
    from robot_aware_control_tpu.utils.state import State

    img = np.zeros((48, 64, 3), np.float32)
    curr = State(img=img, state=np.zeros(5, np.float32),
                 mask=np.zeros((48, 64), np.float32))
    goal = State(img=img, state=np.ones(5, np.float32),
                 mask=np.zeros((48, 64), np.float32))

    def advanced(thresh):
        cfg = Config(robot_cost_weight=1.0, world_cost_weight=0.0,
                     robot_cost_success=thresh)
        r = PushEpisodeRunner.__new__(PushEpisodeRunner)
        r.cfg, r.cost, r._g_i = cfg, RobotWorldCost(cfg), 0
        return r._pick_next_goal(curr, goal)

    assert advanced(1e9)        # any robot distance passes
    assert not advanced(1e-6)   # |state - goal| ~ sqrt(5) >> 1e-6


def test_object_and_gripper_dist_thresholds(tmp_path, demo_dir):
    paths = demo_io.list_demos(demo_dir)
    loose = _runner_cfg(tmp_path / "loose", object_dist_threshold=1e9,
                        gripper_dist_threshold=1e9)
    stats = PushEpisodeRunner(loose).run_episode(0, paths[0])
    assert stats["object_success"] == 1.0
    assert stats["gripper_success"] == 1.0

    tight = _runner_cfg(tmp_path / "tight", object_dist_threshold=0.0,
                        gripper_dist_threshold=0.0)
    stats = PushEpisodeRunner(tight).run_episode(0, paths[0])
    assert stats["object_success"] == 0.0
    assert stats["gripper_success"] == 0.0


def test_object_demo_dir_overrides_demo_dir(tmp_path, demo_dir):
    empty = str(tmp_path / "empty")
    os.makedirs(empty, exist_ok=True)
    cfg = _runner_cfg(tmp_path, demo_dir=empty, object_demo_dir=demo_dir)
    summary = PushEpisodeRunner(cfg).run()
    assert "goal_progress" in summary

    cfg = _runner_cfg(tmp_path, demo_dir=empty, object_demo_dir=None)
    with pytest.raises(FileNotFoundError):
        PushEpisodeRunner(cfg).run()


# ---------------------------------------------------------------------------
# --cyclegan_ckpt


def test_cyclegan_ckpt_loads_translator_params(tmp_path):
    from robot_aware_control_tpu.baselines.cyclegan import CycleGAN

    gan = CycleGAN(jax.random.PRNGKey(0))
    zeroed = jax.tree.map(lambda x: x * 0.0, gan.params)
    ckpt.save_checkpoint(str(tmp_path), 5, {"cyclegan": zeroed},
                         background=False)
    path = str(tmp_path / "ckpt_5.npz")

    cfg = _runner_cfg(tmp_path, cyclegan=True, cyclegan_ckpt=path)
    runner = PushEpisodeRunner(cfg)
    leaf = jax.tree.leaves(runner.translator.params)[0]
    assert float(jnp.abs(leaf).max()) == 0.0  # came from the ckpt

    cfg = _runner_cfg(tmp_path, cyclegan=True, cyclegan_ckpt=None)
    runner = PushEpisodeRunner(cfg)
    leaves = jax.tree.leaves(runner.translator.params)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)  # fresh init


# ---------------------------------------------------------------------------
# --modified (longer locobot forearm variant)


def test_modified_changes_forearm_kinematics_and_mask():
    from robot_aware_control_tpu.robot import locobot_kinematics as lk
    from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer

    q = np.zeros((1, 5), np.float32)
    eef0 = np.asarray(lk.eef_position(jnp.asarray(q[0]), l3=lk.L3))
    eef1 = np.asarray(lk.eef_position(jnp.asarray(q[0]), l3=lk.L3_MODIFIED))
    assert np.abs(eef0 - eef1).max() > 1e-3

    m0 = np.asarray(CapsuleMaskRenderer((48, 64)).render(jnp.asarray(q)))
    m1 = np.asarray(
        CapsuleMaskRenderer((48, 64), modified=True).render(jnp.asarray(q)))
    assert m0.shape == m1.shape
    assert np.abs(m0.astype(np.float32) - m1.astype(np.float32)).sum() > 0


# ---------------------------------------------------------------------------
# --plan_server_host / --plan_server_port (CLI bind wiring)


def test_plan_server_cfg_binds_host_port():
    from robot_aware_control_tpu.control.plan_server import build_server

    cfg = Config(
        model="svg", g_dim=8, z_dim=4,
        image_height=48, image_width=64, action_dim=5, robot_dim=5,
        robot_joint_dim=5, model_use_mask=True, model_use_robot_state=True,
        reconstruction_loss="dontcare_l1", reward_type="dontcare",
        compute_dtype="float32", horizon=2, opt_iter=1,
        action_candidates=4, topk=2,
        plan_server_host="127.0.0.1", plan_server_port=0,
    )
    server = build_server(cfg)
    try:
        host, port = server.address
        assert host == "127.0.0.1"
        assert port > 0  # port 0 -> ephemeral bind succeeded
    finally:
        server.close()


# ---------------------------------------------------------------------------
# --learned_robot_model / --robot_model_ckpt


def test_learned_robot_model_loads_ckpt(tmp_path):
    from robot_aware_control_tpu.models import robot_mlp

    shape = dict(
        model="det", g_dim=8, image_height=16, image_width=16,
        n_past=1, n_future=2, compute_dtype="float32", robot_dim=5,
        action_dim=5, robot_joint_dim=5, model_use_mask=True,
        model_use_robot_state=True, reconstruction_loss="dontcare_l1",
        num_devices=1, batch_size=2, jobname="lrm",
        experiment="finetune_sawyer_view",
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    joint = robot_mlp.joint_pos_predictor_init(
        keys[0], Config(**shape))
    grip = robot_mlp.gripper_state_predictor_init(
        keys[1], Config(**shape))
    zeroed = jax.tree.map(lambda x: x * 0.0, {"joint_model": joint,
                                              "gripper_model": grip})
    ckpt.save_checkpoint(str(tmp_path), 3, zeroed, background=False)
    path = str(tmp_path / "ckpt_3.npz")

    tr = _tiny_trainer(tmp_path / "run", learned_robot_model=True,
                       robot_model_ckpt=path, **shape)
    assert tr.learned_robot is not None  # flag routed the finetune path
    # zeroed MLPs predict zero deltas: the autoregressive rollout is
    # constant over time — proves the ckpt params were actually loaded
    s0 = jnp.ones((2, 5)) * 0.3
    q0 = jnp.zeros((2, 5))
    acts = jnp.ones((2, 2, 5)) * 0.5
    ss, masks = tr.learned_robot["fn"](
        tr.learned_robot["joint"], tr.learned_robot["grip"], s0, q0, acts)
    np.testing.assert_array_equal(np.asarray(ss[0]), np.asarray(ss[-1]))
    assert masks.shape[0] == 3

    tr = _tiny_trainer(tmp_path / "run2", learned_robot_model=True,
                       robot_model_ckpt=None, **shape)
    ss2, _ = tr.learned_robot["fn"](
        tr.learned_robot["joint"], tr.learned_robot["grip"], s0, q0, acts)
    assert np.abs(np.asarray(ss2[0]) - np.asarray(ss2[-1])).max() > 0


# ---------------------------------------------------------------------------
# --wandb_entity/--wandb_project/--wandb_group/--wandb_job_type


def test_wandb_flags_reach_wandb_init(tmp_path, monkeypatch):
    from robot_aware_control_tpu.training.logger import RunLogger

    captured = {}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: captured.update(kw)
    fake.log = lambda *a, **kw: None
    fake.finish = lambda *a, **kw: None
    fake.Video = lambda *a, **kw: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg = Config(
        wandb=True, wandb_project="projX", wandb_entity="entY",
        wandb_group="grpZ", wandb_job_type="jobW",
        jobname="wb", log_dir=str(tmp_path),
    )
    logger = RunLogger(cfg, str(tmp_path))
    assert captured["project"] == "projX"
    assert captured["entity"] == "entY"
    assert captured["group"] == "grpZ"
    assert captured["job_type"] == "jobW"
    logger.close()
