"""Behavioral tests for the round-4 flag-consumption work (VERDICT r3
Missing #5 / Weak #6): each previously-no-op Config flag now observably
changes behavior. The static lock lives in
test_config_yaml_vis.py::test_every_flag_consumed_or_descoped."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.envs import variants
from robot_aware_control_tpu.envs.base import RobotEnv
from robot_aware_control_tpu.envs.clutter_push import ClutterPushEnv


# ---------------------------------------------------------------------------
# --dropout (reference: vgg_64.py:68-79 via dynamics.py:107)


def test_dropout_train_stochastic_eval_identity():
    from robot_aware_control_tpu.models import svg_vector

    cfg = Config(
        model="svg_vec", g_dim=8, z_dim=4, action_dim=5, robot_dim=5,
        image_height=64, image_width=64, rnn_size=16,
        model_use_mask=False, model_use_robot_state=False,
        compute_dtype="float32", dropout=0.5,
    )
    params, bn = svg_vector.init(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(2, 64, 64, 3), jnp.float32)
    act = jnp.asarray(r.rand(2, 5), jnp.float32)

    def run(rng, train, dcfg=cfg):
        carry = svg_vector.init_carry(dcfg, 2)
        out, _, _ = svg_vector.step(
            dcfg, params, bn, carry, image=img, mask=None, robot=None,
            heatmap=None, action=act, rng=rng, sample_mean=True, train=train,
        )
        return np.asarray(out["x_pred"])

    # train mode: different dropout rngs -> different outputs
    a = run(jax.random.PRNGKey(1), True)
    b = run(jax.random.PRNGKey(2), True)
    assert np.abs(a - b).max() > 1e-6
    # eval mode: dropout off -> identical to a dropout=None config
    cfg_nd = cfg.replace(dropout=None)
    np.testing.assert_array_equal(
        run(jax.random.PRNGKey(1), False), run(jax.random.PRNGKey(2), False)
    )
    np.testing.assert_array_equal(
        run(jax.random.PRNGKey(1), False),
        run(jax.random.PRNGKey(1), False, cfg_nd),
    )


def test_dropout2d_zeroes_whole_channels():
    from robot_aware_control_tpu.ops.encoders import _dropout2d

    x = jnp.ones((4, 8, 8, 32))
    y = np.asarray(_dropout2d(x, 0.5, jax.random.PRNGKey(0), 1))
    per_channel = y.reshape(4, 64, 32)
    # each (batch, channel) is either all zero or all 1/keep
    for b in range(4):
        for c in range(32):
            vals = np.unique(per_channel[b, :, c])
            assert len(vals) == 1 and vals[0] in (0.0, 2.0)
    # roughly half survive
    frac = (y != 0).mean()
    assert 0.3 < frac < 0.7


# ---------------------------------------------------------------------------
# env observation / physics flags


def test_action_repeat_scales_displacement():
    e1 = RobotEnv(Config(action_repeat=1), seed=0)
    e3 = RobotEnv(Config(action_repeat=3), seed=0)
    e1.reset(), e3.reset()
    e3.set_flattened_state(e1.get_flattened_state())
    a = np.array([1.0, 0, 0, 0, 0], np.float32)
    p0 = np.asarray(e1.state.eef).copy()
    e1.step(a), e3.step(a)
    d1 = np.linalg.norm(np.asarray(e1.state.eef) - p0)
    d3 = np.linalg.norm(np.asarray(e3.state.eef) - p0)
    assert d3 > 2.5 * d1


def test_norobot_pixels_ob_removes_arm():
    cfg = Config(norobot_pixels_ob=True)
    env = RobotEnv(cfg, seed=0)
    obs = env.reset()
    # the observation equals the arm-free render exactly
    img_nr, _ = env._render_norobot_fn(env.state)
    np.testing.assert_allclose(obs["observation"], np.asarray(img_nr),
                               atol=1e-6)
    # plain env at the same state shows the arm (differs inside the mask)
    env2 = RobotEnv(Config(), seed=0)
    env2.reset()
    env2.set_flattened_state(env.get_flattened_state())
    obs2 = env2._get_obs()
    seg = obs2["masks"][..., 0] > 0.5
    assert seg.sum() > 0
    assert np.abs(obs2["observation"][seg] - obs["observation"][seg]).max() > 0.05


def test_most_recent_background_incremental():
    cfg = Config(norobot_pixels_ob=True, most_recent_background=True)
    env = RobotEnv(cfg, seed=0)
    obs = env.reset()
    assert env._background_img is not None
    for _ in range(2):
        obs, _, _, _ = env.step(np.array([0.5, 0.2, 0, 0, 0], np.float32))
    # inpainted obs: robot pixels come from the maintained background
    seg = obs["masks"][..., 0] > 0.5
    np.testing.assert_allclose(
        obs["observation"][seg], env._background_img[seg], atol=1e-6
    )


def test_robot_mask_with_obj():
    cfg = Config(robot_mask_with_obj=True)
    env = RobotEnv(cfg, seed=3)
    obs = env.reset()
    env2 = RobotEnv(Config(), seed=3)
    env2.reset()
    env2.set_flattened_state(env.get_flattened_state())
    obs2 = env2._get_obs()
    assert obs["masks"].sum() > obs2["masks"].sum()  # objects added


def test_pixels_ob_false_low_dim():
    env = RobotEnv(Config(pixels_ob=False), seed=0)
    obs = env.reset()
    assert obs["observation"].ndim == 1
    assert obs["observation"].shape[0] == 3 + 3 * env.num_objects


def test_depth_ob_raises():
    with pytest.raises(NotImplementedError):
        RobotEnv(Config(depth_ob=True), seed=0)


def test_large_block_and_red_robot():
    env = RobotEnv(Config(large_block=True), seed=0)
    assert env.obj_half == pytest.approx(RobotEnv.obj_half * 1.5)
    env_red = RobotEnv(Config(red_robot=True), seed=0)
    assert env_red.renderer.arm_color[0] > 0.5  # red-dominant
    assert RobotEnv(Config(), seed=0).renderer.arm_color[0] < 0.5


def test_camera_name_selects_calibrated_view():
    e_def = RobotEnv(Config(), seed=0)
    e_c1 = RobotEnv(Config(camera_name="locobot_c1"), seed=0)
    e_c1.reset()
    e_def.reset()
    e_c1.set_flattened_state(e_def.get_flattened_state())
    a = np.asarray(e_def._get_obs()["observation"])
    b = np.asarray(e_c1._get_obs()["observation"])
    assert np.abs(a - b).mean() > 0.01  # genuinely different viewpoint


# ---------------------------------------------------------------------------
# demo-generation flags (clutter env)


def _demo_cfg(**kw):
    base = dict(demo_length=10, seed=0)
    base.update(kw)
    return Config(**base)


def test_push_dist_switches_to_robot_goal():
    cfg = _demo_cfg(push_dist=0.0, robot_goal_distribution="behind_block")
    env = ClutterPushEnv(cfg, seed=0)
    h = env.generate_demo()
    assert "goal_robot_pose" in h
    # with push_dist already met, the demo heads for the robot goal:
    # final eef ends near (behind) the pushed block
    block = np.asarray(env.state.obj_pos[h["pushed_obj"]])[:2]
    eef = np.asarray(h["goal_robot_pose"])[:2]
    assert np.linalg.norm(eef - block) < 0.12


def test_action_noise_perturbs_demo():
    h0 = ClutterPushEnv(_demo_cfg(action_noise=0.0), seed=5).generate_demo()
    h1 = ClutterPushEnv(_demo_cfg(action_noise=0.0), seed=5).generate_demo()
    h2 = ClutterPushEnv(_demo_cfg(action_noise=0.3), seed=5).generate_demo()
    a0 = np.stack(h0["ac"])
    np.testing.assert_array_equal(a0, np.stack(h1["ac"]))  # deterministic
    assert np.abs(a0 - np.stack(h2["ac"])).max() > 1e-3


def test_invisible_demo_and_obj_observations():
    env = ClutterPushEnv(_demo_cfg(invisible_demo=True), seed=1)
    h = env.generate_demo()
    assert len(h["obj_observations"]) == len(h["obs"])
    # demo frames were rendered robot-free: they equal the obj stream
    for o, nr in zip(h["obs"], h["obj_observations"]):
        np.testing.assert_allclose(o["observation"], nr, atol=1e-6)
    assert not env._force_norobot  # restored after collection


# ---------------------------------------------------------------------------
# planner flags


def test_candidates_batch_size_chunking_matches_unchunked():
    """Chunked candidate evaluation returns the same plan as unchunked for
    a deterministic engine (gt physics): the chunking is a memory knob,
    not a semantics change."""
    from robot_aware_control_tpu.envs import LocobotPushEnv
    from robot_aware_control_tpu.planning.gt_rollout import GTPushCEMPolicy
    from robot_aware_control_tpu.utils.state import DemoGoalState, State

    def plan_with(cbs):
        cfg = Config(
            env="LocobotPush", use_env_dynamics=True, horizon=3, opt_iter=2,
            action_candidates=8, topk=3, cem_init_std=0.5,
            reward_type="dense", robot_cost_weight=0.0, seed=0,
            candidates_batch_size=cbs,
        )
        env = LocobotPushEnv(cfg, seed=0)
        env.reset()
        policy = GTPushCEMPolicy(cfg, env)
        r = np.random.RandomState(0)
        start = State(img=env.render(), state=np.asarray(env.state.eef))
        goal = DemoGoalState(
            imgs=[r.rand(48, 64, 3).astype(np.float32)],
            masks=[np.zeros((48, 64), np.float32)],
        )
        return policy.get_action(start, goal)

    np.testing.assert_allclose(plan_with(200), plan_with(4), atol=1e-5)


def test_unblur_timestep_traced_flag():
    from robot_aware_control_tpu.planning.cost import InpaintBlurCost

    cfg = Config(reward_type="inpaint-blur", blur_sigma=3.0,
                 unblur_cost_scale=3.0, img_dim=8)
    cost = InpaintBlurCost(cfg)
    r = np.random.RandomState(0)
    img = r.rand(2, 16, 16, 3).astype(np.float32)
    goal = r.rand(2, 16, 16, 3).astype(np.float32)
    blurred = np.asarray(cost(img, goal, blur=True))
    unblurred = np.asarray(cost(img, goal, blur=False))
    assert np.abs(blurred - unblurred).max() > 1e-6
    # traced flag matches the static branches
    np.testing.assert_allclose(
        np.asarray(cost(img, goal, blur=jnp.asarray(True))), blurred
    )
    np.testing.assert_allclose(
        np.asarray(cost(img, goal, blur=jnp.asarray(False))), unblurred
    )


# ---------------------------------------------------------------------------
# multiview / camera_ids / mesh_axes / video_type


def test_multiview_flag_and_camera_ids():
    cfg = Config(multiview=True, camera_ids=(0, 1, 2), image_height=24,
                 image_width=32)
    env = variants.make("LocobotPush", cfg, seed=0)
    obs = env.reset()
    assert obs["observation"].shape == (3 * 24, 32, 3)
    assert obs["masks"].shape[0] == 3 * 24
    # without the flag the factory returns the plain env
    env2 = variants.make("LocobotPush", Config(image_height=24,
                                               image_width=32), seed=0)
    assert env2.reset()["observation"].shape == (24, 32, 3)


def test_mesh_axes_renames_axes():
    from robot_aware_control_tpu.parallel import mesh as pmesh

    m = pmesh.get_mesh(1, axis="batch")
    assert m.axis_names == ("batch",)


def test_demo_video_dataset_video_type(tmp_path):
    from robot_aware_control_tpu.data import demo_io
    from robot_aware_control_tpu.data.loader import (
        DemoVideoDataset,
        create_demo_video_loaders,
    )
    from robot_aware_control_tpu.envs import LocobotPushEnv

    env = LocobotPushEnv(Config(demo_length=8), seed=0)
    demo_io.collect_demos(env, "straight_push", 3, str(tmp_path))
    cfg = Config(
        n_past=1, n_future=3, action_dim=5, robot_dim=5, robot_joint_dim=5,
        video_type="object_only_demo", demo_dir=str(tmp_path),
        batch_size=2, test_batch_size=1, data_threads=1, train_val_split=0.67,
    )
    files = demo_io.list_demos(str(tmp_path))
    ds = DemoVideoDataset(files, cfg)
    item = ds[0]
    assert item["images"].shape == (4, 48, 64, 3)
    assert item["actions"].shape == (3, 5)
    # object_only stream has no robot pixels under the mask
    seg = item["masks"][..., 0] > 0.5
    assert seg.sum() > 0
    ds_robot = DemoVideoDataset(files, cfg.replace(video_type="observations"),
                                seed=cfg.seed)
    item_r = ds_robot[0]
    assert np.abs(item["images"][seg] - item_r["images"][seg]).max() > 0.05
    train, test = create_demo_video_loaders(cfg)
    batch = next(iter(train))
    assert batch["images"].shape[0] == 4  # time-first collate


# ---------------------------------------------------------------------------
# runner flags


def test_runner_record_trajectory_and_goal_image_type(tmp_path):
    from robot_aware_control_tpu.control.episode_runner import (
        PushEpisodeRunner,
    )
    from robot_aware_control_tpu.data import demo_io
    from robot_aware_control_tpu.envs import LocobotPushEnv

    cfg = Config(
        env="LocobotPush", use_env_dynamics=True, horizon=3, opt_iter=2,
        action_candidates=8, topk=3, cem_init_std=0.5, replan_every=1,
        max_episode_length=4, num_episodes=1, demo_length=5,
        world_cost_success=1e9, robot_cost_weight=0.0, reward_type="dense",
        log_dir=str(tmp_path), jobname="flags", record_video_interval=0,
        seed=0, record_trajectory=True, record_trajectory_interval=1,
        goal_image_type="object_only", subgoal_completion_bonus=7.0,
    )
    env = LocobotPushEnv(cfg, seed=1)
    demo_paths = demo_io.collect_demos(
        env, "straight_push", 1, str(tmp_path / "demos")
    )
    runner = PushEpisodeRunner(cfg)
    summary = runner.run(demo_paths)
    traj_dir = os.path.join(runner.log_dir, "trajectory")
    assert os.path.isdir(traj_dir) and len(os.listdir(traj_dir)) == 1
    import pickle

    with open(os.path.join(traj_dir, os.listdir(traj_dir)[0]), "rb") as f:
        traj = pickle.load(f)
    assert len(traj["ac"]) >= 1 and len(traj["obs"]) == len(traj["ac"]) + 1
    # subgoal bonus flowed into the reward stat (thresholds force advances)
    assert summary["episode_reward"] != 0.0
    assert "object_success" in summary and "gripper_success" in summary


def test_mbrl_algo_validation():
    from robot_aware_control_tpu.control import episode_runner

    with pytest.raises(ValueError):
        episode_runner.main(["--mbrl_algo", "mppi"])


# ---------------------------------------------------------------------------
# round-5 widening: behavioral coverage for flags the static AST lock
# proves consumed but no test previously exercised end-to-end


def _rollout_engine_cfg(**kw):
    base = dict(
        reward_type="dense", image_height=48, image_width=64,
        robot_dim=5, action_dim=5, model_use_mask=True,
        model_use_robot_state=True, reconstruction_loss="l1",
    )
    base.update(kw)
    return Config(**base)


def test_eef_action_scale_scales_planned_displacement():
    """--eef_action_scale converts env-unit CEM actions to metric eef
    displacement inside the rollout IK block — the unit-mismatch bug the
    round-1 planner probe caught (RESULTS.md). Doubling the scale must
    exactly double the integrated planar displacement."""
    from robot_aware_control_tpu.planning.rollout import RolloutEngine

    actions = jnp.full((3, 2, 5), 0.1, jnp.float32)
    start_norm = jnp.zeros(5, jnp.float32)
    start_qpos = jnp.zeros(5, jnp.float32)

    def displacement(scale):
        eng = RolloutEngine(_rollout_engine_cfg(eef_action_scale=scale))
        _, states_raw, _ = eng.robot_trajectory(start_norm, start_qpos,
                                               actions)
        return np.asarray(states_raw[-1, 0, :2] - states_raw[0, 0, :2])

    d1, d2 = displacement(0.05), displacement(0.10)
    assert np.linalg.norm(d1) > 1e-4
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)


def test_cem_prediction_use_thick_mask_dilates_rollout_masks(monkeypatch):
    """--cem_prediction_use_thick_mask renders the planner's predicted
    masks with the gripper inflated by THICK_SCALE (reference hardcodes
    thick=True, trajectory_sampler.py:107); turning it off must shrink
    mask area. The SHIPPED held-out-tuned locobot THICK_SCALE is 1.0
    (r5 tuning outcome — the 1.2x thick-MJCF inflation does not improve
    IoU vs the thick oracle), which would make the flag a pixel-level
    no-op for the tuned locobot, so pin an inflating scale here to prove
    the flag still routes to the thick renderer."""
    import robot_aware_control_tpu.robot.mask_renderer as mr
    from robot_aware_control_tpu.planning.rollout import RolloutEngine

    monkeypatch.setattr(mr, "THICK_SCALE", 1.4)
    actions = jnp.zeros((2, 1, 5), jnp.float32)
    start_norm = jnp.zeros(5, jnp.float32)
    start_qpos = jnp.zeros(5, jnp.float32)

    def mask_px(thick):
        eng = RolloutEngine(
            _rollout_engine_cfg(cem_prediction_use_thick_mask=thick)
        )
        _, _, masks = eng.robot_trajectory(start_norm, start_qpos, actions)
        return float(jnp.sum(masks))

    thick_px, thin_px = mask_px(True), mask_px(False)
    assert thin_px > 0
    assert thick_px > thin_px


def test_pick_wide_x_std_restores_reference_exploration():
    """--pick_wide_x_std ablation switch (benchmarks/pick_std_ablation.py):
    with a demo-seeded mean, the default keeps exploration local
    (x-std == init_std/…); the flag restores the reference's wide x-std
    0.2 scheme (reference: src/cem/pick/cem.py:66-74). The mean stays
    demo-seeded either way."""
    from types import SimpleNamespace

    from robot_aware_control_tpu.planning.cem import PickCEMPolicy

    demo = np.tile(np.array([[0.3, -0.2, 0.1, -0.004]], np.float32), (5, 1))

    def mean_std(wide):
        stub = SimpleNamespace(
            init_std=0.015,
            cfg=Config(demo_cost=True, pick_wide_x_std=wide),
        )
        return PickCEMPolicy.init_mean_std(stub, 6, opt_traj=demo)

    mean_l, std_l = mean_std(False)
    mean_w, std_w = mean_std(True)
    np.testing.assert_allclose(np.asarray(mean_l), np.asarray(mean_w))
    np.testing.assert_allclose(np.asarray(mean_l)[:5], demo, atol=1e-6)
    assert float(std_w[0, 0]) == pytest.approx(0.2)
    assert float(std_l[0, 0]) == pytest.approx(0.015)


def test_black_robot_input_flag_forces_robot_model():
    """--black_robot_input alone (plain l1 loss, no mask/state
    conditioning) must still pull the analytic robot model into the
    rollout so there are masks to black out (reference:
    trajectory_sampler.py:28,90 and trainer.py:364-368)."""
    from robot_aware_control_tpu.planning.rollout import _needs_robot_model

    base = dict(model_use_mask=False, model_use_robot_state=False,
                model_use_heatmap=False, reconstruction_loss="l1",
                reward_type="dense")
    assert not _needs_robot_model(Config(**base))
    assert _needs_robot_model(Config(black_robot_input=True, **base))


# ---------------------------------------------------------------------------
# trainer-side flags: scheduled_sampling_k, movement_weight, eval_batches


def _tiny_trainer(tmp_path, **kw):
    from robot_aware_control_tpu.training.trainer import PredictionTrainer

    base = dict(
        model="det", g_dim=8, image_height=16, image_width=16,
        n_past=1, n_future=2, n_eval=3, batch_size=2, channels=3,
        compute_dtype="float32", log_dir=str(tmp_path), jobname="flagbeh",
        num_devices=1, experiment="synthetic",
    )
    base.update(kw)
    return PredictionTrainer(Config(**base))


def test_scheduled_sampling_k_sets_decay(tmp_path):
    """--scheduled_sampling_k is the inverse-sigmoid decay constant of the
    teacher-forcing probability k/(k+exp(step/k)) (reference:
    trainer.py:132-139): larger k decays slower, and the flag off means
    always ground truth."""
    tr = _tiny_trainer(tmp_path / "a", scheduled_sampling=True,
                       scheduled_sampling_k=100.0)
    tr._step = 0
    p0 = tr._sched_prob()
    tr._step = 500
    p500 = tr._sched_prob()
    assert p0 == pytest.approx(100.0 / 101.0)
    assert p500 < p0

    slow = _tiny_trainer(tmp_path / "b", scheduled_sampling=True,
                         scheduled_sampling_k=1000.0)
    slow._step = 500
    assert slow._sched_prob() > p500

    off = _tiny_trainer(tmp_path / "c", scheduled_sampling=False)
    off._step = 10_000
    assert off._sched_prob() == 1.0


def test_movement_weight_weights_high_movement_samples(tmp_path):
    """--movement_weight turns the per-video high_movement label into a
    per-sample loss weight (reference: trainer.py:341-344 scales the
    dontcare loss for moving-object videos)."""
    tr = _tiny_trainer(tmp_path, movement_weight=7.5)
    batch = {
        "images": np.zeros((4, 3, 16, 16, 3), np.float32),
        "actions": np.zeros((3, 3, 5), np.float32),
        "high_movement": np.array([True, False, True]),
    }
    w = tr._window(batch, 0, 3)
    np.testing.assert_allclose(w["batch_weight"], [7.5, 1.0, 7.5])


def test_eval_batches_caps_eval_epoch(tmp_path):
    """--eval_batches caps per-eval batches (0 = the reference's full-set
    eval, trainer.py:467-489); the copy-baseline's num_batches=-1 forces
    the full set regardless."""
    calls = []

    def run(cfg_eval_batches, num_batches=0, total=5):
        tr = _tiny_trainer(tmp_path / str(len(calls)),
                           eval_batches=cfg_eval_batches)
        tr._eval_video = lambda batch, autoregressive: {"psnr": 1.0}
        it = iter([{"images": None}] * total)
        _, n = tr._eval_epoch(it, num_batches=num_batches)
        calls.append(n)
        return n

    assert run(2) == 2          # cfg cap
    assert run(0) == 5          # cfg 0 -> full set
    assert run(2, num_batches=-1) == 5   # forced full set
    assert run(0, num_batches=3) == 3    # explicit arg wins


# ---------------------------------------------------------------------------
# data-augmentation flags (reference: robonet_dataset.py:257-300)


def _augment_with(cfg, images, masks):
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    ds = object.__new__(RoboNetHDF5Dataset)
    ds._config = cfg
    ds._rng = np.random.RandomState(3)
    return RoboNetHDF5Dataset._augment(ds, images, masks)


def test_color_jitter_range_and_random_crop():
    """--color_jitter_range scales/shifts colors episode-consistently and
    --random_crop_size crops-then-resizes images AND masks together; a
    full-size crop with zero jitter is the identity."""
    rng = np.random.RandomState(0)
    images = rng.rand(4, 48, 64, 3).astype(np.float32)
    masks = (rng.rand(4, 48, 64, 1) > 0.8).astype(np.float32)

    idem_cfg = Config(random_crop_size=64, color_jitter_range=0.0)
    im2, m2 = _augment_with(idem_cfg, images.copy(), masks.copy())
    np.testing.assert_allclose(im2, images, atol=1e-6)
    np.testing.assert_allclose(m2, masks, atol=1e-6)

    jit_cfg = Config(random_crop_size=64, color_jitter_range=0.2)
    im3, m3 = _augment_with(jit_cfg, images.copy(), masks.copy())
    assert np.abs(im3 - images).max() > 1e-3      # colors moved
    np.testing.assert_allclose(m3, masks, atol=1e-6)  # masks untouched
    # episode-consistent: the SAME affine color map applies to every
    # frame, so the per-pixel delta im3 - jitter*images - shift vanishes
    # for some single (jitter, shift) — recover it from frame 0 and check
    # it explains frame 1 wherever unclipped
    safe = (im3 > 1e-3) & (im3 < 1 - 1e-3)
    for c in range(3):  # jitter is per-channel affine
        s0 = safe[0, ..., c]  # fit only on unclipped pixels
        a, b = np.polyfit(images[0, ..., c][s0].ravel(),
                          im3[0, ..., c][s0].ravel(), 1)
        pred1 = np.clip(images[1, ..., c] * a + b, 0.0, 1.0)
        err = np.where(safe[1, ..., c], im3[1, ..., c] - pred1, 0.0)
        assert np.abs(err).max() < 1e-4

    crop_cfg = Config(random_crop_size=48, color_jitter_range=0.0)
    im4, m4 = _augment_with(crop_cfg, images.copy(), masks.copy())
    assert im4.shape == images.shape and m4.shape == masks.shape
    assert np.abs(im4 - images).max() > 1e-3      # geometry moved
    assert set(np.unique(m4)) <= {0.0, 1.0}       # masks stay binary


def test_temporal_beta_smooths_demo_actions():
    """--temporal_beta is the temporal-correlation coefficient of the
    random segment of temporal_random_robot demos (reference:
    locobot_table_env.py:383-396): small beta -> successive random
    actions nearly equal, beta=1 -> independent draws."""
    from robot_aware_control_tpu.envs.locobot_table import LocobotTableEnv

    def mean_step_change(beta):
        diffs = []
        for seed in (0, 1, 2):
            cfg = Config(demo_length=20, temporal_beta=beta, action_noise=0.0)
            env = LocobotTableEnv(cfg, seed=seed)
            acs = np.stack(env.generate_demo()["ac"])
            tail = acs[-6:, :2]  # the random segment is the demo tail
            diffs.append(np.abs(np.diff(tail, axis=0)).mean())
        return float(np.mean(diffs))

    assert mean_step_change(0.05) < 0.5 * mean_step_change(1.0)


def test_inpaint_eef_keeps_tip_pixels():
    """--inpaint_eef False keeps the end-effector tip visible when
    norobot_pixels_ob replaces robot pixels with background (reference:
    fetch_push.py inpaint_eef carve-out)."""

    def obs_with(inpaint):
        cfg = Config(norobot_pixels_ob=True, inpaint_eef=inpaint)
        env = ClutterPushEnv(cfg, seed=4)
        obs = env.reset()
        return np.asarray(obs["observation"], np.float32)

    # the two modes must disagree exactly where the tip carve-out is
    assert np.abs(obs_with(True) - obs_with(False)).max() > 1e-3
