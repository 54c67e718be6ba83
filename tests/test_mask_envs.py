"""Per-robot mask env tests (reference: src/env/robotics/masks/*)."""

import numpy as np
import pytest

from robot_aware_control_tpu.robot.kinematic_chain import (
    CHAINS,
    ChainMaskEnv,
    get_mask_env,
)


def _mid_range_qpos(chain, n, scale=0.4, seed=1):
    lo, hi = chain.jnt_range[:, 0], chain.jnt_range[:, 1]
    mid, span = 0.5 * (lo + hi), 0.5 * (hi - lo)
    rng = np.random.RandomState(seed)
    return (mid + rng.uniform(-scale, scale, (n, chain.dof)) * span).astype(
        np.float32
    )


def _workspace_targets(env, n=2, z=None, spread=0.06):
    """Points near where the calibrated camera actually looks: intersect
    the optical axis with a horizontal plane at the arm's working height."""
    from robot_aware_control_tpu.data import calibration as calib
    from robot_aware_control_tpu.robot.kinematic_chain import DEFAULT_CAMERA

    key = DEFAULT_CAMERA[env.chain.name]
    c2w = calib.get_camera_to_world(key)
    o, d = c2w[:3, 3], c2w[:3, 2]
    if z is None:
        z = float(env.chain.anchors[0, 2]) + 0.05
    t = (z - o[2]) / d[2] if abs(d[2]) > 1e-6 else 1.0
    center = o + np.clip(t, 0.2, 3.0) * d
    offs = np.linspace(-spread, spread, n)
    return np.stack([center + np.array([dx, dx, 0.0]) for dx in offs])


@pytest.mark.parametrize("robot", sorted(CHAINS))
def test_chain_fk_and_mask(robot):
    import jax.numpy as jnp

    env = ChainMaskEnv(robot)
    targets = _workspace_targets(env, n=2)
    q, _ = env.chain.ik(jnp.asarray(targets, np.float32))
    masks = env.generate_masks(np.asarray(q))
    assert masks.shape == (2, 48, 64, 1)
    assert masks.max() <= 1.0 and masks.min() >= 0.0
    # the arm is visible from its calibrated viewpoint and different
    # configurations give different silhouettes
    assert masks.sum() > 0
    assert not np.array_equal(masks[0], masks[1])


def test_fk_points_shape():
    chain = CHAINS["sawyer"]
    pts = np.asarray(chain.fk_points(np.zeros((2, 7), np.float32)))
    assert pts.shape == (2, 9, 3)  # base + 7 joints + tip
    # zero pose measured from the reference MJCF: the arm reaches ~1.05 m
    # out from the pedestal (sawyer/robot.xml)
    assert 0.8 < np.linalg.norm(pts[0, -1] - pts[0, 0]) < 1.4
    # FK responds to joint motion
    pts2 = np.asarray(chain.fk_points(np.full((2, 7), 0.3, np.float32)))
    assert np.abs(pts2 - pts).max() > 0.05


def test_locobot_dispatch():
    env = get_mask_env("locobot")
    m = env.generate_masks(np.zeros((1, 5), np.float32))
    assert m.shape == (1, 48, 64, 1)


@pytest.mark.parametrize("robot", ["sawyer", "franka", "wx250s"])
def test_chain_ik_reaches_fk_targets(robot):
    """Batched DLS IK recovers reachable targets for every chain arm
    (replaces the reference's per-robot PyBullet IK controllers,
    src/env/robotics/controllers/*.py)."""
    import jax.numpy as jnp

    chain = CHAINS[robot]
    q = _mid_range_qpos(chain, 8)
    targets = np.asarray(chain.fk_points(jnp.asarray(q)))[:, -1]
    qs, valid = chain.ik(jnp.asarray(targets))
    assert bool(np.all(np.asarray(valid))), f"{robot} IK failed"
    tips = np.asarray(chain.fk_points(qs))[:, -1]
    assert np.linalg.norm(tips - targets, axis=-1).max() < 5e-3


def test_chain_analytical_model_trajectory():
    """ChainAnalyticalModel: planar integration + chain IK + masks."""
    import jax.numpy as jnp

    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.robot.analytical import ChainAnalyticalModel

    cfg = Config()
    m = ChainAnalyticalModel(cfg, "wx250s", push_height=0.15)
    start_eef = np.asarray(
        m.chain.fk_points(jnp.full((m.chain.dof,), 0.3)))[-1]
    acts = np.full((3, 2, 2), 0.01, np.float32)
    states, qpos, masks = m.predict_trajectory(
        start_eef, np.full(m.chain.dof, 0.3, np.float32), acts
    )
    assert states.shape == (4, 2, 3)
    assert qpos.shape == (4, 2, m.chain.dof)
    assert masks.shape == (4, 2, 48, 64, 1)
    # the eef advanced by the commanded displacement
    np.testing.assert_allclose(
        np.asarray(states[-1, 0, :2] - states[0, 0, :2]), [0.03, 0.03],
        atol=1e-5,
    )


def test_measured_chain_data_consistency():
    """The baked chain data (extracted from the reference MJCFs by
    benchmarks/extract_chain_geometry.py) is internally consistent and
    every default viewpoint is a *measured* calibration, not synthetic."""
    from robot_aware_control_tpu.data import calibration as calib
    from robot_aware_control_tpu.robot.kinematic_chain import (
        CHAIN_DATA,
        DEFAULT_CAMERA,
    )

    for robot, d in CHAIN_DATA.items():
        J = len(d["axes"])
        assert d["anchors"].shape == (J, 3)
        np.testing.assert_allclose(
            np.linalg.norm(d["axes"], axis=-1), 1.0, atol=1e-5
        )
        assert np.all(d["jnt_range"][:, 0] < d["jnt_range"][:, 1])
        att = d["caps_attach"]
        assert att.min() >= -1 and att.max() < J
        assert len(d["caps_a"]) == len(d["caps_b"]) == len(d["caps_r"])
        assert np.all(d["caps_r"] > 0)
        key = DEFAULT_CAMERA[robot]
        assert key in calib._MEASURED_CAMERA_TO_WORLD, key


def test_static_capsules_do_not_move():
    """Pedestal/torso geoms (attach=-1) stay put while the arm moves."""
    env = ChainMaskEnv("baxter")
    import jax.numpy as jnp

    q = _mid_range_qpos(env.chain, 2)
    a, b = env._capsule_endpoints(jnp.asarray(q))
    static = env._attach < 0
    assert static.any()
    np.testing.assert_allclose(
        np.asarray(a)[0][static], np.asarray(a)[1][static], atol=1e-6
    )
    moving = ~static
    assert np.abs(np.asarray(a)[0][moving] - np.asarray(a)[1][moving]).max() > 1e-3


def test_occluder_data_consistency():
    """Occluder capsules (geoms the reference's mask filter excludes but
    whose z-buffer presence hides mask geoms, base_mask_env.py:31-37)
    are measured geometry with the same attach invariants as the mask
    capsules."""
    from robot_aware_control_tpu.robot.kinematic_chain import CHAIN_DATA

    for robot, d in CHAIN_DATA.items():
        n = len(d.get("occ_r", []))
        if n == 0:
            continue
        J = len(d["axes"])
        assert d["occ_attach"].shape == (n,)
        assert d["occ_a"].shape == (n, 3)
        assert d["occ_b"].shape == (n, 3)
        assert d["occ_attach"].min() >= -1 and d["occ_attach"].max() < J
        # the mesh fitter yields r=0 for flat geoms; the env filters them
        assert np.all(d["occ_r"] >= 0)
        env = ChainMaskEnv(
            "baxter" if robot == "baxter_right" else robot,
            arm="right" if robot == "baxter_right" else "left",
        )
        if env.has_occluders:
            assert float(np.asarray(env._occ_r).min()) > 0


def test_occlusion_depth_test_semantics():
    """fetch ships with a tuned occluder scale: the occluded mask is a
    subset of the unoccluded one, an all-far depth map disables
    occlusion exactly, and an everywhere-near map kills every pixel —
    the z-buffer semantics of the reference's segmentation render
    (fetch_mask_env.py:120-131)."""
    import jax.numpy as jnp

    from robot_aware_control_tpu.robot.kinematic_chain import (
        TUNED_OCC_SCALE,
    )

    assert TUNED_OCC_SCALE.get("fetch", 0.0) > 0.0
    env = ChainMaskEnv("fetch")
    assert env.occlude and env.has_occluders
    # fetch's mask is gripper-only and most joint draws hide it from the
    # calibrated camera; this seeded batch contains poses with a visible
    # gripper AND at least one where the arm partially occludes it
    q = jnp.asarray(_mid_range_qpos(env.chain, 64, scale=0.6, seed=0))
    far = jnp.full((64, env.h, env.w), env._INF_DEPTH, jnp.float32)
    m_occ = np.asarray(env.render_with(q, env.radii, env.ext))[..., 0]
    m_off = np.asarray(env.render_with(q, env.radii, env.ext, far))[..., 0]
    assert m_off.sum() > 0
    assert np.all(m_off[m_occ > 0.5] > 0.5)  # occluded subset of plain
    assert m_occ.sum() < m_off.sum()  # the arm does occlude the gripper
    # scale<=0 -> all-far map -> identical to occlusion off
    d0 = env.occluder_depth(q, scale=0.0)
    m0 = np.asarray(env.render_with(q, env.radii, env.ext, d0))[..., 0]
    np.testing.assert_array_equal(m0, m_off)
    # shipped scale is what occluder_depth(None) uses
    d_ship = env.occluder_depth(q)
    d_abs = env.occluder_depth(q, scale=TUNED_OCC_SCALE["fetch"])
    np.testing.assert_allclose(np.asarray(d_ship), np.asarray(d_abs))
    # everything-in-front occluder removes the whole silhouette (mask
    # surface depth z-r can be ~0 for near-camera capsules, so the map
    # must be strictly below any reachable surface depth)
    near = jnp.full((64, env.h, env.w), -env._INF_DEPTH, jnp.float32)
    m_all = np.asarray(env.render_with(q, env.radii, env.ext, near))[..., 0]
    assert m_all.sum() == 0


def test_untuned_robots_render_unoccluded():
    """Occlusion is opt-in per robot: arms without a tuned occluder
    scale render exactly as before the occluder geometry existed."""
    env_def = ChainMaskEnv("sawyer")
    env_off = ChainMaskEnv("sawyer", occlude=False)
    assert env_def.has_occluders and not env_def.occlude
    q = _mid_range_qpos(env_def.chain, 3)
    np.testing.assert_array_equal(
        env_def.generate_masks(q), env_off.generate_masks(q)
    )


def test_thick_masks_superset():
    thin = ChainMaskEnv("franka", thick=False)
    thick = ChainMaskEnv("franka", thick=True)
    q = np.full((1, 7), 0.2, np.float32)
    m1 = thin.generate_masks(q)
    m2 = thick.generate_masks(q)
    assert m2.sum() >= m1.sum()
    assert np.all(m2[m1 > 0.5] > 0.5)  # thick contains thin
