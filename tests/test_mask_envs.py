"""Per-robot mask env tests (reference: src/env/robotics/masks/*)."""

import numpy as np
import pytest

from robot_aware_control_tpu.robot.kinematic_chain import (
    CHAINS,
    ChainMaskEnv,
    get_mask_env,
)


@pytest.mark.parametrize("robot", sorted(CHAINS))
def test_chain_fk_and_mask(robot):
    env = ChainMaskEnv(robot)
    q = np.zeros((3, env.chain.dof), np.float32)
    q[1] = np.linspace(0.2, 0.6, env.chain.dof)
    q[2] = np.linspace(-0.6, -0.1, env.chain.dof)
    masks = env.generate_masks(q)
    assert masks.shape == (3, 48, 64, 1)
    assert masks.max() <= 1.0 and masks.min() >= 0.0
    # different configurations give different silhouettes
    assert not np.array_equal(masks[0], masks[1])


def test_fk_points_shape():
    chain = CHAINS["sawyer"]
    pts = np.asarray(chain.fk_points(np.zeros((2, 7), np.float32)))
    assert pts.shape == (2, 9, 3)  # base + 7 joints + tip
    # chain extends upward from its base
    assert pts[0, -1, 2] > pts[0, 0, 2]


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
    rng = np.random.RandomState(1)
    q = rng.uniform(-0.7, 0.7, (8, chain.dof)).astype(np.float32)
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


def test_thick_masks_superset():
    thin = ChainMaskEnv("franka", thick=False)
    thick = ChainMaskEnv("franka", thick=True)
    q = np.full((1, 7), 0.2, np.float32)
    m1 = thin.generate_masks(q)
    m2 = thick.generate_masks(q)
    assert m2.sum() >= m1.sum()
    assert np.all(m2[m1 > 0.5] > 0.5)  # thick contains thin
