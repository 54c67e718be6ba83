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


def test_thick_masks_superset():
    thin = ChainMaskEnv("franka", thick=False)
    thick = ChainMaskEnv("franka", thick=True)
    q = np.full((1, 7), 0.2, np.float32)
    m1 = thin.generate_masks(q)
    m2 = thick.generate_masks(q)
    assert m2.sum() >= m1.sum()
    assert np.all(m2[m1 > 0.5] > 0.5)  # thick contains thin
