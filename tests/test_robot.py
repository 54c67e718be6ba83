"""Robot kinematics + mask renderer tests.

The key correctness property: FK is the inverse of IK (round-trip), and IK
agrees with an independent scalar oracle implementing the circle-intersection
construction (reference: src/env/robotics/masks/locobot_analytical_ik.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.robot import locobot_kinematics as lk
from robot_aware_control_tpu.robot.analytical import LocobotAnalyticalModel
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer


def _scalar_ik_oracle(pos, alpha):
    """Independent scalar construction of the 2R-in-plane IK."""
    x, y, z = [pos[i] - float(lk.BASE_OFFSET[i]) for i in range(3)]
    th0 = math.atan2(y, x)
    X, Y = math.hypot(x, y), z
    p3 = (X - lk.L4 * math.cos(alpha), Y - lk.L4 * math.sin(alpha))
    dx, dy = p3[0], p3[1] - lk.L1
    d = math.hypot(dx, dy)
    if d > lk.L2 + lk.L3 or d < abs(lk.L2 - lk.L3):
        return None
    a = (lk.L2 ** 2 - lk.L3 ** 2 + d * d) / (2 * d)
    h = math.sqrt(max(lk.L2 ** 2 - a * a, 0))
    xm, ym = a * dx / d, lk.L1 + a * dy / d
    sols = []
    for sx, sy in (
        (xm + h * dy / d, ym - h * dx / d),
        (xm - h * dy / d, ym + h * dx / d),
    ):
        a1 = math.atan2(sx, sy - lk.L1) - lk.ANGLE2_BIAS
        a2 = -math.atan2(p3[1] - sy, p3[0] - sx) - a1
        a3 = -alpha - a1 - a2
        sols.append((th0, a1, a2, a3))
    return sols


def test_ik_matches_scalar_oracle():
    targets = [
        (0.3, 0.0, 0.15),
        (0.35, 0.1, 0.2),
        (0.25, -0.15, 0.15),
        (0.4, 0.05, 0.18),
    ]
    alpha = -lk.DEFAULT_PITCH
    eef = jnp.asarray(targets)
    theta, valid = lk.ik(eef, alpha, jnp.zeros((len(targets), 4)))
    assert bool(valid.all())
    for i, t in enumerate(targets):
        sols = _scalar_ik_oracle(list(t), alpha)
        assert sols is not None
        got = np.asarray(theta[i])
        errs = [sum(abs(got[j] - s[j]) for j in range(4)) for s in sols]
        assert min(errs) < 1e-4, (got, sols)


def test_ik_fk_roundtrip():
    rng = np.random.RandomState(0)
    n = 32
    eef = np.stack([
        0.2 + 0.25 * rng.rand(n),
        -0.2 + 0.4 * rng.rand(n),
        0.12 + 0.15 * rng.rand(n),
    ], -1)
    alpha = -lk.DEFAULT_PITCH
    theta, valid = lk.ik(jnp.asarray(eef), alpha, jnp.zeros((n, 4)))
    pts = lk.fk_points(theta)
    recon = np.asarray(pts[..., 4, :])
    ok = np.asarray(valid)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(recon[ok], eef[ok], atol=1e-4)


def test_ik_infeasible_falls_back():
    cur = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    eef = jnp.asarray([[5.0, 5.0, 5.0]])  # unreachable
    theta, valid = lk.ik(eef, 0.0, cur)
    assert not bool(valid[0])
    np.testing.assert_allclose(np.asarray(theta[0]), np.asarray(cur[0]))


def test_integrate_planar_actions():
    start_eef = jnp.asarray([[0.3, 0.0, lk.PUSH_HEIGHT]])
    start_q = jnp.zeros((1, 5))
    actions = jnp.asarray([[[0.03, 0.0]], [[0.0, 0.02]]])  # (T=2, N=1, 2)
    states, qpos = lk.integrate_planar_actions(start_eef, start_q, actions)
    assert states.shape == (3, 1, 5)
    assert qpos.shape == (3, 1, 5)
    np.testing.assert_allclose(
        np.asarray(states[2, 0, :2]), [0.33, 0.02], atol=1e-6
    )
    # qpos reproduces eef via FK
    eef = lk.eef_position(qpos[1:])
    np.testing.assert_allclose(
        np.asarray(eef[..., :2]).squeeze(1),
        np.asarray(states[1:, 0, :2]), atol=1e-4,
    )


def test_capsule_renderer_masks():
    r = CapsuleMaskRenderer((48, 64))
    theta, valid = lk.ik(
        jnp.asarray([[0.3, 0.0, 0.15], [0.3, 0.15, 0.2]]),
        -lk.DEFAULT_PITCH, jnp.zeros((2, 4)),
    )
    q = jnp.concatenate([theta, jnp.zeros((2, 1))], -1)
    mask = r.render(q)
    assert mask.shape == (2, 48, 64, 1)
    frac = np.asarray(mask).mean(axis=(1, 2, 3))
    assert (frac > 0.005).all() and (frac < 0.5).all(), frac
    # different configurations give different masks
    assert not np.array_equal(np.asarray(mask[0]), np.asarray(mask[1]))
    # thick mask contains the thin one; equal only when the held-out tune
    # (benchmarks/mask_fidelity.py --tune) found THICK_SCALE == 1.0, i.e.
    # the capsules already cover the thick oracle's inflated gripper
    import robot_aware_control_tpu.robot.mask_renderer as mr
    r_thick = CapsuleMaskRenderer((48, 64), thick=True)
    mt = np.asarray(r_thick.render(q))
    m = np.asarray(mask)
    assert (mt >= m).all()
    if mr.THICK_SCALE > 1.0:
        assert mt.sum() > m.sum()


def test_analytical_model_predict_batch():
    cfg = Config(image_width=64, image_height=48, robot_joint_dim=5)
    model = LocobotAnalyticalModel(cfg)
    T, N = 3, 4
    states = np.zeros((T + 1, N, 5), np.float32)
    states[0, :, :3] = [0.5, 0.5, 0.2]  # normalized mid-workspace
    qpos = np.zeros((T + 1, N, 5), np.float32)
    actions = np.random.RandomState(0).uniform(-0.05, 0.05, (T, N, 2)).astype(np.float32)
    from robot_aware_control_tpu.data.norm import LOCOBOT_HIGH, LOCOBOT_LOW

    data = {
        "states": states,
        "qpos": qpos,
        "actions": actions,
        "low": np.tile(LOCOBOT_LOW, (N, 1)),
        "high": np.tile(LOCOBOT_HIGH, (N, 1)),
    }
    pred_states, pred_masks = model.predict_batch(data, thick=True)
    assert pred_states.shape == (T + 1, N, 5)
    assert pred_masks.shape == (T + 1, N, 48, 64, 1)
    assert np.isfinite(np.asarray(pred_states)).all()
    assert np.asarray(pred_masks).sum() > 0
    # states stay normalized inside [0,1] for feasible moves
    assert np.asarray(pred_states)[..., :3].min() > -0.5
    assert np.asarray(pred_states)[..., :3].max() < 1.5
