"""Locobot closed-form kinematics in pure JAX (batched, branchless).

The reference computes 4-DOF IK per sample in scalar Python with early
returns (reference: src/env/robotics/masks/locobot_analytical_ik.py:28-196)
and calls it serially inside planner/trainer loops. Here both IK and FK are
vectorized jnp functions usable under jit/vmap/scan so the entire robot
trajectory for all CEM candidates computes in one fused device program.

Geometry (reference: locobot_analytical_ik.py:29-57):
  base_offset  /base_link -> /arm_base_link
  l1  arm base -> elbow column (vertical)
  l2  shoulder link with a fixed angular bias atan2(0.05, 0.2)
  l3  forearm, l4 wrist->gripper; `alpha` is the gripper pitch vs ground.

Branchless solution selection reproduces the reference's rules
(locobot_analytical_ik.py:140-196): when both elbow solutions are within
joint limits choose the one nearest the current configuration, else
whichever is valid; infeasible targets fall back to the current
configuration with valid=False.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

BASE_OFFSET = jnp.array([0.0973, 0.0, 0.097363])
L1 = 0.0655 + 0.04125
L2 = math.sqrt(0.05 ** 2 + 0.2 ** 2)
ANGLE2_BIAS = math.atan2(0.05, 0.2)
L3 = 0.2002
L3_MODIFIED = 0.3002  # longer forearm variant (reference: :271-274)
L4 = 0.063

JOINT_LIMIT = math.pi

# eef conventions for planar pushing (reference:
# src/dataset/locobot/locobot_model.py:15-17)
PUSH_HEIGHT = 0.15
DEFAULT_PITCH = 1.3
DEFAULT_ROLL = 0.0


def ik(eef_pos, alpha, cur_config, l3: float = L3):
    """Batched IK. eef_pos (..., 3) world target, alpha scalar or (...,),
    cur_config (..., 4) current joint angles for nearest-solution selection.

    Returns (theta (..., 4), valid (...,) bool).
    """
    p = eef_pos - BASE_OFFSET
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta0 = jnp.arctan2(y, x)

    X = jnp.sqrt(x * x + y * y)
    Y = z
    alpha = jnp.broadcast_to(jnp.asarray(alpha), X.shape)
    p3x = X - L4 * jnp.cos(alpha)
    p3y = Y - L4 * jnp.sin(alpha)

    # circles: (0, L1, L2) and (p3, l3) — intersection in the arm plane
    dx, dy = p3x, p3y - L1
    d2 = dx * dx + dy * dy
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    geom_ok = (d <= (L2 + l3)) & (d >= jnp.abs(L2 - l3)) & (d > 1e-9)

    a = (L2 * L2 - l3 * l3 + d2) / (2.0 * d)
    h = jnp.sqrt(jnp.maximum(L2 * L2 - a * a, 0.0))
    xm = a * dx / d
    ym = L1 + a * dy / d
    # two elbow candidates
    ex = jnp.stack([xm + h * dy / d, xm - h * dy / d], -1)
    ey = jnp.stack([ym - h * dx / d, ym + h * dx / d], -1)

    ang1 = jnp.arctan2(ex, ey - L1) - ANGLE2_BIAS
    ang2 = -jnp.arctan2(p3y[..., None] - ey, p3x[..., None] - ex) - ang1
    ang3 = -alpha[..., None] - ang1 - ang2

    in_lim = lambda t: jnp.abs(t) < JOINT_LIMIT
    valid = in_lim(ang1) & in_lim(ang2) & in_lim(ang3) & geom_ok[..., None]

    cur = cur_config
    diff = (
        jnp.abs(ang1 - cur[..., 1:2])
        + jnp.abs(ang2 - cur[..., 2:3])
        + jnp.abs(ang3 - cur[..., 3:4])
    )
    # invalid candidates get +inf distance so argmin picks a valid one
    score = jnp.where(valid, diff, jnp.inf)
    pick = jnp.argmin(score, axis=-1)
    take = lambda c: jnp.take_along_axis(c, pick[..., None], -1)[..., 0]
    theta = jnp.stack([theta0, take(ang1), take(ang2), take(ang3)], -1)
    any_valid = valid.any(-1)
    theta = jnp.where(any_valid[..., None], theta, cur)
    return theta, any_valid


def fk_points(qpos, l3: float = L3):
    """Forward kinematics to the arm's joint positions.

    qpos (..., >=4): [yaw, shoulder, elbow, wrist]. Returns (..., 5, 3)
    world points: arm base, shoulder top, elbow, wrist, gripper tip.
    Inverse of `ik` (tested against it)."""
    t0, t1, t2, t3 = qpos[..., 0], qpos[..., 1], qpos[..., 2], qpos[..., 3]
    # in-plane chain
    jx0 = jnp.zeros_like(t1)
    jy0 = jnp.zeros_like(t1)
    jx1 = jnp.zeros_like(t1)
    jy1 = jnp.full_like(t1, L1)
    ex = jx1 + L2 * jnp.sin(t1 + ANGLE2_BIAS)
    ey = jy1 + L2 * jnp.cos(t1 + ANGLE2_BIAS)
    phi3 = -(t1 + t2)
    wx = ex + l3 * jnp.cos(phi3)
    wy = ey + l3 * jnp.sin(phi3)
    phi4 = -(t1 + t2 + t3)
    gx = wx + L4 * jnp.cos(phi4)
    gy = wy + L4 * jnp.sin(phi4)

    X = jnp.stack([jx0, jx1, ex, wx, gx], -1)  # radial
    Ypts = jnp.stack([jy0, jy1, ey, wy, gy], -1)  # height
    c0, s0 = jnp.cos(t0)[..., None], jnp.sin(t0)[..., None]
    pts = jnp.stack([X * c0, X * s0, Ypts], -1)  # (..., 5, 3)
    return pts + BASE_OFFSET


def eef_position(qpos, l3: float = L3):
    return fk_points(qpos, l3)[..., 4, :]


def integrate_planar_actions(start_eef, start_qpos, actions,
                             push_height: float = PUSH_HEIGHT,
                             pitch: float = DEFAULT_PITCH,
                             roll: float = DEFAULT_ROLL,
                             l3: float = L3):
    """Roll a planar action sequence through eef integration + IK
    (reference: src/dataset/locobot/locobot_model.py:50-102).

    start_eef (..., >=2) raw world xy(z); start_qpos (..., 5);
    actions (T, ..., >=2) planar displacements.

    Returns (states (T+1, ..., 5), qpos (T+1, ..., 5)) where states rows are
    [x, y, z, 0, 0] raw world eef poses.
    """
    import jax

    def step(carry, act):
        eef, q = carry
        nxt = jnp.stack(
            [eef[..., 0] + act[..., 0], eef[..., 1] + act[..., 1],
             jnp.full_like(eef[..., 0], push_height)], -1
        )
        theta, _ = ik(nxt, -pitch, q[..., :4], l3)
        q_new = jnp.concatenate(
            [theta, jnp.full_like(theta[..., :1], roll)], -1
        )
        return (nxt, q_new), (nxt, q_new)

    eef0 = jnp.stack(
        [start_eef[..., 0], start_eef[..., 1],
         jnp.broadcast_to(
             start_eef[..., 2] if start_eef.shape[-1] > 2 else push_height,
             start_eef[..., 0].shape,
         )], -1
    )
    (_, _), (eefs, qs) = jax.lax.scan(step, (eef0, start_qpos), actions)
    eefs = jnp.concatenate([eef0[None], eefs], 0)
    qs = jnp.concatenate([start_qpos[None], qs], 0)
    pad = jnp.zeros(eefs.shape[:-1] + (2,), eefs.dtype)
    states = jnp.concatenate([eefs, pad], -1)
    return states, qs


# pick-env workspace bounds (reference: locobot_pick_env eef clip — same
# mocap x0.05 + clip scheme as the table env, envs/base.py WS_LOW/HIGH)
PICK_WS_LOW = jnp.array([0.015, -0.3, 0.1])
PICK_WS_HIGH = jnp.array([0.55, 0.3, 0.4])


def integrate_pick_actions(start_eef, start_qpos, actions,
                           action_scale: float = 0.05,
                           pitch: float = DEFAULT_PITCH,
                           roll: float = DEFAULT_ROLL,
                           l3: float = L3):
    """3-D eef integration for pick rollouts (reference pick sampler steps
    MuJoCo per candidate per step to track the eef —
    src/cem/pick/trajectory_sampler.py:253-266; here the env's eef update
    rule — action[:3]*0.05, clipped to the workspace
    (locobot_pick_env.py:163-238) — plus full 3-D analytic IK runs fused
    on device).

    start_eef (..., >=3) raw world xyz; start_qpos (..., 5);
    actions (T, ..., >=3) in env units.
    Returns (states (T+1, ..., 5) rows [x, y, z, 0, 0], qpos (T+1, ..., 5)).
    """
    import jax

    def step(carry, act):
        eef, q = carry
        nxt = jnp.clip(
            eef + act[..., :3] * action_scale, PICK_WS_LOW, PICK_WS_HIGH
        )
        theta, _ = ik(nxt, -pitch, q[..., :4], l3)
        q_new = jnp.concatenate(
            [theta, jnp.full_like(theta[..., :1], roll)], -1
        )
        return (nxt, q_new), (nxt, q_new)

    eef0 = start_eef[..., :3]
    (_, _), (eefs, qs) = jax.lax.scan(step, (eef0, start_qpos), actions)
    eefs = jnp.concatenate([eef0[None], eefs], 0)
    qs = jnp.concatenate([start_qpos[None], qs], 0)
    pad = jnp.zeros(eefs.shape[:-1] + (2,), eefs.dtype)
    return jnp.concatenate([eefs, pad], -1), qs
