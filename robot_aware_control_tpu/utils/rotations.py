"""Rotation conversions (euler <-> quat <-> mat), batched jnp.

Reference parity: src/env/robotics/rotations.py (euler/quat/mat helpers used
by mocap control and camera math) and the quaternion utilities in
src/env/robotics/controllers/transform_utils. Conventions match MuJoCo:
wxyz quaternions, extrinsic XYZ euler angles.
"""

from __future__ import annotations

import jax.numpy as jnp


def euler2mat(euler):
    """(..., 3) extrinsic XYZ euler -> (..., 3, 3)."""
    ai, aj, ak = euler[..., 0], euler[..., 1], euler[..., 2]
    si, ci = jnp.sin(ai), jnp.cos(ai)
    sj, cj = jnp.sin(aj), jnp.cos(aj)
    sk, ck = jnp.sin(ak), jnp.cos(ak)
    # R = Rz(ak) @ Ry(aj) @ Rx(ai)
    r00 = cj * ck
    r01 = si * sj * ck - ci * sk
    r02 = ci * sj * ck + si * sk
    r10 = cj * sk
    r11 = si * sj * sk + ci * ck
    r12 = ci * sj * sk - si * ck
    r20 = -sj
    r21 = si * cj
    r22 = ci * cj
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], -2)


def mat2euler(mat):
    """(..., 3, 3) -> (..., 3) extrinsic XYZ euler."""
    sy = jnp.sqrt(mat[..., 0, 0] ** 2 + mat[..., 1, 0] ** 2)
    singular = sy < 1e-6
    ai = jnp.where(singular,
                   jnp.arctan2(-mat[..., 1, 2], mat[..., 1, 1]),
                   jnp.arctan2(mat[..., 2, 1], mat[..., 2, 2]))
    aj = jnp.arctan2(-mat[..., 2, 0], sy)
    ak = jnp.where(singular, 0.0, jnp.arctan2(mat[..., 1, 0], mat[..., 0, 0]))
    return jnp.stack([ai, aj, ak], -1)


def euler2quat(euler):
    return mat2quat(euler2mat(euler))


def quat2euler(quat):
    return mat2euler(quat2mat(quat))


def quat2mat(quat):
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def mat2quat(mat):
    """(..., 3, 3) -> (..., 4) wxyz (stable branchless Shepperd)."""
    m = mat
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(1 + t, 1e-12)) / 2
    x = jnp.sqrt(jnp.maximum(1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
                             1e-12)) / 2
    y = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
                             1e-12)) / 2
    z = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
                             1e-12)) / 2
    x = x * jnp.sign(m[..., 2, 1] - m[..., 1, 2])
    y = y * jnp.sign(m[..., 0, 2] - m[..., 2, 0])
    z = z * jnp.sign(m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([w, x, y, z], -1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """(..., 4) wxyz Hamilton product."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], -1)
    return quat_mul(quat_mul(q, qv), quat_conjugate(q))[..., 1:]
