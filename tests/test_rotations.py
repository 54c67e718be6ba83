"""Rotation utility tests (reference: src/env/robotics/rotations.py)."""

import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.utils import rotations as R


def test_euler_mat_roundtrip(rng):
    e = rng.uniform(-1.2, 1.2, (10, 3)).astype(np.float32)
    m = R.euler2mat(jnp.asarray(e))
    e2 = np.asarray(R.mat2euler(m))
    np.testing.assert_allclose(e, e2, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    e = rng.uniform(-1.2, 1.2, (10, 3)).astype(np.float32)
    q = R.euler2quat(jnp.asarray(e))
    m1 = np.asarray(R.quat2mat(q))
    m2 = np.asarray(R.euler2mat(jnp.asarray(e)))
    np.testing.assert_allclose(m1, m2, atol=1e-5)


def test_rotation_matrices_orthonormal(rng):
    e = rng.uniform(-3, 3, (5, 3)).astype(np.float32)
    m = np.asarray(R.euler2mat(jnp.asarray(e)))
    eye = np.broadcast_to(np.eye(3), m.shape)
    np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    e = rng.uniform(-1.2, 1.2, (5, 3)).astype(np.float32)
    v = rng.randn(5, 3).astype(np.float32)
    q = R.euler2quat(jnp.asarray(e))
    m = R.euler2mat(jnp.asarray(e))
    v1 = np.asarray(R.quat_rotate(q, jnp.asarray(v)))
    v2 = np.einsum("bij,bj->bi", np.asarray(m), v)
    np.testing.assert_allclose(v1, v2, atol=1e-4)


def test_quat_mul_identity(rng):
    q = R.euler2quat(jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32)))
    ident = jnp.asarray([1.0, 0, 0, 0])
    out = np.asarray(R.quat_mul(q, jnp.broadcast_to(ident, q.shape)))
    np.testing.assert_allclose(out, np.asarray(q), atol=1e-6)
