"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer


def test_capsule_render_pallas_matches_jnp(rng):
    r = CapsuleMaskRenderer((48, 64))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 7, 5)).astype(np.float32))
    m_jnp = np.asarray(r.render(q))
    m_pl = np.asarray(r.render_pallas(q, interpret=True))
    np.testing.assert_array_equal(m_jnp, m_pl)
    assert m_pl.shape == (3, 7, 48, 64, 1)


def test_capsule_render_pallas_nonmultiple_block(rng):
    """M not a multiple of BLOCK_MASKS exercises the padding path."""
    r = CapsuleMaskRenderer((48, 64))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (5, 5)).astype(np.float32))
    m_jnp = np.asarray(r.render(q))
    m_pl = np.asarray(r.render_pallas(q, interpret=True))
    np.testing.assert_array_equal(m_jnp, m_pl)
