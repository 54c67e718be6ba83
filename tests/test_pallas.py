"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_aware_control_tpu.ops import lstm as L
from robot_aware_control_tpu.ops.pallas_kernels import (
    _fused_cell_fwd,
    fused_conv_lstm_cell,
)
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


@pytest.mark.parametrize("ksize,cin,ch,batch", [
    (5, 16, 8, 3),   # cell0-like: x and h channels differ, odd batch (pad)
    (3, 8, 8, 4),    # cell1-like
])
def test_fused_conv_lstm_cell_matches_xla(rng, ksize, cin, ch, batch):
    """Fused kernel == ops.lstm.conv_lstm_cell (f32, interpret mode)."""
    key = jax.random.PRNGKey(0)
    params = L.conv_lstm_cell_init(key, cin, ch, ksize)
    x = jnp.asarray(rng.randn(batch, 6, 8, cin).astype(np.float32))
    h = jnp.asarray(rng.randn(batch, 6, 8, ch).astype(np.float32))
    c = jnp.asarray(rng.randn(batch, 6, 8, ch).astype(np.float32))
    y_ref, (h_ref, c_ref) = L.conv_lstm_cell(params, (h, c), x)
    y_pl, (h_pl, c_pl) = fused_conv_lstm_cell(params, (h, c), x,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pl),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_pl),
                               rtol=1e-5, atol=1e-5)
    assert y_pl.shape == (batch, 6, 8, ch)


def test_fused_cell_bf16_close(rng):
    """bf16 inputs: fused kernel accumulates gates in f32; stays within
    bf16 tolerance of the XLA cell."""
    key = jax.random.PRNGKey(1)
    params = L.conv_lstm_cell_init(key, 8, 8, 3)
    x = jnp.asarray(rng.randn(2, 6, 8, 8), jnp.bfloat16)
    h = jnp.asarray(rng.randn(2, 6, 8, 8), jnp.bfloat16)
    c = jnp.asarray(rng.randn(2, 6, 8, 8), jnp.bfloat16)
    y_ref, _ = L.conv_lstm_cell(params, (h, c), x)
    y_pl, _ = fused_conv_lstm_cell(params, (h, c), x, interpret=True)
    assert y_pl.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_pl, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_cell_hct_tiling(rng):
    """hidden channels > 128 exercise the channel-tile grid axis."""
    key = jax.random.PRNGKey(2)
    params = L.conv_lstm_cell_init(key, 8, 256, 3)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    h = jnp.asarray(rng.randn(2, 4, 4, 256).astype(np.float32))
    c = jnp.asarray(rng.randn(2, 4, 4, 256).astype(np.float32))
    y_ref, _ = L.conv_lstm_cell(params, (h, c), x)
    w = params["gates"]["w"]
    b = params["gates"]["b"]
    h_pl, c_pl = _fused_cell_fwd(x, h, c, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(h_pl),
                               rtol=1e-5, atol=1e-5)
