"""Recurrent cells with explicit functional state.

The reference keeps LSTM hidden state as a mutable attribute on the module
and steps it from an external Python loop (reference:
src/prediction/models/lstm.py:31-55,216-257). Here every cell is a pure
function `cell(params, state, x) -> (y, new_state)` so entire videos run
inside a single `lax.scan` and CEM rollouts vmap/shard over candidates.

Cells:
  * conv_lstm_cell       4-gate conv LSTM (reference: lstm.py:109-149)
  * norm_conv_lstm_cell  GroupNorm-gated variant (reference: lstm.py:151-198)
  * conv_lstm            2-cell stack, kernels 5 then 3 (reference:
                         lstm.py:201-257)
  * gaussian_conv_lstm   + mu/logvar conv heads and reparameterization
                         (reference: lstm.py:260-286)
  * lstm / gaussian_lstm fully-connected variants (reference: lstm.py:10-106)

The 4-gate conv is a single fused convolution over cat(x, h) — one big MXU
op per cell per step; the gate nonlinearities fuse into it under XLA.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from robot_aware_control_tpu.ops import nn


# ---------------------------------------------------------------------------
# conv LSTM


def conv_lstm_cell_init(key, in_ch, hid_ch, ksize):
    return {"gates": nn.conv_init(key, ksize, ksize, in_ch + hid_ch, 4 * hid_ch)}


def conv_lstm_cell(params, state, x):
    """state = (h, c), NHWC. Gate order: input, forget, output, cell
    (reference: lstm.py:132-148)."""
    h, c = state
    g = nn.conv2d(params["gates"], jnp.concatenate([x, h.astype(x.dtype)], -1))
    i, f, o, gc = jnp.split(g, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    gc = jnp.tanh(gc)
    c_new = f * c.astype(x.dtype) + i * gc
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def group_norm(params, x, groups=16, eps=1e-5):
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(n, h, w, c)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


def group_norm_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def norm_conv_lstm_cell_init(key, in_ch, hid_ch, ksize):
    k1, k2 = jax.random.split(key)
    return {
        "ih": nn.conv_init(k1, ksize, ksize, in_ch, 4 * hid_ch),
        "hh": nn.conv_init(k2, ksize, ksize, hid_ch, 4 * hid_ch),
        "ih_gn": group_norm_init(4 * hid_ch),
        "hh_gn": group_norm_init(4 * hid_ch),
        "c_gn": group_norm_init(hid_ch),
    }


def norm_conv_lstm_cell(params, state, x):
    h, c = state
    g = group_norm(params["ih_gn"], nn.conv2d(params["ih"], x)) + group_norm(
        params["hh_gn"], nn.conv2d(params["hh"], h.astype(x.dtype))
    )
    i, f, o, gc = jnp.split(g, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c.astype(x.dtype) + jax.nn.sigmoid(i) * jnp.tanh(gc)
    c_new = group_norm(params["c_gn"], c_new)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def conv_lstm_init(key, in_ch, hid_ch, group_norm_cells=False):
    """2-cell stack: kernel 5 then kernel 3 (reference: lstm.py:206-212)."""
    k1, k2 = jax.random.split(key)
    init = norm_conv_lstm_cell_init if group_norm_cells else conv_lstm_cell_init
    return {
        "cell0": init(k1, in_ch, hid_ch, 5),
        "cell1": init(k2, hid_ch, hid_ch, 3),
    }


def conv_lstm_zero_state(batch, fh, fw, hid_ch, dtype=jnp.float32):
    z = lambda: jnp.zeros((batch, fh, fw, hid_ch), dtype)
    return ((z(), z()), (z(), z()))


def _fused_active(fused: bool, group_norm_cells: bool) -> bool:
    """Fused Pallas cells run only on real TPU (tests/CPU interpret the
    kernel explicitly); the GroupNorm variant keeps the XLA path."""
    if not fused or group_norm_cells:
        return False
    from robot_aware_control_tpu.ops import pallas_kernels as pk

    return pk.on_tpu()


def conv_lstm(params, state, x, group_norm_cells=False, fused=False):
    # int8-quantized gates (ops/quant.py) go through the XLA conv path —
    # the fused Pallas cell reads the float "w" layout
    if "w_q" in params["cell0"]["gates"]:
        fused = False
    if _fused_active(fused, group_norm_cells):
        from robot_aware_control_tpu.ops import pallas_kernels as pk

        s0, s1 = state
        h, s0 = pk.fused_conv_lstm_cell(params["cell0"], s0, x)
        h, s1 = pk.fused_conv_lstm_cell(params["cell1"], s1, h)
        return h, (s0, s1)
    cell = norm_conv_lstm_cell if group_norm_cells else conv_lstm_cell
    s0, s1 = state
    h, s0 = cell(params["cell0"], s0, x)
    h, s1 = cell(params["cell1"], s1, h)
    return h, (s0, s1)


def gaussian_conv_lstm_init(key, in_ch, hid_ch, out_ch, group_norm_cells=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lstm": conv_lstm_init(k1, in_ch, hid_ch, group_norm_cells),
        "mu": nn.conv_init(k2, 3, 3, hid_ch, out_ch),
        "logvar": nn.conv_init(k3, 3, 3, hid_ch, out_ch),
    }


def reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mu.shape, jnp.float32)
    return (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)


def gaussian_conv_lstm(params, state, x, rng, group_norm_cells=False,
                       fused=False):
    """Returns (z, mu, logvar, new_state)."""
    h, new_state = conv_lstm(params["lstm"], state, x, group_norm_cells, fused)
    mu = nn.conv2d(params["mu"], h)
    logvar = nn.conv2d(params["logvar"], h)
    z = reparameterize(rng, mu, logvar)
    return z, mu, logvar, new_state


# ---------------------------------------------------------------------------
# fully-connected LSTM (vector SVG models)


def lstm_cell_init(key, din, dhid):
    k1, k2 = jax.random.split(key)
    return {
        "ih": nn.linear_init(k1, din, 4 * dhid),
        "hh": nn.linear_init(k2, dhid, 4 * dhid),
    }


def lstm_cell(params, state, x):
    """torch nn.LSTMCell gate order: input, forget, cell, output."""
    h, c = state
    g = nn.linear(params["ih"], x) + nn.linear(params["hh"], h.astype(x.dtype))
    i, f, gc, o = jnp.split(g, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c.astype(x.dtype) + jax.nn.sigmoid(i) * jnp.tanh(gc)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def lstm_init(key, din, dout, dhid, n_layers):
    """Embed -> n LSTMCells -> Linear+Tanh head (reference: lstm.py:10-55)."""
    keys = jax.random.split(key, n_layers + 2)
    return {
        "embed": nn.linear_init(keys[0], din, dhid),
        "cells": [lstm_cell_init(keys[i + 1], dhid, dhid) for i in range(n_layers)],
        "out": nn.linear_init(keys[-1], dhid, dout),
    }


def lstm_zero_state(batch, dhid, n_layers, dtype=jnp.float32):
    z = lambda: jnp.zeros((batch, dhid), dtype)
    return tuple((z(), z()) for _ in range(n_layers))


def lstm_apply(params, state, x):
    h = nn.linear(params["embed"], x)
    new_state = []
    for cell_p, cell_s in zip(params["cells"], state):
        h, ns = lstm_cell(cell_p, cell_s, h)
        new_state.append(ns)
    out = nn.tanh(nn.linear(params["out"], h))
    return out, tuple(new_state)


def gaussian_lstm_init(key, din, dout, dhid, n_layers):
    keys = jax.random.split(key, n_layers + 3)
    return {
        "embed": nn.linear_init(keys[0], din, dhid),
        "cells": [lstm_cell_init(keys[i + 1], dhid, dhid) for i in range(n_layers)],
        "mu": nn.linear_init(keys[-2], dhid, dout),
        "logvar": nn.linear_init(keys[-1], dhid, dout),
    }


def gaussian_lstm_apply(params, state, x, rng):
    h = nn.linear(params["embed"], x)
    new_state = []
    for cell_p, cell_s in zip(params["cells"], state):
        h, ns = lstm_cell(cell_p, cell_s, h)
        new_state.append(ns)
    mu = nn.linear(params["mu"], h)
    logvar = nn.linear(params["logvar"], h)
    z = reparameterize(rng, mu, logvar)
    return z, mu, logvar, tuple(new_state)
