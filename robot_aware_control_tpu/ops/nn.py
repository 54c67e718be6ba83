"""Functional NN layer library (NHWC, explicit param/state pytrees).

TPU-first design notes:
  * NHWC layout throughout — XLA's native TPU convolution layout.
  * Layers are pure functions: `apply(params, x) -> y` or, for BatchNorm,
    `apply(params, state, x, train) -> (y, new_state)`. Recurrent/normalizer
    state is threaded explicitly so whole videos run under `lax.scan`.
  * Weight init replicates the reference's SVG init: conv/linear weights
    ~ N(0, 0.02), biases 0, BatchNorm scale ~ N(1, 0.02)
    (reference: src/prediction/models/base.py:26-35).
  * BatchNorm matches torch.nn.BatchNorm2d semantics (eps 1e-5, momentum
    0.1, train mode normalizes by batch stats and updates running stats)
    (reference: src/prediction/models/vgg_64.py:8-18 uses BatchNorm2d).

Params are plain nested dicts of jnp arrays — trivially compatible with
optax, orbax, jax.tree_util, and sharding annotations.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# initializers


def _normal(key, shape, std=0.02, mean=0.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype=dtype)


def conv_init(key, kh, kw, cin, cout, bias=True, std=0.02):
    p = {"w": _normal(key, (kh, kw, cin, cout), std=std)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def linear_init(key, din, dout, bias=True, std=0.02):
    p = {"w": _normal(key, (din, dout), std=std)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def batchnorm_init(key, c):
    params = {"scale": _normal(key, (c,), std=0.02, mean=1.0), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


# ---------------------------------------------------------------------------
# primitives


def _conv2d_int8(p, x, stride, padding):
    """int8 inference conv: per-output-channel weight scales (`w_scale`),
    dynamic per-tensor symmetric activation quantization, int32 MXU
    accumulation. Forward-only (round has no VJP) — planning path, see
    ops/quant.py. The v5e MXU's int8 throughput is 2x its bf16 peak."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    dn = lax.conv_dimension_numbers(
        x_q.shape, p["w_q"].shape, ("NHWC", "HWIO", "NHWC")
    )
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = lax.conv_general_dilated(
        x_q, p["w_q"], window_strides=strides, padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d(p, x, stride=1, padding="SAME"):
    """2-D convolution, NHWC x HWIO -> NHWC.

    Dispatches on the param structure: a dict carrying `w_q`/`w_scale`
    (produced by ops/quant.quantize_conv_tree) takes the int8 path.

    No explicit preferred_element_type on the float path: the TPU MXU
    accumulates bf16 operands in float32 internally regardless of the
    requested output dtype, and an f32 output + cast-back breaks the conv
    VJP's dtype matching under bfloat16 training."""
    if "w_q" in p:
        return _conv2d_int8(p, x, stride, padding)
    dn = lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=dn,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def linear(p, x):
    # see conv2d: MXU accumulates in f32 internally; explicit f32 output +
    # cast-back breaks dot VJP dtype matching under bf16
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batchnorm(params, state, x, train: bool):
    """BatchNorm over N,H,W for NHWC input. Returns (y, new_state)."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        # torch tracks the *unbiased* variance in running stats
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + BN_EPS) * params["scale"]
    y = (xf - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def max_pool2(x):
    """2x2 max pool, stride 2 (torch MaxPool2d(2,2))."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def upsample_nearest2(x):
    """Nearest-neighbour 2x upsample (torch UpsamplingNearest2d)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# vgg building block: conv3x3(no bias) + BN + LeakyReLU(0.2)
# (reference: src/prediction/models/vgg_64.py:8-18)


def vgg_layer_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    bn_p, bn_s = batchnorm_init(k2, cout)
    return (
        {"conv": conv_init(k1, 3, 3, cin, cout, bias=False), "bn": bn_p},
        {"bn": bn_s},
    )


def vgg_layer(params, state, x, train: bool):
    y = conv2d(params["conv"], x)
    y, bn_s = batchnorm(params["bn"], state["bn"], y, train)
    return leaky_relu(y), {"bn": bn_s}


def vgg_stack_init(key, channels: Sequence[int]):
    """A chain of vgg_layers: channels = [cin, c1, c2, ...]."""
    keys = jax.random.split(key, len(channels) - 1)
    ps, ss = [], []
    for i, k in enumerate(keys):
        p, s = vgg_layer_init(k, channels[i], channels[i + 1])
        ps.append(p)
        ss.append(s)
    return ps, ss


def vgg_stack(params, state, x, train: bool):
    new_state = []
    for p, s in zip(params, state):
        x, ns = vgg_layer(p, s, x, train)
        new_state.append(ns)
    return x, new_state


# ---------------------------------------------------------------------------
# MLP encoder (reference: src/prediction/models/base.py:5-23):
# Linear -> Tanh -> Linear


def mlp_encoder_init(key, din, dout, hidden):
    k1, k2 = jax.random.split(key)
    return {"l1": linear_init(k1, din, hidden), "l2": linear_init(k2, hidden, dout)}


def mlp_encoder(params, x):
    return linear(params["l2"], tanh(linear(params["l1"], x)))


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
