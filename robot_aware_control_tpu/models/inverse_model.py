"""Inverse models: (start image, goal image) -> action sequence.

Reference parity: the vendored RoboNet inverse models (reference:
robonet/robonet/inverse_model/models/deterministic_inverse_model.py:12-59
and discretized_inverse_model.py): encode start/goal frames with a conv
stack, concatenate the embeddings, and regress the T actions — either as a
continuous MSE head or as per-dimension discretized classification.

TPU-native: pure param-pytree functions; the full train step is one jitted
program (see make_inverse_train_step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.ops import nn


def _enc_init(key, in_ch=3, width=32):
    ks = jax.random.split(key, 3)
    return {
        "c1": nn.conv_init(ks[0], 5, 5, in_ch, width),
        "c2": nn.conv_init(ks[1], 3, 3, width, width * 2),
        "c3": nn.conv_init(ks[2], 3, 3, width * 2, width * 4),
    }


def _encode(params, x):
    h = jax.nn.relu(nn.conv2d(params["c1"], x, stride=2))
    h = jax.nn.relu(nn.conv2d(params["c2"], h, stride=2))
    h = jax.nn.relu(nn.conv2d(params["c3"], h, stride=2))
    return jnp.mean(h, axis=(1, 2))  # global average pool


def init(key, cfg: Config, horizon: int, width: int = 32,
         discretized: bool = False, bins: int = 0):
    """bins > 0 => discretized head (per action dim per step)."""
    ks = jax.random.split(key, 4)
    out_dim = horizon * cfg.action_dim * (bins if discretized else 1)
    return {
        "encoder": _enc_init(ks[0], cfg.channels, width),
        "fc1": nn.linear_init(ks[1], width * 8, 256),
        "fc2": nn.linear_init(ks[2], 256, 256),
        "out": nn.linear_init(ks[3], 256, out_dim),
    }


def apply(params, cfg: Config, start_img, goal_img, horizon: int,
          discretized: bool = False, bins: int = 0):
    """Returns (B, T, A) actions, or (B, T, A, bins) logits if discretized."""
    e1 = _encode(params["encoder"], start_img)
    e2 = _encode(params["encoder"], goal_img)
    h = jnp.concatenate([e1, e2], -1)
    h = jax.nn.relu(nn.linear(params["fc1"], h))
    h = jax.nn.relu(nn.linear(params["fc2"], h))
    out = nn.linear(params["out"], h)
    B = start_img.shape[0]
    if discretized:
        return out.reshape(B, horizon, cfg.action_dim, bins)
    return out.reshape(B, horizon, cfg.action_dim)


def make_inverse_train_step(cfg: Config, horizon: int, lr: float = 1e-3,
                            discretized: bool = False, bins: int = 11,
                            action_low: float = -1.0, action_high: float = 1.0):
    tx = optax.adam(lr)

    def loss_fn(params, start, goal, actions):
        if discretized:
            logits = apply(params, cfg, start, goal, horizon, True, bins)
            # quantize actions into bins
            a01 = (actions - action_low) / (action_high - action_low)
            labels = jnp.clip((a01 * bins).astype(jnp.int32), 0, bins - 1)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
        pred = apply(params, cfg, start, goal, horizon)
        return jnp.mean((pred - actions) ** 2)

    @jax.jit
    def step(params, opt_state, start, goal, actions):
        loss, grads = jax.value_and_grad(loss_fn)(params, start, goal, actions)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx
