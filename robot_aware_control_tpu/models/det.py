"""Deterministic ConvLSTM video-prediction model.

Redesign of the reference's `DeterministicConvModel`
(reference: src/prediction/models/dynamics.py:363-454): ConvEncoder ->
[action/state projected by a Linear into 2-channel spatial maps at
(H/8, W/8)] -> 2-cell ConvLSTM -> ConvDecoder with skips, extra attention
channel for compositing. No prior/posterior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.ops import lstm as L
from robot_aware_control_tpu.ops import nn
from robot_aware_control_tpu.ops.encoders import (
    conv_decoder,
    conv_decoder_init,
    conv_encoder,
    conv_encoder_init,
)


class Carry(NamedTuple):
    frame: tuple


def _lstm_channels(cfg: Config) -> int:
    # g_dim + 2 action channels (+ 2 state channels)
    # (reference: dynamics.py:403)
    return cfg.g_dim + 2 + (2 if cfg.model_use_robot_state else 0)


def init(key, cfg: Config):
    ks = jax.random.split(key, 5)
    fh, fw = cfg.feat_height, cfg.feat_width
    params, state = {}, {}
    params["encoder"], state["encoder"] = conv_encoder_init(
        ks[0], cfg.g_dim, cfg.enc_channels
    )
    params["decoder"], state["decoder"] = conv_decoder_init(
        ks[1], _lstm_channels(cfg), cfg.channels + 1
    )
    params["action_enc"] = nn.linear_init(ks[2], cfg.action_dim, fh * fw * 2)
    if cfg.model_use_robot_state:
        params["state_enc"] = nn.linear_init(ks[3], cfg.robot_dim, fh * fw * 2)
    params["frame_lstm"] = L.conv_lstm_init(
        ks[4], _lstm_channels(cfg), _lstm_channels(cfg), cfg.lstm_group_norm
    )
    return params, state


def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> Carry:
    fh, fw = cfg.feat_height, cfg.feat_width
    return Carry(
        frame=L.conv_lstm_zero_state(batch, fh, fw, _lstm_channels(cfg), dtype)
    )


def step(
    cfg: Config,
    params,
    state,
    carry: Carry,
    image,
    mask,
    robot,
    action,
    skip=None,
    use_curr_skip=None,
    train: bool = False,
):
    """One prediction step (reference: dynamics.py:422-454).
    Returns (out dict, new_carry, new_state)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fh, fw = cfg.feat_height, cfg.feat_width
    new_state = dict(state)

    if cfg.model_use_mask:
        img = jnp.concatenate([image, mask], -1)
    else:
        img = image
    h, curr_skip, new_state["encoder"] = conv_encoder(
        params["encoder"], state["encoder"], img.astype(dtype), train
    )
    if skip is None:
        skip = curr_skip
    elif use_curr_skip is not None:
        skip = jax.tree_util.tree_map(
            lambda c, s: jnp.where(use_curr_skip, c, s.astype(c.dtype)),
            curr_skip,
            skip,
        )

    a = nn.linear(params["action_enc"], action.astype(dtype)).reshape(
        action.shape[0], fh, fw, 2
    )
    feats = [h, a]
    if cfg.model_use_robot_state:
        r = nn.linear(params["state_enc"], robot.astype(dtype)).reshape(
            robot.shape[0], fh, fw, 2
        )
        feats.append(r)
    feed = jnp.concatenate(feats, -1)
    h_pred, frame_carry = L.conv_lstm(
        params["frame_lstm"], carry.frame, feed, cfg.lstm_group_norm,
        fused=cfg.fused_lstm and not train,
    )
    x_pred, new_state["decoder"] = conv_decoder(
        params["decoder"], state["decoder"], h_pred, skip, train
    )
    out = {"x_pred": x_pred, "skip": skip, "curr_skip": curr_skip}
    return out, Carry(frame_carry), new_state
