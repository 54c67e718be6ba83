"""SVG conv video-prediction model (stochastic, learned prior).

TPU-native redesign of the reference's primary model, `SVGConvModel`
(reference: src/prediction/models/dynamics.py:457-644):

  ConvEncoder -> [tile action/state spatially, 3x3 conv fuse]
              -> 2-cell ConvLSTM frame predictor
              -> ConvDecoder with skips -> RGB + attention channel.
  Gaussian-ConvLSTM learned prior p(z|x_t,a_t,r_t) and posterior
  q(z|x_{t+1},r_{t+1}).

Differences from the reference (deliberate, TPU-first):
  * Pure function: `step(cfg, params, state, carry, inputs, rng, ...)`
    threads the recurrent carry (frame/prior/posterior LSTM states) and
    BatchNorm statistics explicitly instead of mutating module attributes
    (reference: dynamics.py:536-542). Whole windows run under `lax.scan`;
    CEM rollouts vmap/shard over candidates.
  * NHWC layout, bf16-friendly compute dtype.
  * The posterior encodes the *next* frame, the standard SVG-LP semantics.
    The reference accidentally re-encodes the current frame
    (dynamics.py:619); set cfg.posterior_use_current_frame=True to emulate.

The composite step `x_{t+1} = (1-m̂)·x_t + m̂·x̂` with the decoder's extra
attention channel is applied by callers, matching the reference trainer
(reference: src/prediction/trainer.py:406-407).
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
    prior: tuple
    posterior: tuple


def _lstm_channels(cfg: Config) -> int:
    c = cfg.g_dim + cfg.action_dim + cfg.z_dim
    if cfg.model_use_robot_state:
        c += cfg.robot_dim
    if cfg.model_use_future_robot_state:
        c += cfg.robot_dim
    return c


def _prior_channels(cfg: Config) -> int:
    c = cfg.g_dim + cfg.action_dim
    if cfg.model_use_robot_state:
        c += cfg.robot_dim
    if cfg.model_use_future_robot_state:
        c += cfg.robot_dim
    return c


def _post_channels(cfg: Config) -> int:
    c = cfg.g_dim
    if cfg.model_use_robot_state:
        c += cfg.robot_dim
    return c


def init(key, cfg: Config):
    """Returns (params, state) pytrees. state = BatchNorm running stats."""
    ks = jax.random.split(key, 8)
    params, state = {}, {}
    params["encoder"], state["encoder"] = conv_encoder_init(
        ks[0], cfg.g_dim, cfg.enc_channels
    )
    params["decoder"], state["decoder"] = conv_decoder_init(
        ks[1], cfg.g_dim, cfg.channels + 1
    )
    params["frame_in"] = nn.conv_init(ks[2], 3, 3, _lstm_channels(cfg), cfg.g_dim)
    params["prior_in"] = nn.conv_init(ks[3], 3, 3, _prior_channels(cfg), cfg.g_dim)
    params["post_in"] = nn.conv_init(ks[4], 3, 3, _post_channels(cfg), cfg.g_dim)
    params["frame_lstm"] = L.conv_lstm_init(
        ks[5], cfg.g_dim, cfg.g_dim, cfg.lstm_group_norm
    )
    params["prior"] = L.gaussian_conv_lstm_init(
        ks[6], cfg.g_dim, cfg.g_dim, cfg.z_dim, cfg.lstm_group_norm
    )
    params["posterior"] = L.gaussian_conv_lstm_init(
        ks[7], cfg.g_dim, cfg.g_dim, cfg.z_dim, cfg.lstm_group_norm
    )
    return params, state


def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> Carry:
    fh, fw = cfg.feat_height, cfg.feat_width
    mk = lambda: L.conv_lstm_zero_state(batch, fh, fw, cfg.g_dim, dtype)
    return Carry(frame=mk(), prior=mk(), posterior=mk())


def _tile(vec, fh, fw):
    """(B, D) -> (B, fh, fw, D) spatial tiling (reference: dynamics.py:592)."""
    return jnp.broadcast_to(
        vec[:, None, None, :], (vec.shape[0], fh, fw, vec.shape[-1])
    )


def _encoder_input(cfg: Config, image, mask, heatmap):
    """Channel-concat conditioning (reference: dynamics.py:577-582)."""
    parts = [image]
    if cfg.model_use_heatmap:
        parts.append(heatmap)
    if cfg.model_use_mask:
        parts.append(mask)
    return jnp.concatenate(parts, -1) if len(parts) > 1 else image


def step(
    cfg: Config,
    params,
    state,
    carry: Carry,
    image,
    mask,
    robot,
    heatmap,
    action,
    rng,
    next_image=None,
    next_mask=None,
    next_robot=None,
    next_heatmap=None,
    skip=None,
    use_curr_skip=None,
    force_use_prior: bool = False,
    sample_mean: bool = False,
    train: bool = False,
):
    """One prediction step (reference: dynamics.py:544-644).

    Returns (out, new_carry, new_state) where out is a dict:
      x_pred   (B,H,W,channels+1) decoder output (RGB + attention channel)
      skip     encoder skips used by the decoder this step
      curr_skip encoder skips of the *current* frame
      mu/logvar, mu_p/logvar_p  posterior/prior stats (None when unused)
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fh, fw = cfg.feat_height, cfg.feat_width
    new_state = dict(state)

    img = _encoder_input(cfg, image, mask, heatmap).astype(dtype)
    h, curr_skip, new_state["encoder"] = conv_encoder(
        params["encoder"], state["encoder"], img, train
    )
    if cfg.last_frame_skip or skip is None:
        skip = curr_skip
    elif use_curr_skip is not None:
        # traced selection for lax.scan: skip carries can't be None mid-scan
        skip = jax.tree_util.tree_map(
            lambda c, s: jnp.where(use_curr_skip, c, s.astype(c.dtype)),
            curr_skip,
            skip,
        )

    a = _tile(action.astype(dtype), fh, fw)
    rng_prior, rng_post = jax.random.split(rng)

    if cfg.model_use_robot_state:
        if cfg.model_use_future_robot_state:
            r, r_next = robot
            r = _tile(r.astype(dtype), fh, fw)
            r_next = _tile(r_next.astype(dtype), fh, fw)
            prior_feed = jnp.concatenate([a, r, r_next, h], -1)
            frame_cond = [a, r, r_next]
        else:
            r = _tile(robot.astype(dtype), fh, fw)
            prior_feed = jnp.concatenate([a, r, h], -1)
            frame_cond = [a, r]
    else:
        prior_feed = jnp.concatenate([a, h], -1)
        frame_cond = [a]

    fused = cfg.fused_lstm and not train
    prior_in = nn.conv2d(params["prior_in"], prior_feed)
    z_p, mu_p, logvar_p, prior_carry = L.gaussian_conv_lstm(
        params["prior"], carry.prior, prior_in, rng_prior,
        cfg.lstm_group_norm, fused=fused,
    )
    z = mu_p if sample_mean else z_p

    mu = logvar = None
    post_carry = carry.posterior
    if next_image is not None:
        if cfg.posterior_use_current_frame:
            h_target = h  # reference behavior (dynamics.py:619)
            new_state_enc = new_state["encoder"]
        else:
            next_img = _encoder_input(cfg, next_image, next_mask, next_heatmap)
            h_target, _, new_state_enc = conv_encoder(
                params["encoder"], new_state["encoder"], next_img.astype(dtype), train
            )
        new_state["encoder"] = new_state_enc
        if cfg.model_use_robot_state:
            r_target = _tile(next_robot.astype(dtype), fh, fw)
            post_feed = jnp.concatenate([r_target, h_target], -1)
        else:
            post_feed = h_target
        post_in = nn.conv2d(params["post_in"], post_feed)
        z_t, mu, logvar, post_carry = L.gaussian_conv_lstm(
            params["posterior"], carry.posterior, post_in, rng_post,
            cfg.lstm_group_norm, fused=fused,
        )
        if not force_use_prior:
            z = z_t

    frame_feed = jnp.concatenate(frame_cond + [h, z.astype(dtype)], -1)
    frame_in = nn.conv2d(params["frame_in"], frame_feed)
    h_pred, frame_carry = L.conv_lstm(
        params["frame_lstm"], carry.frame, frame_in, cfg.lstm_group_norm,
        fused=fused,
    )

    x_pred, new_state["decoder"] = conv_decoder(
        params["decoder"], state["decoder"], h_pred, skip, train
    )

    out = {
        "x_pred": x_pred,
        "skip": skip,
        "curr_skip": curr_skip,
        "mu": mu,
        "logvar": logvar,
        "mu_p": mu_p,
        "logvar_p": logvar_p,
    }
    return out, Carry(frame_carry, prior_carry, post_carry), new_state


def composite(x_pred, prev_image):
    """(1 - m̂)·prev + m̂·rgb using the decoder's attention channel
    (reference: src/prediction/trainer.py:406-407)."""
    rgb, attn = x_pred[..., :-1], x_pred[..., -1:]
    prev = prev_image.astype(rgb.dtype)
    return (1.0 - attn) * prev + attn * rgb
