"""Vector-latent SVG / deterministic models (fc-LSTM bottleneck).

Redesign of the reference's original-SVG variants (reference:
src/prediction/models/dynamics.py:75-266): VGG encoder bottlenecks each
frame to a g_dim vector; MLP encoders embed action/robot state; fc-LSTM
stacks predict the next latent; Gaussian fc-LSTMs give the learned prior
p(z|h,a,r) and posterior q(z|h_next,r_next); VGG decoder reconstructs the
frame from the predicted latent + skips. Output is the full frame (no
attention compositing channel).

Pure step functions with explicit carries, same protocol as models/svg.py:
`step(...) -> (out, new_carry, new_state)`.

Registered as --model svg_vec / det_vec (the reference reaches these
classes only through legacy pickled checkpoints, dynamics.py:15-72).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.ops import lstm as L
from robot_aware_control_tpu.ops import nn
from robot_aware_control_tpu.ops.encoders import (
    decoder,
    decoder_init,
    encoder,
    encoder_init,
)


class Carry(NamedTuple):
    frame: tuple
    prior: tuple
    posterior: tuple


def _feat_hw(cfg: Config):
    return (cfg.image_height // 16, cfg.image_width // 16)


def _enc_channels(cfg: Config) -> int:
    c = cfg.channels
    if cfg.model_use_mask:
        c += 1
        if cfg.model_use_future_mask:
            c += 1
    return c


def _frame_in_dim(cfg: Config, stochastic: bool) -> int:
    d = cfg.action_enc_dim + cfg.g_dim
    if stochastic:
        d += cfg.z_dim
    if cfg.model_use_robot_state:
        d += cfg.robot_enc_dim
    return d


def attention_init(key, dim, hidden=32):
    """Background-attention module (reference: src/prediction/models/
    base.py:34-62 — present but unused by the reference trainer; kept for
    API completeness). Scores each feature vector against a learned query."""
    k1, k2 = jax.random.split(key)
    return {"q": nn.linear_init(k1, dim, hidden),
            "k": nn.linear_init(k2, dim, hidden)}


def attention(params, feats):
    """feats (B, T, D) -> attention-weighted sum (B, D)."""
    q = nn.linear(params["q"], feats.mean(axis=1))        # (B, H)
    k = nn.linear(params["k"], feats)                      # (B, T, H)
    scores = jax.nn.softmax(
        jnp.einsum("bh,bth->bt", q, k) / jnp.sqrt(q.shape[-1]), axis=-1
    )
    return jnp.einsum("bt,btd->bd", scores, feats)


def mlp_encoder_init(key, din, dout, hidden=32):
    """Linear -> Tanh -> Linear (reference: src/prediction/models/base.py:5-23)."""
    return nn.mlp_encoder_init(key, din, dout, hidden)


def mlp_encoder(params, x):
    return nn.mlp_encoder(params, x)


def _init_common(key, cfg: Config, stochastic: bool):
    ks = jax.random.split(key, 7)
    params, state = {}, {}
    params["encoder"], state["encoder"] = encoder_init(
        ks[0], cfg.g_dim, _enc_channels(cfg), _feat_hw(cfg)
    )
    params["decoder"], state["decoder"] = decoder_init(
        ks[1], cfg.g_dim, cfg.channels, _feat_hw(cfg)
    )
    params["action_enc"] = mlp_encoder_init(ks[2], cfg.action_dim,
                                            cfg.action_enc_dim)
    if cfg.model_use_robot_state:
        params["robot_enc"] = mlp_encoder_init(ks[3], cfg.robot_dim,
                                               cfg.robot_enc_dim)
    params["frame_lstm"] = L.lstm_init(
        ks[4], _frame_in_dim(cfg, stochastic), cfg.g_dim, cfg.rnn_size,
        cfg.predictor_rnn_layers,
    )
    if stochastic:
        prior_dim = cfg.action_enc_dim + cfg.g_dim
        post_dim = cfg.g_dim
        if cfg.model_use_robot_state:
            prior_dim += cfg.robot_enc_dim
            post_dim += cfg.robot_enc_dim
        params["prior"] = L.gaussian_lstm_init(
            ks[5], prior_dim, cfg.z_dim, cfg.rnn_size, cfg.prior_rnn_layers
        )
        params["posterior"] = L.gaussian_lstm_init(
            ks[6], post_dim, cfg.z_dim, cfg.rnn_size, cfg.posterior_rnn_layers
        )
    return params, state


def _encode(cfg, params, state, image, mask, train, dtype, rng=None):
    img = image
    if cfg.model_use_mask:
        img = jnp.concatenate([image, mask], -1)
    return encoder(
        params["encoder"], state["encoder"], img.astype(dtype), train,
        dropout_rate=cfg.dropout, dropout_rng=rng,
    )


def _select_skip(skip, curr_skip, use_curr_skip, last_frame_skip):
    if last_frame_skip or skip is None:
        return curr_skip
    if use_curr_skip is not None:
        return jax.tree_util.tree_map(
            lambda c, s: jnp.where(use_curr_skip, c, s.astype(c.dtype)),
            curr_skip, skip,
        )
    return skip


# ---------------------------------------------------------------------------
# stochastic (SVGModel, reference: dynamics.py:159-266)


def init(key, cfg: Config):
    return _init_common(key, cfg, stochastic=True)


def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> Carry:
    return Carry(
        frame=L.lstm_zero_state(batch, cfg.rnn_size, cfg.predictor_rnn_layers, dtype),
        prior=L.lstm_zero_state(batch, cfg.rnn_size, cfg.prior_rnn_layers, dtype),
        posterior=L.lstm_zero_state(batch, cfg.rnn_size,
                                    cfg.posterior_rnn_layers, dtype),
    )


def step(cfg: Config, params, state, carry: Carry, image, mask, robot,
         heatmap, action, rng, next_image=None, next_mask=None,
         next_robot=None, next_heatmap=None, skip=None, use_curr_skip=None,
         force_use_prior=False, sample_mean=False, train=False):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    new_state = dict(state)
    rng_p, rng_q, rng_drop = jax.random.split(rng, 3)
    h, curr_skip, new_state["encoder"] = _encode(
        cfg, params, state, image, mask, train, dtype, rng=rng_drop
    )
    skip = _select_skip(skip, curr_skip, use_curr_skip, cfg.last_frame_skip)

    a = mlp_encoder(params["action_enc"], action.astype(dtype))
    feats = [a]
    if cfg.model_use_robot_state:
        r = robot[0] if isinstance(robot, tuple) else robot
        r = mlp_encoder(params["robot_enc"], r.astype(dtype))
        feats.append(r)
    z_p, mu_p, logvar_p, prior_carry = L.gaussian_lstm_apply(
        params["prior"], carry.prior, jnp.concatenate(feats + [h], -1), rng_p
    )
    z = mu_p if sample_mean else z_p

    mu = logvar = None
    post_carry = carry.posterior
    if next_image is not None:
        h_t, _, new_state["encoder"] = _encode(
            cfg, params, dict(state, encoder=new_state["encoder"]),
            next_image, next_mask, train, dtype,
            rng=jax.random.fold_in(rng_drop, 101),
        )
        post_feats = [h_t]
        if cfg.model_use_robot_state:
            post_feats = [
                mlp_encoder(params["robot_enc"], next_robot.astype(dtype)), h_t
            ]
        z_t, mu, logvar, post_carry = L.gaussian_lstm_apply(
            params["posterior"], carry.posterior,
            jnp.concatenate(post_feats, -1), rng_q,
        )
        if not force_use_prior:
            z = z_t

    h_pred, frame_carry = L.lstm_apply(
        params["frame_lstm"], carry.frame,
        jnp.concatenate(feats + [h, z.astype(dtype)], -1),
    )
    x_pred, new_state["decoder"] = decoder(
        params["decoder"], state["decoder"], h_pred, skip, train
    )
    out = {"x_pred": x_pred, "skip": skip, "curr_skip": curr_skip,
           "mu": mu, "logvar": logvar, "mu_p": mu_p, "logvar_p": logvar_p}
    return out, Carry(frame_carry, prior_carry, post_carry), new_state


# ---------------------------------------------------------------------------
# deterministic (DeterministicModel, reference: dynamics.py:75-156)


class DetCarry(NamedTuple):
    frame: tuple


class det:
    """Deterministic vector model, same module protocol."""

    Carry = DetCarry

    @staticmethod
    def init(key, cfg: Config):
        return _init_common(key, cfg, stochastic=False)

    @staticmethod
    def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> DetCarry:
        return DetCarry(frame=L.lstm_zero_state(
            batch, cfg.rnn_size, cfg.predictor_rnn_layers, dtype
        ))

    @staticmethod
    def step(cfg: Config, params, state, carry: DetCarry, image, mask, robot,
             action, skip=None, use_curr_skip=None, train=False, rng=None):
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        new_state = dict(state)
        h, curr_skip, new_state["encoder"] = _encode(
            cfg, params, state, image, mask, train, dtype, rng=rng
        )
        skip = _select_skip(skip, curr_skip, use_curr_skip, cfg.last_frame_skip)
        a = mlp_encoder(params["action_enc"], action.astype(dtype))
        feats = [a]
        if cfg.model_use_robot_state:
            r = robot[0] if isinstance(robot, tuple) else robot
            feats.append(mlp_encoder(params["robot_enc"], r.astype(dtype)))
        h_pred, frame_carry = L.lstm_apply(
            params["frame_lstm"], carry.frame,
            jnp.concatenate(feats + [h], -1),
        )
        x_pred, new_state["decoder"] = decoder(
            params["decoder"], state["decoder"], h_pred, skip, train
        )
        out = {"x_pred": x_pred, "skip": skip, "curr_skip": curr_skip}
        return out, DetCarry(frame_carry), new_state
