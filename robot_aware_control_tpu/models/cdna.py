"""CDNA compositing video-prediction models.

Redesign of the reference's CDNA family (reference:
src/prediction/models/dynamics.py:647-815, decoders vgg_64.py:245-376,
kernel ops cdna.py:7-117):

  ConvEncoder -> [tile action/state, 3x3 conv fuse] -> 2-cell ConvLSTM ->
  MaskDecoder (upsampling stack -> 2*F flow channels) ->
  F=13 CDNA kernels (1 applied to the context image, F-1 to the previous
  image) + F softmax compositing masks -> mask-weighted composite.

TPU-native kernel application: instead of a per-sample depthwise conv loop
(reference cdna.py:7-117 `apply_cdna_kernels_torch` builds a grouped conv
per batch), the k*k neighborhood is materialized as shifted slices of the
padded image and contracted against the per-sample kernels in ONE einsum —
a single MXU contraction batched over (B, H, W):

    out[b,h,w,f,c] = sum_p kernels[b,p,f] * patches[b,h,w,p,c]

Deviation from the reference (documented, deliberate): the reference
accidentally swaps the two MaskDecoder output halves (vgg_64.py:295-296
returns (kernel, mask) but dynamics' CDNADecoder unpacks (mask, kernel),
so raw un-normalized maps are used as compositing masks). Here masks are
softmaxed across flows per pixel — the standard CDNA formulation.

This family is a redesign of INTENT, not of shipped behavior: the
reference's CDNA models cannot execute at all (verified by
instantiation). `cdna_det` crashes at construction — dynamics.py:660
passes `cf.batch_size` (an int) where ConvLSTM reads
`config.lstm_group_norm` (lstm.py:206); `RobonetCDNAModel` crashes at
its first forward — cdna.py:171 tests `isinstance(inputs, tf.Tensor)`
with the tensorflow import commented out (cdna.py:5); and
dynamics.py:724 passes 4 args to CDNADecoder.forward's 3 params.
The only runnable piece, the numpy path of `apply_cdna_kernels_torch`,
is golden-tested against `apply_cdna_kernels` below
(tests/test_reference_golden.py::test_cdna_kernel_warp_parity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.ops import lstm as L
from robot_aware_control_tpu.ops import nn
from robot_aware_control_tpu.ops.encoders import conv_encoder, conv_encoder_init

NUM_FLOWS = 13
RELU_SHIFT = 1e-12


class Carry(NamedTuple):
    frame: tuple


def extract_patches(img, k):
    """img (B,H,W,C) -> (B,H,W,k*k,C) zero-padded SAME neighborhoods."""
    p = k // 2
    padded = jnp.pad(img, [(0, 0), (p, p), (p, p), (0, 0)])
    H, W = img.shape[1], img.shape[2]
    slices = [
        padded[:, dy:dy + H, dx:dx + W]
        for dy in range(k) for dx in range(k)
    ]
    return jnp.stack(slices, axis=3)


def apply_cdna_kernels(img, kernels):
    """img (B,H,W,C), kernels (B,k,k,F) normalized -> (B,H,W,F,C)
    (reference: cdna.py:7-117, one einsum instead of grouped convs)."""
    B, k = kernels.shape[0], kernels.shape[1]
    patches = extract_patches(img, k)  # (B,H,W,p,C)
    kf = kernels.reshape(B, k * k, -1)  # (B,p,F)
    return jnp.einsum("bhwpc,bpf->bhwfc", patches, kf.astype(patches.dtype))


# ---------------------------------------------------------------------------
# MaskDecoder: latent (H/8,W/8,dim) -> 2F channels at full res
# (reference: vgg_64.py:245-297)


def mask_decoder_init(key, dim, out_ch):
    ks = jax.random.split(key, 5)
    params, state = {}, {}
    params["upc2"], state["upc2"] = nn.vgg_stack_init(ks[0], [dim, 512, 512, 256])
    params["upc3"], state["upc3"] = nn.vgg_stack_init(ks[1], [256, 256, 256, 128])
    params["upc4"], state["upc4"] = nn.vgg_stack_init(ks[2], [128, 128, 64])
    params["upc5"], state["upc5"] = nn.vgg_stack_init(ks[3], [64, 64])
    params["out"] = nn.conv_init(ks[4], 3, 3, 64, out_ch)
    return params, state


def mask_decoder(params, state, vec, train):
    ns = {}
    d2, ns["upc2"] = nn.vgg_stack(params["upc2"], state["upc2"], vec, train)
    d3, ns["upc3"] = nn.vgg_stack(
        params["upc3"], state["upc3"], nn.upsample_nearest2(d2), train
    )
    d4, ns["upc4"] = nn.vgg_stack(
        params["upc4"], state["upc4"], nn.upsample_nearest2(d3), train
    )
    d5, ns["upc5"] = nn.vgg_stack(
        params["upc5"], state["upc5"], nn.upsample_nearest2(d4), train
    )
    return nn.conv2d(params["out"], d5), ns


# ---------------------------------------------------------------------------


def _lstm_in_channels(cfg: Config) -> int:
    c = cfg.g_dim + cfg.action_dim
    if cfg.model_use_robot_state:
        c += cfg.robot_dim
    return c


def _enc_channels(cfg: Config) -> int:
    c = cfg.channels
    if cfg.model_use_mask:
        c += 1
        if cfg.model_use_future_mask:
            c += 1
    return c


def init(key, cfg: Config):
    ks = jax.random.split(key, 5)
    params, state = {}, {}
    params["encoder"], state["encoder"] = conv_encoder_init(
        ks[0], cfg.g_dim, _enc_channels(cfg)
    )
    params["state_conv"] = nn.conv_init(ks[1], 3, 3, _lstm_in_channels(cfg),
                                        cfg.g_dim)
    params["frame_lstm"] = L.conv_lstm_init(ks[2], cfg.g_dim, cfg.g_dim,
                                            cfg.lstm_group_norm)
    params["mask_decoder"], state["mask_decoder"] = mask_decoder_init(
        ks[3], cfg.g_dim, 2 * NUM_FLOWS
    )
    hw = cfg.image_height * cfg.image_width
    params["kernel_mlp"] = nn.linear_init(ks[4], hw, cfg.cdna_kernel_size ** 2)
    return params, state


def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> Carry:
    return Carry(frame=L.conv_lstm_zero_state(
        batch, cfg.feat_height, cfg.feat_width, cfg.g_dim, dtype
    ))


def decode_cdna(cfg, params, state, prev_image, latent, context_image, train):
    """(reference CDNADecoder: vgg_64.py:299-376)"""
    out, ns = mask_decoder(params["mask_decoder"], state["mask_decoder"],
                           latent, train)
    kernel_maps, mask_maps = jnp.split(out, 2, axis=-1)  # (B,H,W,F) each
    B = out.shape[0]
    k = cfg.cdna_kernel_size
    # per-flow kernels from the flattened kernel maps (vgg_64.py:319-326)
    km = kernel_maps.reshape(B, -1, NUM_FLOWS).transpose(0, 2, 1)  # (B,F,HW)
    kern = jax.nn.relu(nn.linear(params["kernel_mlp"], km) - RELU_SHIFT) + RELU_SHIFT
    kern = kern / jnp.sum(kern, axis=-1, keepdims=True)  # normalize per flow
    kern = kern.transpose(0, 2, 1).reshape(B, k, k, NUM_FLOWS)
    # per-pixel softmax compositing masks across flows
    masks = jax.nn.softmax(mask_maps.astype(jnp.float32), axis=-1)

    warped_ctx = apply_cdna_kernels(context_image, kern[..., :1])
    warped_prev = apply_cdna_kernels(prev_image, kern[..., 1:])
    warped = jnp.concatenate([warped_ctx, warped_prev], axis=3)  # (B,H,W,F,C)
    composite = jnp.sum(masks[..., None].astype(warped.dtype) * warped, axis=3)
    return composite, ns


def step(cfg: Config, params, state, carry: Carry, image, mask, robot, action,
         context_image=None, skip=None, use_curr_skip=None, train=False):
    """(reference: dynamics.py:693-728). context_image defaults to the
    current image."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fh, fw = cfg.feat_height, cfg.feat_width
    new_state = dict(state)
    img_in = image
    if cfg.model_use_mask:
        img_in = jnp.concatenate([image, mask], -1)
    h, curr_skip, new_state["encoder"] = conv_encoder(
        params["encoder"], state["encoder"], img_in.astype(dtype), train
    )
    tile = lambda v: jnp.broadcast_to(
        v[:, None, None, :], (v.shape[0], fh, fw, v.shape[-1])
    )
    feats = [tile(action.astype(dtype))]
    if cfg.model_use_robot_state:
        r = robot[0] if isinstance(robot, tuple) else robot
        feats.append(tile(r.astype(dtype)))
    feed = nn.conv2d(params["state_conv"], jnp.concatenate(feats + [h], -1))
    h_pred, frame_carry = L.conv_lstm(
        params["frame_lstm"], carry.frame, feed, cfg.lstm_group_norm,
        fused=cfg.fused_lstm and not train,
    )
    ctx = image if context_image is None else context_image
    x_pred, ns_dec = decode_cdna(
        cfg, params, state, image.astype(dtype)[..., : cfg.channels],
        h_pred, ctx.astype(dtype)[..., : cfg.channels], train,
    )
    new_state["mask_decoder"] = ns_dec
    out = {"x_pred": x_pred, "skip": curr_skip, "curr_skip": curr_skip}
    return out, Carry(frame_carry), new_state


# ---------------------------------------------------------------------------
# RobonetCDNAModel: adds dot-product attention over all previous encodings
# inside the recurrence (reference: dynamics.py:728-815, lstm.py:342-372).


class RobonetCarry(NamedTuple):
    frame: tuple
    enc_buffer: jnp.ndarray  # (B, T_max, fh*fw*g) rolling encodings
    t: jnp.ndarray           # () step counter


class robonet:
    Carry = RobonetCarry
    T_MAX = 16

    @staticmethod
    def init(key, cfg: Config):
        return init(key, cfg)

    @staticmethod
    def init_carry(cfg: Config, batch: int, dtype=jnp.float32) -> RobonetCarry:
        fh, fw = cfg.feat_height, cfg.feat_width
        return RobonetCarry(
            frame=L.conv_lstm_zero_state(batch, fh, fw, cfg.g_dim, dtype),
            enc_buffer=jnp.zeros(
                (batch, robonet.T_MAX, fh * fw * cfg.g_dim), dtype
            ),
            t=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def step(cfg: Config, params, state, carry: RobonetCarry, image, mask,
             robot, action, context_image=None, skip=None, use_curr_skip=None,
             train=False):
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        fh, fw = cfg.feat_height, cfg.feat_width
        new_state = dict(state)
        img_in = image
        if cfg.model_use_mask:
            img_in = jnp.concatenate([image, mask], -1)
        h, curr_skip, new_state["encoder"] = conv_encoder(
            params["encoder"], state["encoder"], img_in.astype(dtype), train
        )
        B = h.shape[0]
        hv = h.reshape(B, -1)
        buf = jax.lax.dynamic_update_slice(
            carry.enc_buffer, hv[:, None, :].astype(carry.enc_buffer.dtype),
            (0, carry.t % robonet.T_MAX, 0),
        )
        # dot-product attention of the current encoding over the buffer
        scores = jnp.einsum("bd,btd->bt", hv.astype(jnp.float32),
                            buf.astype(jnp.float32)) / jnp.sqrt(hv.shape[-1])
        valid = (jnp.arange(robonet.T_MAX) <= carry.t)[None]
        scores = jnp.where(valid, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        h_att = jnp.einsum("bt,btd->bd", attn, buf.astype(jnp.float32))
        h = (hv + h_att.astype(hv.dtype)).reshape(B, fh, fw, -1)

        tile = lambda v: jnp.broadcast_to(
            v[:, None, None, :], (v.shape[0], fh, fw, v.shape[-1])
        )
        feats = [tile(action.astype(dtype))]
        if cfg.model_use_robot_state:
            r = robot[0] if isinstance(robot, tuple) else robot
            feats.append(tile(r.astype(dtype)))
        feed = nn.conv2d(params["state_conv"], jnp.concatenate(feats + [h], -1))
        h_pred, frame_carry = L.conv_lstm(
            params["frame_lstm"], carry.frame, feed, cfg.lstm_group_norm,
            fused=cfg.fused_lstm and not train,
        )
        ctx = image if context_image is None else context_image
        x_pred, ns_dec = decode_cdna(
            cfg, params, state, image.astype(dtype)[..., : cfg.channels],
            h_pred, ctx.astype(dtype)[..., : cfg.channels], train,
        )
        new_state["mask_decoder"] = ns_dec
        out = {"x_pred": x_pred, "skip": curr_skip, "curr_skip": curr_skip}
        return out, RobonetCarry(frame_carry, buf, carry.t + 1), new_state
