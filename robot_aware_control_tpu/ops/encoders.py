"""VGG-style encoders/decoders for 48x64 / 64x64 video frames.

Re-designs the reference's conv stacks (reference:
src/prediction/models/vgg_64.py:21-241) as pure functions over param/state
pytrees in NHWC. Two families:

  * ConvEncoder / ConvDecoder — spatial-latent path used by the conv models:
    encoder keeps a (H/8, W/8) feature map + 3 skip levels; decoder fuses
    skips with nearest-upsampling and emits sigmoid output
    (reference: vgg_64.py:87-129, 196-241).
  * Encoder / Decoder — vector-latent path used by the original SVG models:
    encoder bottlenecks to a g_dim vector via a final valid conv + tanh;
    decoder starts from a 1x1 transpose conv (reference: vgg_64.py:21-84,
    146-193).

All convs run on the MXU in the caller's compute dtype; BatchNorm state is
returned functionally so the whole stack scans over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from robot_aware_control_tpu.ops import nn


# ---------------------------------------------------------------------------
# ConvEncoder: nc -> (H/8, W/8, g_dim) + skips  (reference: vgg_64.py:87-129)

_ENC_PLAN = {
    "c1": lambda nc: [nc, 64, 64],
    "c2": lambda nc: [64, 128, 128],
    "c3": lambda nc: [128, 256, 256, 256],
    "c4_head": lambda nc: [256, 512, 512],
}


def conv_encoder_init(key, g_dim, nc):
    ks = jax.random.split(key, 5)
    params, state = {}, {}
    for k, (name, plan) in zip(ks, _ENC_PLAN.items()):
        params[name], state[name] = nn.vgg_stack_init(k, plan(nc))
    # final vgg layer 512 -> g_dim completes c4 (reference: vgg_64.py:115-119)
    params["c4_out"], state["c4_out"] = nn.vgg_layer_init(ks[4], 512, g_dim)
    return params, state


def conv_encoder(params, state, x, train):
    """x: (B, H, W, nc) -> (feat (B,H/8,W/8,g), skips [h1,h2,h3,h4], state)."""
    ns = {}
    h1, ns["c1"] = nn.vgg_stack(params["c1"], state["c1"], x, train)
    h2, ns["c2"] = nn.vgg_stack(params["c2"], state["c2"], nn.max_pool2(h1), train)
    h3, ns["c3"] = nn.vgg_stack(params["c3"], state["c3"], nn.max_pool2(h2), train)
    h4, ns["c4_head"] = nn.vgg_stack(
        params["c4_head"], state["c4_head"], nn.max_pool2(h3), train
    )
    h4, ns["c4_out"] = nn.vgg_layer(params["c4_out"], state["c4_out"], h4, train)
    return h4, [h1, h2, h3, h4], ns


# ---------------------------------------------------------------------------
# ConvDecoder: (H/8, W/8, dim) + skips -> (H, W, nc), sigmoid
# (reference: vgg_64.py:196-241)


def conv_decoder_init(key, dim, nc):
    ks = jax.random.split(key, 5)
    params, state = {}, {}
    params["upc2"], state["upc2"] = nn.vgg_stack_init(ks[0], [dim, 512, 512, 256])
    params["upc3"], state["upc3"] = nn.vgg_stack_init(ks[1], [256 * 2, 256, 256, 128])
    params["upc4"], state["upc4"] = nn.vgg_stack_init(ks[2], [128 * 2, 128, 64])
    params["upc5"], state["upc5"] = nn.vgg_stack_init(ks[3], [64 * 2, 64])
    # ConvTranspose2d(64, nc, 3, 1, 1) with stride 1 == same-padded 3x3 conv
    params["out"] = nn.conv_init(ks[4], 3, 3, 64, nc)
    return params, state


def conv_decoder(params, state, vec, skips, train):
    ns = {}
    h1, h2, h3, _ = skips
    d2, ns["upc2"] = nn.vgg_stack(params["upc2"], state["upc2"], vec, train)
    up2 = nn.upsample_nearest2(d2)
    d3, ns["upc3"] = nn.vgg_stack(
        params["upc3"], state["upc3"], jnp.concatenate([up2, h3], -1), train
    )
    up3 = nn.upsample_nearest2(d3)
    d4, ns["upc4"] = nn.vgg_stack(
        params["upc4"], state["upc4"], jnp.concatenate([up3, h2], -1), train
    )
    up4 = nn.upsample_nearest2(d4)
    d5, ns["upc5"] = nn.vgg_stack(
        params["upc5"], state["upc5"], jnp.concatenate([up4, h1], -1), train
    )
    out = nn.sigmoid(nn.conv2d(params["out"], d5))
    return out, ns


# ---------------------------------------------------------------------------
# Vector-bottleneck Encoder: nc -> g_dim vector (reference: vgg_64.py:21-84)


def encoder_init(key, g_dim, nc, feat_hw=(4, 4)):
    """feat_hw: spatial extent after 4 pools (4,4 for 64x64; 3,4 for 48x64)."""
    ks = jax.random.split(key, 6)
    params, state = {}, {}
    params["c1"], state["c1"] = nn.vgg_stack_init(ks[0], [nc, 64, 64])
    params["c2"], state["c2"] = nn.vgg_stack_init(ks[1], [64, 128, 128])
    params["c3"], state["c3"] = nn.vgg_stack_init(ks[2], [128, 256, 256, 256])
    params["c4"], state["c4"] = nn.vgg_stack_init(ks[3], [256, 512, 512, 512])
    fh, fw = feat_hw
    params["c5"] = {"conv": nn.conv_init(ks[4], fh, fw, 512, g_dim)}
    bn_p, bn_s = nn.batchnorm_init(ks[5], g_dim)
    params["c5"]["bn"] = bn_p
    state["c5"] = {"bn": bn_s}
    return params, state


def _dropout2d(h, rate, rng, salt):
    """Channel dropout (torch nn.Dropout2d): whole feature maps zeroed with
    prob `rate`, survivors scaled by 1/(1-rate). The reference's vector
    Encoder applies it to each stage output in train mode
    (reference: vgg_64.py:68-79, constructed from --dropout at
    dynamics.py:107)."""
    keep = 1.0 - rate
    k = jax.random.fold_in(rng, salt)
    m = jax.random.bernoulli(k, keep, (h.shape[0], 1, 1, h.shape[-1]))
    return h * m.astype(h.dtype) / keep


def encoder(params, state, x, train, dropout_rate=None, dropout_rng=None):
    use_drop = train and dropout_rate is not None and dropout_rng is not None

    def drop(h, salt):
        return _dropout2d(h, dropout_rate, dropout_rng, salt) if use_drop else h

    ns = {}
    h1, ns["c1"] = nn.vgg_stack(params["c1"], state["c1"], x, train)
    h1 = drop(h1, 1)
    h2, ns["c2"] = nn.vgg_stack(params["c2"], state["c2"], nn.max_pool2(h1), train)
    h2 = drop(h2, 2)
    h3, ns["c3"] = nn.vgg_stack(params["c3"], state["c3"], nn.max_pool2(h2), train)
    h3 = drop(h3, 3)
    h4, ns["c4"] = nn.vgg_stack(params["c4"], state["c4"], nn.max_pool2(h3), train)
    h4 = drop(h4, 4)
    h5 = nn.conv2d(params["c5"]["conv"], nn.max_pool2(h4), padding="VALID")
    h5, bn_s = nn.batchnorm(params["c5"]["bn"], state["c5"]["bn"], h5, train)
    ns["c5"] = {"bn": bn_s}
    h5 = nn.tanh(h5)
    return h5.reshape(h5.shape[0], -1), [h1, h2, h3, h4], ns


# ---------------------------------------------------------------------------
# Vector Decoder: g_dim vector + skips -> (H, W, nc) (reference:
# vgg_64.py:146-193)


def decoder_init(key, g_dim, nc, feat_hw=(4, 4)):
    ks = jax.random.split(key, 7)
    params, state = {}, {}
    fh, fw = feat_hw
    params["upc1"] = {"conv": nn.conv_init(ks[0], fh, fw, g_dim, 512)}
    bn_p, bn_s = nn.batchnorm_init(ks[1], 512)
    params["upc1"]["bn"] = bn_p
    state["upc1"] = {"bn": bn_s}
    params["upc2"], state["upc2"] = nn.vgg_stack_init(ks[2], [512 * 2, 512, 512, 256])
    params["upc3"], state["upc3"] = nn.vgg_stack_init(ks[3], [256 * 2, 256, 256, 128])
    params["upc4"], state["upc4"] = nn.vgg_stack_init(ks[4], [128 * 2, 128, 64])
    params["upc5"], state["upc5"] = nn.vgg_stack_init(ks[5], [64 * 2, 64])
    params["out"] = nn.conv_init(ks[6], 3, 3, 64, nc)
    return params, state


def _conv_transpose_valid(p, x):
    """stride-1 VALID transpose conv: 1x1 -> (kh, kw)."""
    dn = lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(1, 1), padding="VALID",
        dimension_numbers=dn,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def decoder(params, state, vec, skips, train):
    ns = {}
    h1, h2, h3, h4 = skips
    x = vec.reshape(vec.shape[0], 1, 1, -1)
    d1 = _conv_transpose_valid(params["upc1"]["conv"], x)
    d1, bn_s = nn.batchnorm(params["upc1"]["bn"], state["upc1"]["bn"], d1, train)
    ns["upc1"] = {"bn": bn_s}
    d1 = nn.leaky_relu(d1)
    up1 = nn.upsample_nearest2(d1)
    d2, ns["upc2"] = nn.vgg_stack(
        params["upc2"], state["upc2"], jnp.concatenate([up1, h4], -1), train
    )
    up2 = nn.upsample_nearest2(d2)
    d3, ns["upc3"] = nn.vgg_stack(
        params["upc3"], state["upc3"], jnp.concatenate([up2, h3], -1), train
    )
    up3 = nn.upsample_nearest2(d3)
    d4, ns["upc4"] = nn.vgg_stack(
        params["upc4"], state["upc4"], jnp.concatenate([up3, h2], -1), train
    )
    up4 = nn.upsample_nearest2(d4)
    d5, ns["upc5"] = nn.vgg_stack(
        params["upc5"], state["upc5"], jnp.concatenate([up4, h1], -1), train
    )
    out = nn.sigmoid(nn.conv2d(params["out"], d5))
    return out, ns
