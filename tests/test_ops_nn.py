"""Numerical tests of the functional layer library against torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.ops import nn as jnn


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 6, 8, 5).astype(np.float32)
    w = rng.randn(3, 3, 5, 7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    y = jnn.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    yt = F.conv2d(
        torch.from_numpy(to_nchw(x)),
        torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
        torch.from_numpy(b),
        padding=1,
    ).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), yt, rtol=1e-4, atol=1e-4)


def test_batchnorm_train_and_eval(rng):
    x = rng.randn(4, 6, 8, 3).astype(np.float32) * 2 + 1
    params = {"scale": jnp.asarray(rng.randn(3).astype(np.float32)),
              "bias": jnp.asarray(rng.randn(3).astype(np.float32))}
    state = {"mean": jnp.zeros(3), "var": jnp.ones(3)}

    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
    bn.train()
    yt = bn(torch.from_numpy(to_nchw(x))).detach().numpy()

    y, new_state = jnn.batchnorm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), yt, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    bn.eval()
    yt_eval = bn(torch.from_numpy(to_nchw(x))).detach().numpy()
    y_eval, _ = jnn.batchnorm(params, new_state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_eval), (0, 3, 1, 2)), yt_eval, rtol=1e-4, atol=1e-4
    )


def test_max_pool_and_upsample(rng):
    x = rng.randn(2, 6, 8, 3).astype(np.float32)
    y = jnn.max_pool2(jnp.asarray(x))
    yt = F.max_pool2d(torch.from_numpy(to_nchw(x)), 2, 2).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), yt)

    u = jnn.upsample_nearest2(jnp.asarray(x))
    ut = F.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(u), (0, 3, 1, 2)), ut)


def test_leaky_relu(rng):
    x = rng.randn(10).astype(np.float32)
    y = jnn.leaky_relu(jnp.asarray(x))
    yt = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    np.testing.assert_allclose(np.asarray(y), yt)


def test_vgg_layer_shapes(rng):
    key = jax.random.PRNGKey(0)
    p, s = jnn.vgg_layer_init(key, 3, 16)
    x = jnp.asarray(rng.randn(2, 6, 8, 3).astype(np.float32))
    y, ns = jnn.vgg_layer(p, s, x, train=True)
    assert y.shape == (2, 6, 8, 16)
    assert not np.allclose(np.asarray(ns["bn"]["mean"]), 0)


def test_mlp_encoder(rng):
    key = jax.random.PRNGKey(1)
    p = jnn.mlp_encoder_init(key, 5, 4, 32)
    x = jnp.asarray(rng.randn(7, 5).astype(np.float32))
    y = jnn.mlp_encoder(p, x)
    assert y.shape == (7, 4)
