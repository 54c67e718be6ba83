"""CycleGAN domain-transfer baseline.

The reference vendors pytorch-CycleGAN-and-pix2pix (reference:
src/cyclegan/models/cycle_gan_model.py:8-194, networks.py:119-615) and uses
it to translate goal/observation images between robot domains for the
zero-shot transfer baseline (reference: src/mbrl/push_episode_runner.py:
264-283, --cyclegan flag src/config/__init__.py:147).

TPU-native rebuild (not a port of the torch module graph):
  * ResNet generator (c7s1-64, d128, d256, n resnet blocks, u128, u64,
    c7s1-3, tanh) and 70x70 PatchGAN discriminator as pure param-pytree
    functions, instance-normalized, reflection-padded.
  * One jitted `train_step` updates both generators and both
    discriminators (LSGAN + cycle L1 + identity L1) in a single device
    program; the 50-image fake pool lives host-side like the original.
  * `CycleGANTranslator` is the inference wrapper the episode runners call.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robot_aware_control_tpu.ops import nn


# ---------------------------------------------------------------------------
# layers


def instance_norm(x, params, eps=1e-5):
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def in_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _conv(params, x, stride=1, padding="SAME"):
    return nn.conv2d(params, x, stride=stride, padding=padding)


def _refl_conv(params, x, k, stride=1):
    p = k // 2
    x = jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")
    return nn.conv2d(params, x, stride=stride, padding="VALID")


def _deconv(params, x):
    """stride-2 transpose conv (u128/u64 blocks)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, params["w"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_transpose(
        x, params["w"].astype(x.dtype), strides=(2, 2), padding="SAME",
        dimension_numbers=dn,
    )
    return y + params["b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# ResNet generator (reference: networks.py:315-395)


def generator_init(key, in_ch=3, ngf=64, n_blocks=6):
    ks = iter(jax.random.split(key, 8 + 2 * n_blocks))
    p = {}
    p["c1"] = nn.conv_init(next(ks), 7, 7, in_ch, ngf)
    p["c1_in"] = in_init(ngf)
    p["d1"] = nn.conv_init(next(ks), 3, 3, ngf, ngf * 2)
    p["d1_in"] = in_init(ngf * 2)
    p["d2"] = nn.conv_init(next(ks), 3, 3, ngf * 2, ngf * 4)
    p["d2_in"] = in_init(ngf * 4)
    p["blocks"] = []
    for _ in range(n_blocks):
        p["blocks"].append({
            "c1": nn.conv_init(next(ks), 3, 3, ngf * 4, ngf * 4),
            "in1": in_init(ngf * 4),
            "c2": nn.conv_init(next(ks), 3, 3, ngf * 4, ngf * 4),
            "in2": in_init(ngf * 4),
        })
    p["u1"] = nn.conv_init(next(ks), 3, 3, ngf * 2, ngf * 4)  # HWIO out=in/2
    p["u1"] = {"w": jnp.swapaxes(p["u1"]["w"], 2, 3), "b": jnp.zeros(ngf * 2)}
    p["u1_in"] = in_init(ngf * 2)
    p["u2"] = nn.conv_init(next(ks), 3, 3, ngf, ngf * 2)
    p["u2"] = {"w": jnp.swapaxes(p["u2"]["w"], 2, 3), "b": jnp.zeros(ngf)}
    p["u2_in"] = in_init(ngf)
    p["out"] = nn.conv_init(next(ks), 7, 7, ngf, in_ch)
    return p


def generator(params, x):
    """x (B,H,W,3) in [-1,1] -> (B,H,W,3) in [-1,1]."""
    h = jax.nn.relu(instance_norm(_refl_conv(params["c1"], x, 7), params["c1_in"]))
    h = jax.nn.relu(instance_norm(_conv(params["d1"], h, 2), params["d1_in"]))
    h = jax.nn.relu(instance_norm(_conv(params["d2"], h, 2), params["d2_in"]))
    for blk in params["blocks"]:
        r = jax.nn.relu(instance_norm(_refl_conv(blk["c1"], h, 3), blk["in1"]))
        r = instance_norm(_refl_conv(blk["c2"], r, 3), blk["in2"])
        h = h + r
    h = jax.nn.relu(instance_norm(_deconv(params["u1"], h), params["u1_in"]))
    h = jax.nn.relu(instance_norm(_deconv(params["u2"], h), params["u2_in"]))
    return jnp.tanh(_refl_conv(params["out"], h, 7))


# ---------------------------------------------------------------------------
# 70x70 PatchGAN discriminator (reference: networks.py:538-583)


def discriminator_init(key, in_ch=3, ndf=64):
    ks = jax.random.split(key, 5)
    return {
        "c1": nn.conv_init(ks[0], 4, 4, in_ch, ndf),
        "c2": nn.conv_init(ks[1], 4, 4, ndf, ndf * 2),
        "c2_in": in_init(ndf * 2),
        "c3": nn.conv_init(ks[2], 4, 4, ndf * 2, ndf * 4),
        "c3_in": in_init(ndf * 4),
        "c4": nn.conv_init(ks[3], 4, 4, ndf * 4, ndf * 8),
        "c4_in": in_init(ndf * 8),
        "out": nn.conv_init(ks[4], 4, 4, ndf * 8, 1),
    }


def discriminator(params, x):
    h = jax.nn.leaky_relu(_conv(params["c1"], x, 2), 0.2)
    h = jax.nn.leaky_relu(instance_norm(_conv(params["c2"], h, 2), params["c2_in"]), 0.2)
    h = jax.nn.leaky_relu(instance_norm(_conv(params["c3"], h, 2), params["c3_in"]), 0.2)
    h = jax.nn.leaky_relu(instance_norm(_conv(params["c4"], h, 1), params["c4_in"]), 0.2)
    return _conv(params["out"], h, 1)


# ---------------------------------------------------------------------------
# CycleGAN model


class CycleGANParams(NamedTuple):
    g_ab: Dict  # A -> B
    g_ba: Dict  # B -> A
    d_a: Dict   # discriminates domain A
    d_b: Dict   # discriminates domain B


def init(key, in_ch=3, ngf=64, ndf=64, n_blocks=6) -> CycleGANParams:
    ks = jax.random.split(key, 4)
    return CycleGANParams(
        g_ab=generator_init(ks[0], in_ch, ngf, n_blocks),
        g_ba=generator_init(ks[1], in_ch, ngf, n_blocks),
        d_a=discriminator_init(ks[2], in_ch, ndf),
        d_b=discriminator_init(ks[3], in_ch, ndf),
    )


def _lsgan(pred, target: float):
    return jnp.mean((pred - target) ** 2)


class CycleGAN:
    """Training container: jitted G/D updates + host-side image pool
    (reference training loop: src/cyclegan/train.py,
    cycle_gan_model.py:104-194)."""

    def __init__(self, key, lr=2e-4, lambda_cycle=10.0, lambda_id=0.5,
                 in_ch=3, n_blocks=6, pool_size=50):
        self.params = init(key, in_ch=in_ch, n_blocks=n_blocks)
        self.lambda_cycle = lambda_cycle
        self.lambda_id = lambda_id
        self.g_tx = optax.adam(lr, b1=0.5)
        self.d_tx = optax.adam(lr, b1=0.5)
        self.g_opt = self.g_tx.init((self.params.g_ab, self.params.g_ba))
        self.d_opt = self.d_tx.init((self.params.d_a, self.params.d_b))
        self._pool_a, self._pool_b = [], []
        self.pool_size = pool_size
        self._rng = np.random.RandomState(0)
        self._g_step = jax.jit(self._make_g_step())
        self._d_step = jax.jit(self._make_d_step())

    # --- generator update ------------------------------------------------
    def _make_g_step(self):
        lc, li = self.lambda_cycle, self.lambda_id

        def loss_fn(gs, ds, real_a, real_b):
            g_ab, g_ba = gs
            d_a, d_b = ds
            fake_b = generator(g_ab, real_a)
            fake_a = generator(g_ba, real_b)
            rec_a = generator(g_ba, fake_b)
            rec_b = generator(g_ab, fake_a)
            idt_a = generator(g_ba, real_a)
            idt_b = generator(g_ab, real_b)
            loss = (
                _lsgan(discriminator(d_b, fake_b), 1.0)
                + _lsgan(discriminator(d_a, fake_a), 1.0)
                + lc * jnp.mean(jnp.abs(rec_a - real_a))
                + lc * jnp.mean(jnp.abs(rec_b - real_b))
                + lc * li * jnp.mean(jnp.abs(idt_a - real_a))
                + lc * li * jnp.mean(jnp.abs(idt_b - real_b))
            )
            return loss, (fake_a, fake_b)

        def step(gs, g_opt, ds, real_a, real_b):
            (loss, fakes), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                gs, ds, real_a, real_b
            )
            updates, g_opt = self.g_tx.update(grads, g_opt, gs)
            gs = optax.apply_updates(gs, updates)
            return gs, g_opt, loss, fakes

        return step

    # --- discriminator update --------------------------------------------
    def _make_d_step(self):
        def loss_fn(ds, real_a, real_b, fake_a, fake_b):
            d_a, d_b = ds
            return 0.5 * (
                _lsgan(discriminator(d_a, real_a), 1.0)
                + _lsgan(discriminator(d_a, fake_a), 0.0)
                + _lsgan(discriminator(d_b, real_b), 1.0)
                + _lsgan(discriminator(d_b, fake_b), 0.0)
            )

        def step(ds, d_opt, real_a, real_b, fake_a, fake_b):
            loss, grads = jax.value_and_grad(loss_fn)(
                ds, real_a, real_b, fake_a, fake_b
            )
            updates, d_opt = self.d_tx.update(grads, d_opt, ds)
            ds = optax.apply_updates(ds, updates)
            return ds, d_opt, loss

        return step

    def _pool(self, pool, fakes):
        """50-image history pool (reference: util/image_pool.py semantics)."""
        out = []
        for f in np.asarray(fakes):
            if len(pool) < self.pool_size:
                pool.append(f)
                out.append(f)
            elif self._rng.rand() > 0.5:
                i = self._rng.randint(len(pool))
                out.append(pool[i])
                pool[i] = f
            else:
                out.append(f)
        return jnp.asarray(np.stack(out))

    def train_step(self, real_a, real_b):
        """real_a/real_b (B,H,W,3) in [-1,1]. Returns losses dict."""
        real_a = jnp.asarray(real_a)
        real_b = jnp.asarray(real_b)
        gs = (self.params.g_ab, self.params.g_ba)
        ds = (self.params.d_a, self.params.d_b)
        gs, self.g_opt, g_loss, (fake_a, fake_b) = self._g_step(
            gs, self.g_opt, ds, real_a, real_b
        )
        fake_a = self._pool(self._pool_a, fake_a)
        fake_b = self._pool(self._pool_b, fake_b)
        ds, self.d_opt, d_loss = self._d_step(
            ds, self.d_opt, real_a, real_b, fake_a, fake_b
        )
        self.params = CycleGANParams(gs[0], gs[1], ds[0], ds[1])
        return {"g_loss": float(g_loss), "d_loss": float(d_loss)}


class CycleGANTranslator:
    """Inference wrapper used by the runners to translate observations /
    goals across robot domains (reference: push_episode_runner.py:264-283)."""

    def __init__(self, params: CycleGANParams, direction: str = "ab"):
        self.params = params
        gen = params.g_ab if direction == "ab" else params.g_ba
        self._fn = jax.jit(functools.partial(generator, gen))

    def __call__(self, img):
        """img (H,W,3) or (B,H,W,3) float [0,1] -> same shape [0,1]."""
        x = jnp.asarray(img, jnp.float32)
        single = x.ndim == 3
        if single:
            x = x[None]
        y = (self._fn(x * 2.0 - 1.0) + 1.0) / 2.0
        return np.asarray(y[0] if single else y)
