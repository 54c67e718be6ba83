"""CycleGAN baseline tests (reference: src/cyclegan/models/
cycle_gan_model.py:8-194, networks.py:119-615)."""

import jax
import numpy as np
import pytest

from robot_aware_control_tpu.baselines.cyclegan import (
    CycleGAN,
    CycleGANTranslator,
    discriminator,
    discriminator_init,
    generator,
    generator_init,
)


def test_generator_shapes_and_range(rng):
    params = generator_init(jax.random.PRNGKey(0), n_blocks=2)
    x = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    y = np.asarray(generator(params, x))
    assert y.shape == x.shape
    assert y.min() >= -1 and y.max() <= 1


def test_discriminator_patch_output(rng):
    params = discriminator_init(jax.random.PRNGKey(0))
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = np.asarray(discriminator(params, x))
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.shape[1] > 1  # patch map, not scalar


def test_cyclegan_train_step_decreases_g_loss(rng):
    model = CycleGAN(jax.random.PRNGKey(0), lr=1e-3, n_blocks=1)
    a = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    b = np.clip(a + 0.3, -1, 1)
    losses = [model.train_step(a, b)["g_loss"] for _ in range(5)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_translator_roundtrip_range(rng):
    model = CycleGAN(jax.random.PRNGKey(0), n_blocks=1)
    tr = CycleGANTranslator(model.params, "ab")
    img = rng.rand(16, 16, 3).astype(np.float32)
    out = tr(img)
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1
