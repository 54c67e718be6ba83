"""Reconstruction losses, robot-aware "don't-care" criteria, and KL.

Re-derives the reference loss math (reference: src/prediction/losses.py:11-106)
in mask-multiply form — no boolean indexing or in-place ops, so every loss
fuses into the jitted training/rollout graph:

    dontcare(x, y, m) = mean_b( sum(|y - x| * w(m)) / (#world_px(m) + 1) )
    with w(m) = robot_weight on robot pixels, 1 elsewhere.

Shapes are NHWC: prediction/target (B, H, W, C), mask (B, H, W, 1).
All reductions accumulate in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def mse_criterion(prediction, target):
    """Plain MSE (reference: losses.py:11)."""
    p, t = _f32(prediction, target)
    return jnp.mean((t - p) ** 2)


def l1_criterion(prediction, target, batch_weight=None):
    """L1; optional per-batch-element weights (reference: losses.py:13-19)."""
    p, t = _f32(prediction, target)
    diff = jnp.abs(t - p)
    if batch_weight is None:
        return jnp.mean(diff)
    per_elem = jnp.mean(diff, axis=tuple(range(1, diff.ndim)))
    return jnp.mean(batch_weight.astype(jnp.float32) * per_elem)


def _mask_weights(mask, channels, robot_weight):
    """(B,H,W,1) bool-ish mask -> per-pixel weight map + world pixel count."""
    m = mask.astype(jnp.float32) > 0.5
    m3 = jnp.broadcast_to(m, m.shape[:3] + (channels,))
    weights = jnp.where(m3, robot_weight, 1.0)
    num_world = jnp.sum(~m3, axis=(1, 2, 3)).astype(jnp.float32) + 1.0
    return weights, num_world


def dontcare_mse_criterion(prediction, target, mask, robot_weight):
    """Robot pixels weighted by robot_weight (default 0 => dropped),
    normalized by world-pixel count + 1 (reference: losses.py:21-33).

    Note the reference scales the *difference* before squaring, so the robot
    weight enters squared; reproduced exactly."""
    p, t = _f32(prediction, target)
    weights, num_world = _mask_weights(mask, p.shape[-1], robot_weight)
    sq = ((t - p) * weights) ** 2
    return jnp.mean(jnp.sum(sq, axis=(1, 2, 3)) / num_world)


def dontcare_l1_criterion(prediction, target, mask, robot_weight, batch_weight=None):
    """(reference: losses.py:35-50)"""
    p, t = _f32(prediction, target)
    weights, num_world = _mask_weights(mask, p.shape[-1], robot_weight)
    ab = jnp.abs((t - p) * weights)
    per_elem = jnp.sum(ab, axis=(1, 2, 3)) / num_world
    if batch_weight is not None:
        per_elem = batch_weight.astype(jnp.float32) * per_elem
    return jnp.mean(per_elem)


def robot_mse_criterion(prediction, target, mask):
    """MSE restricted to robot pixels (reference: losses.py:52-64)."""
    p, t = _f32(prediction, target)
    m = mask.astype(jnp.float32) > 0.5
    m3 = jnp.broadcast_to(m, p.shape[:3] + (p.shape[-1],))
    sq = jnp.where(m3, (t - p) ** 2, 0.0)
    num_robot = jnp.sum(m3, axis=(1, 2, 3)).astype(jnp.float32) + 1.0
    return jnp.mean(jnp.sum(sq, axis=(1, 2, 3)) / num_robot)


def world_mse_criterion(prediction, target, mask):
    """MSE restricted to world pixels (reference: losses.py:66-78)."""
    p, t = _f32(prediction, target)
    m = mask.astype(jnp.float32) > 0.5
    m3 = jnp.broadcast_to(m, p.shape[:3] + (p.shape[-1],))
    sq = jnp.where(m3, 0.0, (t - p) ** 2)
    num_world = jnp.sum(~m3, axis=(1, 2, 3)).astype(jnp.float32) + 1.0
    return jnp.mean(jnp.sum(sq, axis=(1, 2, 3)) / num_world)


def world_psnr_criterion(prediction, target, mask):
    """Per-batch-element PSNR over world pixels (reference: losses.py:80-94)."""
    p, t = _f32(prediction, target)
    m = mask.astype(jnp.float32) > 0.5
    m3 = jnp.broadcast_to(m, p.shape[:3] + (p.shape[-1],))
    sq = jnp.where(m3, 0.0, (t - p) ** 2)
    num_world = jnp.sum(~m3, axis=(1, 2, 3)).astype(jnp.float32) + 1.0
    batch_mse = jnp.sum(sq, axis=(1, 2, 3)) / num_world
    return 10.0 * jnp.log(1.0 / batch_mse) / jnp.log(10.0)


def kl_criterion(mu1, logvar1, mu2, logvar2, batch_size):
    """Analytic KL(N1 || N2), summed and divided by batch size
    (reference: losses.py:97-106)."""
    mu1, logvar1, mu2, logvar2 = _f32(mu1, logvar1, mu2, logvar2)
    sigma1 = jnp.exp(0.5 * logvar1)
    sigma2 = jnp.exp(0.5 * logvar2)
    kld = (
        jnp.log(sigma2 / sigma1)
        + (jnp.exp(logvar1) + (mu1 - mu2) ** 2) / (2 * jnp.exp(logvar2))
        - 0.5
    )
    return jnp.sum(kld) / batch_size


def zero_robot_region(mask, image):
    """Zero out robot pixels (reference: src/utils/image.py:5-13).
    mask (B,H,W,1), image (B,H,W,C)."""
    keep = 1.0 - (mask.astype(jnp.float32) > 0.5).astype(image.dtype)
    return image * keep


# ---------------------------------------------------------------------------
# SAVP-family adversarial / VAE losses (reference: robonet/robonet/
# video_prediction/losses.py:14-45 and ops.py:1007-1015). The vendored
# reference checkout ships these loss functions but no discriminator graph
# (grep-verified: no `discriminator` definition exists anywhere under
# robonet/), so the loss family — the only live GAN surface — is what gets
# parity here. All three reference gan_loss_type branches are reproduced.
# ---------------------------------------------------------------------------


def _sigmoid_xent(logits, labels):
    """Numerically stable sigmoid cross-entropy, elementwise
    (tf.nn.sigmoid_cross_entropy_with_logits semantics)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_criterion(logits, labels: float, gan_loss_type: str = "LSGAN"):
    """GAN loss vs a broadcast scalar label (reference: losses.py:14-39).

    labels is 1.0 (or 1 - smooth) for real data, 0.0 for fake. 'GAN' with a
    smoothed label subtracts the label entropy (sigmoid_kl_with_logits,
    reference ops.py:1007-1015) so the minimum sits at zero.
    """
    logits = logits.astype(jnp.float32)
    if gan_loss_type == "GAN":
        if labels in (0.0, 1.0):
            return jnp.mean(_sigmoid_xent(logits, labels))
        import numpy as np

        entropy = -labels * np.log(labels) - (1.0 - labels) * np.log(
            1.0 - labels
        )
        return jnp.mean(_sigmoid_xent(logits, labels) - entropy)
    if gan_loss_type == "LSGAN":
        return jnp.mean(jnp.square(logits - labels))
    if gan_loss_type == "SNGAN":
        if labels == 0.0:
            return jnp.mean(jnp.logaddexp(0.0, logits))
        if labels == 1.0:
            return jnp.mean(jnp.logaddexp(0.0, -logits))
        raise NotImplementedError("SNGAN labels must be 0 or 1")
    raise ValueError(f"Unknown GAN loss type {gan_loss_type}")


def vae_kl_loss(mu, log_sigma_sq):
    """KL(N(mu, sigma) || N(0, 1)) with the reference's mean-over-batch,
    sum-over-latent reduction (reference: losses.py:42-45)."""
    mu, log_sigma_sq = _f32(mu, log_sigma_sq)
    return -0.5 * jnp.mean(
        jnp.sum(
            1.0 + log_sigma_sq - jnp.square(mu) - jnp.exp(log_sigma_sq),
            axis=-1,
        )
    )
