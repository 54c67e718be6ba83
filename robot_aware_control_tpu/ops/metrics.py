"""Evaluation metrics: PSNR and SSIM (reference: src/utils/metrics.py:45-78).

Pure jnp implementations so metrics run inside the jitted eval step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax
import numpy as np


def psnr(estimates, targets, data_dims=3):
    """PSNR exactly as defined by the reference (metrics.py:59-78).

    NOTE: the reference maps inputs through (x+1)/2 even though callers pass
    [0,1] images (trainer.py:689), which inflates the reported value by
    20*log10(2) ~= +6.02 dB relative to a textbook PSNR. Reproduced verbatim
    so numbers are comparable; use `true_psnr` for the standard definition.
    """
    est = (estimates.astype(jnp.float32) + 1) / 2
    tgt = (targets.astype(jnp.float32) + 1) / 2
    mse = (est - tgt) ** 2
    axes = tuple(range(mse.ndim))[-data_dims:]
    mse_mean = jnp.mean(mse, axis=axes)
    return 10 * jnp.log(1.0 / mse_mean) / math.log(10)


def true_psnr(estimates, targets, data_dims=3, max_val=1.0):
    est, tgt = estimates.astype(jnp.float32), targets.astype(jnp.float32)
    mse = (est - tgt) ** 2
    axes = tuple(range(mse.ndim))[-data_dims:]
    mse_mean = jnp.mean(mse, axis=axes)
    return 10 * jnp.log(max_val ** 2 / mse_mean) / math.log(10)


def _gaussian_window(window_size=11, sigma=1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def ssim(img1, img2, window_size=11):
    """Per-pixel SSIM map via depthwise gaussian filtering, matching the
    torch implementation's constants (reference: metrics.py:14-57).

    img: (B, H, W, C) in [0,1]. Returns the SSIM map (B, H, W, C)."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    c = x.shape[-1]
    w = _gaussian_window(window_size)
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(z):
        dn = lax.conv_dimension_numbers(z.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        # HIGHEST precision: the TPU's default reduced-precision f32 conv
        # makes filt(x*x) - mu^2 catastrophically cancel (variances go
        # negative, SSIM > 1)
        return lax.conv_general_dilated(
            z, kernel, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c, precision=lax.Precision.HIGHEST,
        )

    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )


# ---------------------------------------------------------------------------
# SAVP/robonet metric family (reference: robonet/robonet/video_prediction/
# metrics.py). Pure math — runnable inside jitted eval steps.


def normalize_tensor(tensor, eps=1e-10):
    """L2-normalize over the last axis (reference: metrics.py:253-256)."""
    t = tensor.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    return t / (norm + eps)


def cosine_similarity(t0, t1):
    """Dot product of L2-normalized tensors over the last axis
    (reference: metrics.py:258-263)."""
    return jnp.sum(normalize_tensor(t0) * normalize_tensor(t1), axis=-1)


def cosine_distance(t0, t1):
    """(reference: metrics.py:265-272)"""
    return jnp.mean(1.0 - cosine_similarity(t0, t1))


def expected_pixel_distance(real_dist, pred_dist):
    """E_pred[ || p - argmax(real) || ] over pixel distributions
    (B, T, H, W, K) — the DNA-family designation metric
    (reference: metrics.py:13-22)."""
    r = real_dist.astype(jnp.float32)
    p = pred_dist.astype(jnp.float32)
    h, w = r.shape[-3], r.shape[-2]
    obj_w = jnp.max(jnp.argmax(r, axis=-2), axis=-2).astype(jnp.float32)
    obj_h = jnp.max(jnp.argmax(r, axis=-3), axis=-2).astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32).reshape(1, 1, -1, 1, 1)
    xs = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, 1, -1, 1)
    dist = jnp.sqrt(
        (ys - obj_h[..., None, None, :]) ** 2
        + (xs - obj_w[..., None, None, :]) ** 2
    )
    return jnp.sum(dist * p, axis=(-3, -2))


def expected_square_pixel_distance(real_dist, pred_dist):
    """E[(p - p_true)^T (p - p_true)] between pixel distributions shaped
    (..., H, W, K) — same trailing-K convention as its sibling
    expected_pixel_distance (reference: metrics.py:25-47 reduces the H/W
    axes at -3/-2 and keeps the kernel axis)."""
    def moments(t):
        """t (..., H, W, K) normalized pixel dist -> ((..., K, 2), (..., K))."""
        t = jnp.asarray(t, jnp.float32)
        h, w = t.shape[-3], t.shape[-2]
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[:, None]
        row = jnp.sum(t, axis=-2)  # (..., H, K)
        col = jnp.sum(t, axis=-3)  # (..., W, K)
        mh = jnp.sum(ys * row, axis=-2)
        mw = jnp.sum(xs * col, axis=-2)
        sh = jnp.sum((ys ** 2) * row, axis=-2)
        sw = jnp.sum((xs ** 2) * col, axis=-2)
        return jnp.stack([mh, mw], -1), sh + sw

    mp, sq_p = moments(pred_dist)
    mr, sq_r = moments(real_dist)
    return sq_p - 2.0 * jnp.sum(mp * mr, -1) + sq_r


def perceptual_cosine_distance(image0, image1, features_fn):
    """VGG-style perceptual distance with a pluggable feature extractor
    (reference: metrics.py:275-293 uses pretrained VGG19 — weights are an
    offline blocker here, so callers supply `features_fn(images) ->
    [(B, ..., C) feature tensors]`; any conv stack works)."""
    total = 0.0
    f0s, f1s = features_fn(image0), features_fn(image1)
    for f0, f1 in zip(f0s, f1s):
        total = total + cosine_distance(
            f0.reshape(f0.shape[0], -1, f0.shape[-1]),
            f1.reshape(f1.shape[0], -1, f1.shape[-1]),
        )
    return total / len(f0s)
