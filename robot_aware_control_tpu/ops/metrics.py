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
