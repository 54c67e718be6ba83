"""PSNR/SSIM golden tests against a torch oracle implementing the
reference's conv-SSIM (reference: src/utils/metrics.py:14-78)."""

import math

import numpy as np
import torch
import torch.nn.functional as F

from robot_aware_control_tpu.ops.metrics import psnr, ssim, true_psnr


def _torch_ssim_map(img1, img2, window_size=11, sigma=1.5):
    """Reference-style SSIM map (metrics.py:14-57), NCHW torch."""
    xs = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    w2d = torch.outer(g, g)
    c = img1.shape[1]
    kernel = w2d.expand(c, 1, window_size, window_size)
    pad = window_size // 2

    def filt(z):
        return F.conv2d(z, kernel, padding=pad, groups=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )


def test_ssim_matches_torch(rng):
    a = rng.rand(2, 16, 16, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(2, 16, 16, 3).astype(np.float32), 0, 1)
    got = np.asarray(ssim(a, b))
    want = _torch_ssim_map(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)),
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_psnr_reference_quirk(rng):
    """The reference maps [0,1] inputs through (x+1)/2, inflating PSNR by
    20*log10(2) vs the textbook value (metrics.py:59-78) — reproduced."""
    a = rng.rand(2, 8, 8, 3).astype(np.float32)
    b = rng.rand(2, 8, 8, 3).astype(np.float32)
    got = np.asarray(psnr(a, b))
    tp = np.asarray(true_psnr(a, b))
    np.testing.assert_allclose(got - tp, 20 * math.log10(2), atol=1e-4)


def test_psnr_identical_is_inf():
    a = np.full((1, 8, 8, 3), 0.5, np.float32)
    assert np.isinf(np.asarray(psnr(a, a.copy()))).all()


def test_cosine_distance_properties(rng):
    """SAVP-family metrics (reference: robonet video_prediction/metrics.py)."""
    import jax.numpy as jnp

    from robot_aware_control_tpu.ops.metrics import (
        cosine_distance,
        expected_pixel_distance,
        expected_square_pixel_distance,
    )

    a = jnp.asarray(rng.randn(4, 16).astype("float32"))
    assert float(cosine_distance(a, a)) < 1e-6
    assert float(cosine_distance(a, -a)) > 1.9

    # delta pixel distributions: distance equals euclidean pixel offset
    import numpy as np

    real = np.zeros((1, 1, 8, 8, 1), np.float32)
    pred = np.zeros((1, 1, 8, 8, 1), np.float32)
    real[0, 0, 2, 2, 0] = 1.0
    pred[0, 0, 5, 6, 0] = 1.0
    d = float(np.asarray(expected_pixel_distance(real, pred))[0, 0, 0])
    assert abs(d - np.hypot(3, 4)) < 1e-5
    # same trailing-K (B, T, H, W, K) convention as expected_pixel_distance
    sq = float(np.asarray(expected_square_pixel_distance(real, pred))[0, 0, 0])
    assert abs(sq - 25.0) < 1e-4
    assert np.asarray(expected_square_pixel_distance(real, pred)).shape == (
        1, 1, 1,
    )
