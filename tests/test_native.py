"""Native C++ resize kernel tests (native/resize.cpp via data/native.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from robot_aware_control_tpu.data import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_bilinear_matches_torch(rng):
    img = rng.rand(96, 128, 3).astype(np.float32)
    got = native.bilinear_resize(img, 64, 48)
    want = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1))[None],
        size=(48, 64), mode="bilinear", align_corners=False,
    )[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_bilinear_batch_and_grayscale(rng):
    imgs = rng.rand(3, 24, 32, 1).astype(np.float32)
    out = native.bilinear_resize_batch(imgs, 16, 12)
    assert out.shape == (3, 12, 16, 1)
    single = native.bilinear_resize(imgs[0, ..., 0], 16, 12)
    np.testing.assert_allclose(out[0, ..., 0], single, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_upscale_identity_region(rng):
    img = np.full((8, 8), 0.5, np.float32)
    out = native.bilinear_resize(img, 16, 16)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
