"""Loss/metric parity tests against torch oracles implementing the reference
formulas (reference: src/prediction/losses.py, src/utils/metrics.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from robot_aware_control_tpu.ops import losses as L
from robot_aware_control_tpu.ops import metrics as M


def _torch_dontcare_l1(pred, tgt, mask, w, batch_weight=None):
    # independent oracle implementing losses.py:35-50 semantics
    diff = tgt - pred
    m = mask.bool().repeat(1, 1, 1, 3)
    diff = torch.where(m, diff * w, diff)
    num_world = (~m).sum((1, 2, 3)).float() + 1
    per = diff.abs().sum((1, 2, 3)) / num_world
    if batch_weight is not None:
        per = batch_weight * per
    return per.mean()


def test_dontcare_l1(rng):
    pred = rng.rand(4, 6, 8, 3).astype(np.float32)
    tgt = rng.rand(4, 6, 8, 3).astype(np.float32)
    mask = (rng.rand(4, 6, 8, 1) > 0.7).astype(np.float32)
    got = L.dontcare_l1_criterion(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask), 0.0)
    want = _torch_dontcare_l1(torch.tensor(pred), torch.tensor(tgt), torch.tensor(mask), 0.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    bw = rng.rand(4).astype(np.float32)
    got = L.dontcare_l1_criterion(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask), 0.5, jnp.asarray(bw)
    )
    want = _torch_dontcare_l1(
        torch.tensor(pred), torch.tensor(tgt), torch.tensor(mask), 0.5, torch.tensor(bw)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_dontcare_mse(rng):
    pred = rng.rand(3, 6, 8, 3).astype(np.float32)
    tgt = rng.rand(3, 6, 8, 3).astype(np.float32)
    mask = (rng.rand(3, 6, 8, 1) > 0.5).astype(np.float32)
    got = L.dontcare_mse_criterion(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask), 0.0)
    diff = torch.tensor(tgt) - torch.tensor(pred)
    m = torch.tensor(mask).bool().repeat(1, 1, 1, 3)
    diff = torch.where(m, diff * 0.0, diff)
    nw = (~m).sum((1, 2, 3)).float() + 1
    want = ((diff ** 2).sum((1, 2, 3)) / nw).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_robot_world_mse(rng):
    pred = rng.rand(3, 6, 8, 3).astype(np.float32)
    tgt = rng.rand(3, 6, 8, 3).astype(np.float32)
    mask = (rng.rand(3, 6, 8, 1) > 0.5).astype(np.float32)
    m = torch.tensor(mask).bool().repeat(1, 1, 1, 3)
    diff = torch.tensor(tgt) - torch.tensor(pred)

    robot_sq = torch.where(m, diff ** 2, torch.zeros(()))
    nr = m.sum((1, 2, 3)).float() + 1
    want_r = (robot_sq.sum((1, 2, 3)) / nr).mean()
    got_r = L.robot_mse_criterion(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got_r), float(want_r), rtol=1e-5)

    world_sq = torch.where(m, torch.zeros(()), diff ** 2)
    nw = (~m).sum((1, 2, 3)).float() + 1
    want_w = (world_sq.sum((1, 2, 3)) / nw).mean()
    got_w = L.world_mse_criterion(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got_w), float(want_w), rtol=1e-5)


def test_kl_criterion(rng):
    mu1 = rng.randn(4, 8).astype(np.float32)
    lv1 = rng.randn(4, 8).astype(np.float32)
    mu2 = rng.randn(4, 8).astype(np.float32)
    lv2 = rng.randn(4, 8).astype(np.float32)
    got = L.kl_criterion(*map(jnp.asarray, (mu1, lv1, mu2, lv2)), 4)
    t = [torch.tensor(v) for v in (mu1, lv1, mu2, lv2)]
    s1, s2 = (t[1] * 0.5).exp(), (t[3] * 0.5).exp()
    kld = torch.log(s2 / s1) + (t[1].exp() + (t[0] - t[2]) ** 2) / (2 * t[3].exp()) - 0.5
    np.testing.assert_allclose(float(got), float(kld.sum() / 4), rtol=1e-5)


def test_zero_robot_region(rng):
    img = rng.rand(2, 4, 4, 3).astype(np.float32)
    mask = np.zeros((2, 4, 4, 1), np.float32)
    mask[0, 1, 2, 0] = 1
    out = np.asarray(L.zero_robot_region(jnp.asarray(mask), jnp.asarray(img)))
    assert np.all(out[0, 1, 2] == 0)
    assert np.allclose(out[1], img[1])


def test_psnr_matches_reference_definition(rng):
    est = rng.rand(2, 6, 8, 3).astype(np.float32)
    tgt = rng.rand(2, 6, 8, 3).astype(np.float32)
    got = M.psnr(jnp.asarray(est), jnp.asarray(tgt))
    e = (torch.tensor(est) + 1) / 2
    t = (torch.tensor(tgt) + 1) / 2
    mse = ((e - t) ** 2).mean((1, 2, 3))
    want = 10 * torch.log(1.0 / mse) / np.log(10)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)
    # sanity: true_psnr of identical images is inf-ish large
    assert float(M.true_psnr(jnp.asarray(est), jnp.asarray(est)).mean()) > 50


def test_ssim_range_and_identity(rng):
    a = rng.rand(2, 16, 16, 3).astype(np.float32)
    s_id = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(a)))
    assert s_id.mean() > 0.99
    b = rng.rand(2, 16, 16, 3).astype(np.float32)
    s_ab = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert s_ab.mean() < s_id.mean()


def test_ssim_matches_torch_conv_oracle(rng):
    """Oracle: depthwise gaussian conv SSIM identical to metrics.py:14-57."""
    from math import exp

    a = rng.rand(1, 12, 12, 3).astype(np.float32)
    b = rng.rand(1, 12, 12, 3).astype(np.float32)

    window_size, sigma, C = 11, 1.5, 3
    g = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2)) for x in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    window = w2.expand(C, 1, window_size, window_size).contiguous()

    ta = torch.tensor(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.tensor(np.transpose(b, (0, 3, 1, 2)))
    f = lambda z: torch.nn.functional.conv2d(z, window, padding=window_size // 2, groups=C)
    mu1, mu2 = f(ta), f(tb)
    s1 = f(ta * ta) - mu1 ** 2
    s2 = f(tb * tb) - mu2 ** 2
    s12 = f(ta * tb) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    want = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))

    got = np.transpose(np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b))), (0, 3, 1, 2))
    # float32 cancellation in the E[x^2]-mu^2 variance terms amplifies near
    # zero-variance windows; 5e-3 absolute agreement is ample for an eval
    # metric.
    np.testing.assert_allclose(got, want.numpy(), atol=5e-3)


def test_gan_criterion_matches_tf_formulas(rng):
    """Oracle: the reference gan_loss branches (robonet video_prediction
    losses.py:14-39) re-implemented with torch primitives."""
    logits = torch.tensor(rng.randn(4, 7).astype(np.float32))
    jl = jnp.asarray(logits.numpy())

    # GAN, hard labels: sigmoid cross-entropy vs constant label
    for lab in (0.0, 1.0):
        want = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, torch.full_like(logits, lab)
        )
        got = float(L.gan_criterion(jl, lab, "GAN"))
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

    # GAN, smoothed label: xent minus label entropy (ops.py:1007-1015)
    lab = 0.9
    entropy = -lab * np.log(lab) - (1 - lab) * np.log(1 - lab)
    want = (
        torch.nn.functional.binary_cross_entropy_with_logits(
            logits, torch.full_like(logits, lab)
        )
        - entropy
    )
    got = float(L.gan_criterion(jl, lab, "GAN"))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)

    # LSGAN: mean squared logits-vs-label
    got = float(L.gan_criterion(jl, 1.0, "LSGAN"))
    np.testing.assert_allclose(got, float(((logits - 1.0) ** 2).mean()), rtol=1e-5)

    # SNGAN: softplus(+-logits)
    got0 = float(L.gan_criterion(jl, 0.0, "SNGAN"))
    got1 = float(L.gan_criterion(jl, 1.0, "SNGAN"))
    np.testing.assert_allclose(
        got0, float(torch.nn.functional.softplus(logits).mean()), rtol=1e-5
    )
    np.testing.assert_allclose(
        got1, float(torch.nn.functional.softplus(-logits).mean()), rtol=1e-5
    )


def test_vae_kl_loss_matches_formula(rng):
    """Oracle: losses.py:42-45 -0.5*mean(sum(1+ls-mu^2-exp(ls), -1))."""
    mu = rng.randn(5, 8).astype(np.float32)
    ls = rng.randn(5, 8).astype(np.float32)
    want = -0.5 * np.mean(
        np.sum(1.0 + ls - mu**2 - np.exp(ls), axis=-1)
    )
    got = float(L.vae_kl_loss(jnp.asarray(mu), jnp.asarray(ls)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
