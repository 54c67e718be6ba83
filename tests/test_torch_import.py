"""Torch-checkpoint import parity tests.

Builds small torch modules with the reference's layer structure
(conv3x3-noBias+BN+LeakyReLU vgg layers, 4-gate ConvLSTM cell i/f/o/g,
stride-1 ConvTranspose2d output — reference: src/prediction/models/
vgg_64.py:8-18, lstm.py:109-148) and checks our imported JAX params produce
the same outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robot_aware_control_tpu.models import torch_import as TI  # noqa: E402
from robot_aware_control_tpu.ops import lstm as L  # noqa: E402
from robot_aware_control_tpu.ops import nn  # noqa: E402


def _np(x):
    return x.detach().numpy()


def test_vgg_layer_parity(rng):
    m = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(8),
        tnn.LeakyReLU(0.2),
    ).eval()
    with torch.no_grad():
        m[1].running_mean.normal_()
        m[1].running_var.uniform_(0.5, 2.0)
        m[1].weight.normal_()
        m[1].bias.normal_()
    sd2 = {f"x.main.{k}": _np(v) for k, v in m.state_dict().items()}
    params, state = TI._vgg_layer(sd2, "x")

    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = _np(m(xt)).transpose(0, 2, 3, 1)
    got, _ = nn.vgg_layer(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conv_transpose_equivalence(rng):
    ct = tnn.ConvTranspose2d(4, 3, 3, 1, 1)
    x = rng.rand(2, 8, 8, 4).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = _np(ct(xt)).transpose(0, 2, 3, 1)
    p = {"w": TI.conv_transpose_w(_np(ct.weight)), "b": _np(ct.bias)}
    got = nn.conv2d(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conv_lstm_cell_parity(rng):
    hid = 6
    gates = tnn.Conv2d(2 * hid, 4 * hid, 3, padding=1)
    x = rng.rand(2, 8, 8, hid).astype(np.float32)
    h0 = rng.rand(2, 8, 8, hid).astype(np.float32)
    c0 = rng.rand(2, 8, 8, hid).astype(np.float32)

    xt = torch.from_numpy(np.concatenate([x, h0], -1).transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = gates(xt)
    i, f, o, g = out.chunk(4, 1)
    c1 = torch.sigmoid(f) * torch.from_numpy(c0.transpose(0, 3, 1, 2)) \
        + torch.sigmoid(i) * torch.tanh(g)
    want_h = _np(torch.sigmoid(o) * torch.tanh(c1)).transpose(0, 2, 3, 1)

    sd = {"g.weight": _np(gates.weight), "g.bias": _np(gates.bias)}
    params = {"gates": TI._conv(sd, "g")}
    got_h, (h1, c1j) = L.conv_lstm_cell(
        params, (jnp.asarray(h0), jnp.asarray(c0)), jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=1e-4)


def test_full_state_dict_import_runs(rng):
    """Synthesize a reference-named state_dict for a tiny SVGConvModel and
    run one step through our svg module with the imported params."""
    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.models import svg

    g, z, a, r = 16, 4, 5, 5
    cfg = Config(model="svg", g_dim=g, z_dim=z, action_dim=a, robot_dim=r,
                 image_height=48, image_width=64, model_use_mask=True,
                 model_use_robot_state=True, compute_dtype="float32")

    tr = np.random.RandomState(0)
    sd = {}

    def add_vgg(prefix, cin, cout):
        sd[f"{prefix}.main.0.weight"] = tr.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
        sd[f"{prefix}.main.1.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.main.1.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.main.1.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.main.1.running_var"] = np.ones(cout, np.float32)

    def add_conv(prefix, cin, cout, k=3):
        sd[f"{prefix}.weight"] = tr.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    nc = 4  # rgb + mask
    for i, (ci, co) in enumerate([(nc, 64), (64, 64)]):
        add_vgg(f"encoder.c1.{i}", ci, co)
    for i, (ci, co) in enumerate([(64, 128), (128, 128)]):
        add_vgg(f"encoder.c2.{i}", ci, co)
    for i, (ci, co) in enumerate([(128, 256), (256, 256), (256, 256)]):
        add_vgg(f"encoder.c3.{i}", ci, co)
    for i, (ci, co) in enumerate([(256, 512), (512, 512), (512, g)]):
        add_vgg(f"encoder.c4.{i}", ci, co)
    for i, (ci, co) in enumerate([(g, 512), (512, 512), (512, 256)]):
        add_vgg(f"decoder.upc2.{i}", ci, co)
    for i, (ci, co) in enumerate([(512, 256), (256, 256), (256, 128)]):
        add_vgg(f"decoder.upc3.{i}", ci, co)
    for i, (ci, co) in enumerate([(256, 128), (128, 64)]):
        add_vgg(f"decoder.upc4.{i}", ci, co)
    add_vgg("decoder.upc5.0", 128, 64)
    sd["decoder.upc5.1.weight"] = tr.randn(64, 4, 3, 3).astype(np.float32) * 0.05
    sd["decoder.upc5.1.bias"] = np.zeros(4, np.float32)
    add_conv("frame_pred_input_conv", g + a + r + z, g)
    add_conv("prior_input_conv", g + a + r, g)
    add_conv("posterior_input_conv", g + r, g)
    for name in ("frame_predictor", "prior", "posterior"):
        add_conv(f"{name}.lstm.0.gates", 2 * g, 4 * g, 5)
        add_conv(f"{name}.lstm.1.gates", 2 * g, 4 * g, 3)
    for name in ("prior", "posterior"):
        add_conv(f"{name}.mu_net", g, z)
        add_conv(f"{name}.logvar_net", g, z)

    params, bn = TI.import_svg_conv_model(sd)
    carry = svg.init_carry(cfg, 2)
    x = jnp.asarray(tr.rand(2, 48, 64, 3), jnp.float32)
    m = jnp.asarray(tr.rand(2, 48, 64, 1) > 0.8, jnp.float32)
    robot = jnp.asarray(tr.rand(2, 5), jnp.float32)
    act = jnp.asarray(tr.rand(2, 5), jnp.float32)
    out, _, _ = svg.step(cfg, params, bn, carry, image=x, mask=m, robot=robot,
                         heatmap=None, action=act, rng=jax.random.PRNGKey(0),
                         skip=None, train=False)
    assert out["x_pred"].shape == (2, 48, 64, 4)
    assert np.isfinite(np.asarray(out["x_pred"], np.float32)).all()
