"""Torch checkpoint EXPORT (models/torch_export.py): the inverse of the
import path, so models trained here can be handed back to the reference
stack (reference ckpt format: src/prediction/trainer.py:829-885).

Correctness argument locked by these tests:
  1. export -> import round-trips EXACTLY (pure layout transforms), and
  2. the exported state_dict strict-loads into the ACTUAL reference
     modules (key names + shapes complete),
so the existing import goldens (test_reference_golden.py) transfer
numerical parity to the export direction.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from robot_aware_control_tpu.config import Config  # noqa: E402
from robot_aware_control_tpu.models import torch_export as TE  # noqa: E402
from robot_aware_control_tpu.models import torch_import as TI  # noqa: E402
from robot_aware_control_tpu.models.registry import get_model  # noqa: E402

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")

H, W, G, Z, A, R = 48, 64, 16, 4, 5, 5


def _cfg(model, **kw):
    base = dict(
        model=model, g_dim=G, z_dim=Z, action_dim=A, robot_dim=R,
        image_height=H, image_width=W, model_use_mask=True,
        model_use_robot_state=True, compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure drift:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _roundtrip(cfg, export_fn, import_fn):
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    sd = export_fn(params, bn)
    back_p, back_s = import_fn(sd)
    _assert_trees_equal(params, back_p)
    _assert_trees_equal(bn, back_s)
    return sd


def test_svg_conv_roundtrip_exact():
    sd = _roundtrip(_cfg("svg"), TE.export_svg_conv_model,
                    TI.import_svg_conv_model)
    # reference tensor conventions, spot-checked
    assert sd["encoder.c1.0.main.0.weight"].ndim == 4
    assert sd["frame_predictor.lstm.0.gates.weight"].shape[0] % 4 == 0


def test_det_conv_roundtrip_exact():
    cfg = _cfg("det")
    _roundtrip(
        cfg,
        lambda p, s: TE.export_det_conv_model(p, s, H // 8, W // 8),
        lambda sd: TI.import_det_conv_model(sd, H // 8, W // 8),
    )


def test_vector_models_roundtrip_exact():
    _roundtrip(_cfg("svg_vec"), TE.export_svg_vector_model,
               TI.import_svg_vector_model)
    _roundtrip(_cfg("det_vec"), TE.export_det_vector_model,
               TI.import_det_vector_model)


def test_save_torch_checkpoint_roundtrip(tmp_path):
    cfg = _cfg("svg")
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(1), cfg)
    path = TE.save_torch_checkpoint(
        str(tmp_path / "ckpt_123.pt"), params, bn, cfg, step=123)
    sd = TI.load_torch_state_dict(path)
    back_p, back_s = TI.import_svg_conv_model(sd)
    _assert_trees_equal(params, back_p)
    _assert_trees_equal(bn, back_s)
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["step"] == 123


def test_unknown_model_raises(tmp_path):
    cfg = _cfg("svg").replace(model="cdna_det")
    with pytest.raises(ValueError, match="no torch export"):
        TE.save_torch_checkpoint(str(tmp_path / "x.pt"), {}, {}, cfg)


# --- strict load into the ACTUAL reference modules ----------------------


def _install_stubs():
    """Stub skimage/torchvision so reference modules import (same shim as
    test_reference_golden.py)."""
    import types

    for name, attrs in (
        ("skimage", {}),
        ("skimage.filters", {"gaussian": None}),
        ("torchvision", {}),
        ("torchvision.transforms", {"ToTensor": object, "Lambda": object,
                                    "Compose": object, "Resize": object}),
        ("torchvision.transforms.functional", {}),
    ):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
    sys.modules["skimage"].filters = sys.modules["skimage.filters"]
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]


class _RefCfg:
    channels = 3
    g_dim = G
    z_dim = Z
    action_dim = A
    robot_dim = R
    image_height = H
    image_width = W
    model_use_mask = True
    model_use_future_mask = False
    model_use_heatmap = False
    model_use_future_heatmap = False
    model_use_robot_state = True
    model_use_future_robot_state = False
    lstm_group_norm = False
    last_frame_skip = False
    batch_size = 2
    device = torch.device("cpu")
    multiview = False


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "src")),
                    reason="reference not present")
def test_export_strict_loads_into_reference_svg_conv_model():
    """Every exported key/shape is exactly what the reference module owns
    (strict=True rejects missing AND unexpected keys)."""
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        from src.prediction.models.dynamics import SVGConvModel
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    ref = SVGConvModel(_RefCfg())

    cfg = _cfg("svg", last_frame_skip=False)
    params, bn = get_model(cfg).init(jax.random.PRNGKey(2), cfg)
    sd = TE.export_svg_conv_model(params, bn)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        strict=True,
    )
    # and the loaded weights ARE ours: export the ref state back and import
    back = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p2, s2 = TI.import_svg_conv_model(back)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(bn, s2)

    # the reference's non-finetune resume ALSO loads ckpt["optimizer"]
    # unconditionally (trainer.py:884,896) — the written blob must feed a
    # fresh reference Adam without KeyError/shape complaints
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pt = os.path.join(d, "ckpt_1.pt")
        TE.save_torch_checkpoint(pt, params, bn, cfg, step=1)
        blob = torch.load(pt, map_location="cpu", weights_only=False)
        opt = torch.optim.Adam(ref.parameters(), lr=cfg.lr,
                               betas=(cfg.beta1, 0.999))
        opt.load_state_dict(blob["optimizer"])  # raises on param mismatch
        assert blob["optimizer"]["param_groups"][0]["lr"] == cfg.lr


def test_export_cli_from_npz_checkpoint(tmp_path):
    """CLI: saved .npz checkpoint -> reference ckpt .pt in one command."""
    from robot_aware_control_tpu.models import torch_export as te_mod
    from robot_aware_control_tpu.training import checkpoint as ckpt

    cfg = _cfg("svg")
    params, bn = get_model(cfg).init(jax.random.PRNGKey(3), cfg)
    ckpt.save_checkpoint(str(tmp_path), 42, {"params": params, "bn": bn},
                         background=False)
    src = str(tmp_path / "ckpt_42.npz")
    assert os.path.isfile(src)
    out = str(tmp_path / "ref_ckpt.pt")
    te_mod.main([
        "--model", "svg", "--g_dim", str(G), "--z_dim", str(Z),
        "--action_dim", str(A), "--robot_dim", str(R),
        "--image_height", str(H), "--image_width", str(W),
        "--model_use_mask", "true", "--model_use_robot_state", "true",
        "--dynamics_model_ckpt", src, "--out", out,
    ])
    sd = TI.load_torch_state_dict(out)
    p2, s2 = TI.import_svg_conv_model(sd)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(bn, s2)
