"""Export JAX param pytrees as PyTorch reference checkpoints.

The exact inverse of models/torch_import.py: a model trained in this
framework can be handed back to the reference stack as a torch
`state_dict` its modules `load_state_dict(..., strict=True)` — same key
names, layouts, and tensor conventions the reference saves
(reference: src/prediction/trainer.py:829-844 `{"model": state_dict,
"optimizer": ..., "step": N}`; module layouts dynamics.py:363-644,
vgg_64.py:21-241, lstm.py:10-286). Round-trip (export -> import) is
exact, so the existing import goldens transfer correctness to this
direction; `tests/test_torch_export.py` locks both the round-trip and a
strict load into the actual reference modules.

Layout conversions (inverse of torch_import.py):
  * HWIO conv weight (kh, kw, I, O)       -> Conv2d (O, I, kh, kw)
  * same-padded flipped-kernel conv HWIO  -> ConvTranspose2d (I, O, kh, kw)
  * {scale, bias} + {mean, var} state     -> BN weight/bias/running_* (+
    a zero num_batches_tracked so strict loads succeed)
  * Linear (in, out)                      -> torch (out, in)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def inv_conv_w(w) -> np.ndarray:
    """(kh, kw, I, O) -> (O, I, kh, kw)."""
    return np.transpose(_np(w), (3, 2, 0, 1)).copy()


def inv_conv_transpose_w(w) -> np.ndarray:
    """Same-conv HWIO kernel -> ConvTranspose2d k3 s1 p1 (I, O, kh, kw)."""
    t = np.transpose(_np(w), (2, 3, 0, 1))
    return t[:, :, ::-1, ::-1].copy()


def _ex_conv(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = inv_conv_w(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"]).copy()


def _ex_bn(out: Dict, prefix: str, p: Dict, s: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"]).copy()
    out[f"{prefix}.bias"] = _np(p["bias"]).copy()
    out[f"{prefix}.running_mean"] = _np(s["mean"]).copy()
    out[f"{prefix}.running_var"] = _np(s["var"]).copy()
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _ex_vgg_layer(out: Dict, prefix: str, p: Dict, s: Dict) -> None:
    """Inverse of torch_import._vgg_layer: main.0=conv(no bias), main.1=BN."""
    out[f"{prefix}.main.0.weight"] = inv_conv_w(p["conv"]["w"])
    _ex_bn(out, f"{prefix}.main.1", p["bn"], s["bn"])


def _ex_vgg_stack(out: Dict, prefix: str, ps, ss, start: int = 0) -> None:
    for i, (p, s) in enumerate(zip(ps, ss)):
        _ex_vgg_layer(out, f"{prefix}.{start + i}", p, s)


def _ex_conv_lstm(out: Dict, prefix: str, p: Dict) -> None:
    _ex_conv(out, f"{prefix}.lstm.0.gates", p["cell0"]["gates"])
    _ex_conv(out, f"{prefix}.lstm.1.gates", p["cell1"]["gates"])


def _ex_gaussian_conv_lstm(out: Dict, prefix: str, p: Dict) -> None:
    _ex_conv_lstm(out, prefix, p["lstm"])
    _ex_conv(out, f"{prefix}.mu_net", p["mu"])
    _ex_conv(out, f"{prefix}.logvar_net", p["logvar"])


def export_conv_encoder(out: Dict, params: Dict, state: Dict,
                        prefix: str = "encoder") -> None:
    _ex_vgg_stack(out, f"{prefix}.c1", params["c1"], state["c1"])
    _ex_vgg_stack(out, f"{prefix}.c2", params["c2"], state["c2"])
    _ex_vgg_stack(out, f"{prefix}.c3", params["c3"], state["c3"])
    # ours splits c4 into head(2) + out(1); reference c4 has 3 layers
    _ex_vgg_stack(out, f"{prefix}.c4", params["c4_head"], state["c4_head"])
    _ex_vgg_layer(out, f"{prefix}.c4.2", params["c4_out"], state["c4_out"])


def export_conv_decoder(out: Dict, params: Dict, state: Dict,
                        prefix: str = "decoder") -> None:
    _ex_vgg_stack(out, f"{prefix}.upc2", params["upc2"], state["upc2"])
    _ex_vgg_stack(out, f"{prefix}.upc3", params["upc3"], state["upc3"])
    _ex_vgg_stack(out, f"{prefix}.upc4", params["upc4"], state["upc4"])
    # reference upc5 = [vgg_layer, ConvTranspose2d, Sigmoid]
    _ex_vgg_layer(out, f"{prefix}.upc5.0", params["upc5"][0],
                  state["upc5"][0])
    out[f"{prefix}.upc5.1.weight"] = inv_conv_transpose_w(params["out"]["w"])
    out[f"{prefix}.upc5.1.bias"] = _np(params["out"]["b"]).copy()


def _ex_linear(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = np.transpose(_np(p["w"])).copy()
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"]).copy()


def _ex_spatial_map_linear(out: Dict, prefix: str, p: Dict,
                           fh: int, fw: int, c: int) -> None:
    """Inverse of torch_import._spatial_map_linear: our (in, fh*fw*c)
    NHWC-ordered output units back to the reference's NCHW view."""
    w = np.transpose(_np(p["w"]))  # (fh*fw*c, in)
    din = w.shape[1]
    w = w.reshape(fh, fw, c, din).transpose(2, 0, 1, 3).reshape(-1, din)
    out[f"{prefix}.weight"] = w.copy()
    if "b" in p:
        b = _np(p["b"]).reshape(fh, fw, c).transpose(2, 0, 1).reshape(-1)
        out[f"{prefix}.bias"] = b.copy()


def export_svg_conv_model(params: Dict, state: Dict) -> Dict[str, np.ndarray]:
    """models/svg.py params -> torch SVGConvModel state_dict (numpy values;
    inverse of torch_import.import_svg_conv_model)."""
    out: Dict[str, np.ndarray] = {}
    export_conv_encoder(out, params["encoder"], state["encoder"])
    export_conv_decoder(out, params["decoder"], state["decoder"])
    _ex_conv(out, "frame_pred_input_conv", params["frame_in"])
    _ex_conv(out, "prior_input_conv", params["prior_in"])
    _ex_conv(out, "posterior_input_conv", params["post_in"])
    _ex_conv_lstm(out, "frame_predictor", params["frame_lstm"])
    _ex_gaussian_conv_lstm(out, "prior", params["prior"])
    _ex_gaussian_conv_lstm(out, "posterior", params["posterior"])
    return out


def export_det_conv_model(params: Dict, state: Dict, fh: int, fw: int
                          ) -> Dict[str, np.ndarray]:
    """models/det.py params -> torch DeterministicConvModel state_dict
    (inverse of torch_import.import_det_conv_model)."""
    out: Dict[str, np.ndarray] = {}
    export_conv_encoder(out, params["encoder"], state["encoder"])
    export_conv_decoder(out, params["decoder"], state["decoder"])
    _ex_spatial_map_linear(out, "action_encoder.0", params["action_enc"],
                           fh, fw, 2)
    if "state_enc" in params:
        _ex_spatial_map_linear(out, "state_encoder.0", params["state_enc"],
                               fh, fw, 2)
    _ex_conv_lstm(out, "frame_predictor", params["frame_lstm"])
    return out


# --- vector-bottleneck family (reference vgg_64.py Encoder/Decoder,
# lstm.py LSTM/GaussianLSTM, dynamics.py:75-266) -------------------------


def _ex_fc_lstm_cells(out: Dict, prefix: str, cells) -> None:
    for i, c in enumerate(cells):
        out[f"{prefix}.lstm.{i}.weight_ih"] = np.transpose(
            _np(c["ih"]["w"])).copy()
        out[f"{prefix}.lstm.{i}.bias_ih"] = _np(c["ih"]["b"]).copy()
        out[f"{prefix}.lstm.{i}.weight_hh"] = np.transpose(
            _np(c["hh"]["w"])).copy()
        out[f"{prefix}.lstm.{i}.bias_hh"] = _np(c["hh"]["b"]).copy()


def _ex_fc_lstm(out: Dict, prefix: str, p: Dict) -> None:
    _ex_linear(out, f"{prefix}.embed", p["embed"])
    _ex_fc_lstm_cells(out, prefix, p["cells"])
    _ex_linear(out, f"{prefix}.output.0", p["out"])


def _ex_gaussian_fc_lstm(out: Dict, prefix: str, p: Dict) -> None:
    _ex_linear(out, f"{prefix}.embed", p["embed"])
    _ex_fc_lstm_cells(out, prefix, p["cells"])
    _ex_linear(out, f"{prefix}.mu_net", p["mu"])
    _ex_linear(out, f"{prefix}.logvar_net", p["logvar"])


def _ex_mlp_encoder(out: Dict, prefix: str, p: Dict) -> None:
    _ex_linear(out, f"{prefix}.output.0", p["l1"])
    _ex_linear(out, f"{prefix}.output.2", p["l2"])


def export_encoder(out: Dict, params: Dict, state: Dict,
                   prefix: str = "encoder") -> None:
    _ex_vgg_stack(out, f"{prefix}.c1", params["c1"], state["c1"])
    _ex_vgg_stack(out, f"{prefix}.c2", params["c2"], state["c2"])
    _ex_vgg_stack(out, f"{prefix}.c3", params["c3"], state["c3"])
    _ex_vgg_stack(out, f"{prefix}.c4", params["c4"], state["c4"])
    _ex_conv(out, f"{prefix}.c5.0", params["c5"]["conv"])
    _ex_bn(out, f"{prefix}.c5.1", params["c5"]["bn"], state["c5"]["bn"])


def export_decoder(out: Dict, params: Dict, state: Dict,
                   prefix: str = "decoder") -> None:
    out[f"{prefix}.upc1.0.weight"] = inv_conv_transpose_w(
        params["upc1"]["conv"]["w"])
    out[f"{prefix}.upc1.0.bias"] = _np(params["upc1"]["conv"]["b"]).copy()
    _ex_bn(out, f"{prefix}.upc1.1", params["upc1"]["bn"], state["upc1"]["bn"])
    _ex_vgg_stack(out, f"{prefix}.upc2", params["upc2"], state["upc2"])
    _ex_vgg_stack(out, f"{prefix}.upc3", params["upc3"], state["upc3"])
    _ex_vgg_stack(out, f"{prefix}.upc4", params["upc4"], state["upc4"])
    _ex_vgg_layer(out, f"{prefix}.upc5.0", params["upc5"][0],
                  state["upc5"][0])
    out[f"{prefix}.upc5.1.weight"] = inv_conv_transpose_w(params["out"]["w"])
    out[f"{prefix}.upc5.1.bias"] = _np(params["out"]["b"]).copy()


def export_det_vector_model(params: Dict, state: Dict
                            ) -> Dict[str, np.ndarray]:
    """models/svg_vector.py (det) -> torch DeterministicModel state_dict."""
    out: Dict[str, np.ndarray] = {}
    export_encoder(out, params["encoder"], state["encoder"])
    export_decoder(out, params["decoder"], state["decoder"])
    _ex_mlp_encoder(out, "action_enc", params["action_enc"])
    if "robot_enc" in params:
        _ex_mlp_encoder(out, "robot_enc", params["robot_enc"])
    _ex_fc_lstm(out, "frame_predictor", params["frame_lstm"])
    return out


def export_svg_vector_model(params: Dict, state: Dict
                            ) -> Dict[str, np.ndarray]:
    """models/svg_vector.py (svg) -> torch SVGModel state_dict."""
    out = export_det_vector_model(params, state)
    _ex_gaussian_fc_lstm(out, "prior", params["prior"])
    _ex_gaussian_fc_lstm(out, "posterior", params["posterior"])
    return out


def save_torch_checkpoint(path: str, params: Dict, state: Dict, cfg,
                          step: int = 0,
                          fh: Optional[int] = None,
                          fw: Optional[int] = None) -> str:
    """Write a `ckpt_*.pt` the reference trainer resumes from
    (trainer.py:846-885 expects {"model": state_dict, "step": N}).
    fh/fw default to (H/8, W/8) for the det conv action/state heads."""
    import torch

    model = getattr(cfg, "model", "svg")
    if model == "det":
        sd = export_det_conv_model(
            params, state,
            fh or cfg.image_height // 8, fw or cfg.image_width // 8)
    elif model == "det_vec":
        sd = export_det_vector_model(params, state)
    elif model == "svg_vec":
        sd = export_svg_vector_model(params, state)
    elif model == "svg":
        sd = export_svg_conv_model(params, state)
    else:
        raise ValueError(f"no torch export for model {model!r} (supported: "
                         "svg, det, svg_vec, det_vec)")
    # The reference's non-finetune resume also loads ckpt["optimizer"]
    # unconditionally (trainer.py:884,896); ship a fresh Adam state_dict
    # (empty per-param state — torch Adam initializes lazily on the first
    # step) whose param-index list matches model.parameters(): every
    # exported tensor except BN buffers (running_*, num_batches_tracked).
    n_params = sum(1 for k in sd
                   if not k.endswith(("running_mean", "running_var",
                                      "num_batches_tracked")))
    probe = torch.optim.Adam(
        [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)],
        lr=float(getattr(cfg, "lr", 3e-4)),
        betas=(float(getattr(cfg, "beta1", 0.9)), 0.999),
    )
    blob = {"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in sd.items()},
            "optimizer": probe.state_dict(),
            "step": int(step)}
    torch.save(blob, path)
    return path


def main(argv=None):
    """CLI: convert a saved .npz checkpoint to a reference ckpt_*.pt.

    python -m robot_aware_control_tpu.models.torch_export \\
        --dynamics_model_ckpt runs/myrun/ckpt_10000.npz --model svg \\
        [model shape flags...] [--out ckpt_10000.pt]
    """
    import argparse

    import jax
    # Weight restructuring needs no accelerator; pinning CPU avoids TPU
    # tunnel init (and works when no TPU plugin is reachable).
    jax.config.update("jax_platforms", "cpu")

    from robot_aware_control_tpu.config import argparser
    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.training import checkpoint as ckpt

    cfg, unparsed = argparser(argv)
    extra = argparse.ArgumentParser()
    extra.add_argument("--out", default=None,
                       help="output .pt path (default: ckpt .npz renamed)")
    eargs = extra.parse_args(unparsed)
    src = cfg.dynamics_model_ckpt
    if not src:
        raise SystemExit("--dynamics_model_ckpt <ckpt.npz> is required")
    out = eargs.out or (os.path.splitext(src)[0] + ".pt")

    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    trees, step = ckpt.load_checkpoint(src, {"params": params, "bn": bn})
    save_torch_checkpoint(out, trees["params"], trees["bn"], cfg, step=step)
    print(f"wrote {out} (step {step}, model {cfg.model})")


if __name__ == "__main__":
    main()
