"""int8 quantization for the planning (inference-only) path.

CEM planning never takes gradients, and the v5e MXU's int8 throughput
(394 TOP/s) is 2x its bf16 peak (197 TFLOP/s) — while the ConvLSTM gate
convs that dominate rollout FLOPs already run at ~80% of the bf16 peak
(RESULTS.md roofline). Quantizing the rollout convs to int8 therefore
raises the planner's FLOP ceiling rather than chasing lowering gains.

Scheme (standard post-training dynamic quantization):
  * weights: per-output-channel symmetric int8, scales stored alongside
    (`w_q` int8 HWIO + `w_scale` f32 (O,)) — ops/nn.conv2d dispatches on
    this structure, so model step functions are untouched;
  * activations: per-tensor dynamic symmetric int8 computed inside the
    jitted program (one amax per conv — fuses into the preceding
    elementwise chain);
  * accumulation: int32 on the MXU (`preferred_element_type`), dequantized
    by `s_x * w_scale` before the bias add.

Linear layers, transpose convs (vector-decoder `upc1`) and BatchNorm stay
float — they are a rounding error of rollout FLOPs.

Enable with `--plan_quantize int8` (Config.plan_quantize); CEMPolicy /
TrajectorySampler transform their params once at construction. There is
no reference analogue (the reference plans in f32 torch,
src/cem/trajectory_sampler.py:123-174); this is a TPU-native extension,
OFF by default. Accuracy bounds: tests/test_quant.py (rollout drift) and
the planning smoke test.
"""

from __future__ import annotations

import jax.numpy as jnp

# param sub-dicts consumed by ops NOT routed through nn.conv2d's int8
# dispatch (lax.conv_transpose in ops/encoders._conv_transpose_valid)
_SKIP_KEYS = ("upc1",)


def quantize_conv_params(p):
    """{"w": (kh,kw,I,O) f32 [, "b"]} -> {"w_q" int8, "w_scale" (O,) [, "b"]}."""
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    q = {
        "w_q": jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8),
        "w_scale": scale,
    }
    if "b" in p:
        q["b"] = p["b"]
    return q


def _is_conv_leaf(node) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and getattr(node["w"], "ndim", 0) == 4
    )


def quantize_conv_tree(params, skip_keys=_SKIP_KEYS):
    """Recursively replace every conv param dict with its int8 form.

    Leaves anything under `skip_keys` untouched; already-quantized leaves
    (carrying `w_q`) pass through, so the transform is idempotent.
    """
    if _is_conv_leaf(params):
        return quantize_conv_params(params)
    if isinstance(params, dict):
        return {
            k: (v if k in skip_keys else quantize_conv_tree(v, skip_keys))
            for k, v in params.items()
        }
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_conv_tree(v, skip_keys) for v in params)
    return params


def maybe_quantize_plan_params(cfg, params):
    """Config-gated entry point used by CEMPolicy / TrajectorySampler."""
    if getattr(cfg, "plan_quantize", "none") == "int8":
        return quantize_conv_tree(params)
    return params
