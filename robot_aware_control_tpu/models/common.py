"""Shared helpers for model step functions."""

from __future__ import annotations

import jax.numpy as jnp

from robot_aware_control_tpu.config import Config


def skip_zeros(cfg: Config, batch: int, dtype=jnp.float32):
    """Zero-filled encoder-skip pytree matching the encoder's output shapes.

    Used to initialize the skip carry in lax.scan; the first step always
    overwrites it (reference skip semantics: src/prediction/trainer.py:370,
    409-410)."""
    h, w = cfg.image_height, cfg.image_width
    last = 512 if cfg.model in ("svg_vec", "det_vec") else cfg.g_dim
    return [
        jnp.zeros((batch, h, w, 64), dtype),
        jnp.zeros((batch, h // 2, w // 2, 128), dtype),
        jnp.zeros((batch, h // 4, w // 4, 256), dtype),
        jnp.zeros((batch, h // 8, w // 8, last), dtype),
    ]


def composite(cfg: Config, x_pred, prev_image):
    """(1 - m̂)·prev + m̂·rgb when the decoder emits the extra attention
    channel (conv models, reference: src/prediction/trainer.py:406-407);
    identity for models that predict the frame directly (vector SVG/Det,
    CDNA outputs are already composited)."""
    if x_pred.shape[-1] != cfg.channels + 1:
        return x_pred
    rgb, attn = x_pred[..., :-1], x_pred[..., -1:]
    prev = prev_image.astype(rgb.dtype)
    return (1.0 - attn) * prev + attn * rgb
