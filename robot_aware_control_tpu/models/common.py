"""Shared helpers for model step functions."""

from __future__ import annotations

import jax.numpy as jnp

from robot_aware_control_tpu.config import Config


def skip_zeros(cfg: Config, batch: int, dtype=jnp.float32):
    """Zero-filled encoder-skip pytree matching conv_encoder's output shapes.

    Used to initialize the skip carry in lax.scan; the first step always
    overwrites it (reference skip semantics: src/prediction/trainer.py:370,
    409-410)."""
    h, w = cfg.image_height, cfg.image_width
    return [
        jnp.zeros((batch, h, w, 64), dtype),
        jnp.zeros((batch, h // 2, w // 2, 128), dtype),
        jnp.zeros((batch, h // 4, w // 4, 256), dtype),
        jnp.zeros((batch, h // 8, w // 8, cfg.g_dim), dtype),
    ]
