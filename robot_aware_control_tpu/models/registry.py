"""Model registry keyed by the reference's --model flag values
(reference: src/config/__init__.py:225, src/prediction/trainer.py:99-107)."""

from __future__ import annotations

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models import det, svg


def get_model(cfg: Config):
    """Returns the module implementing init/init_carry/step for cfg.model."""
    if cfg.model == "svg":
        return svg
    if cfg.model == "det":
        return det
    if cfg.model == "copy":
        from robot_aware_control_tpu.models import copy_model

        return copy_model
    raise ValueError(f"unknown model {cfg.model!r}")
