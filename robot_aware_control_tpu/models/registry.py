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
    if cfg.model == "svg_vec":
        from robot_aware_control_tpu.models import svg_vector

        return svg_vector
    if cfg.model == "det_vec":
        from robot_aware_control_tpu.models import svg_vector

        return svg_vector.det
    if cfg.model in ("cdna_det", "cdna_robonet"):
        from robot_aware_control_tpu.models import cdna

        return cdna if cfg.model == "cdna_det" else cdna.robonet
    if cfg.model == "copy":
        from robot_aware_control_tpu.models import copy_model

        return copy_model
    raise ValueError(f"unknown model {cfg.model!r}")


def is_stochastic(cfg: Config) -> bool:
    """Models with a learned prior/posterior (KL term in the loss)."""
    return cfg.model in ("svg", "svg_vec")
