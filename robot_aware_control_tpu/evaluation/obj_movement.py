"""Object-movement metadata via the copy-model baseline.

Reference parity: `measure_obj_movement` (reference:
src/prediction/measure_obj_movement.py:79-150): run the parameter-free
CopyModel over each video, threshold its world-region error to label
whether the object moved, and save `obj_movement.pkl` used by
`--load_movement_info/--movement_weight` training
(reference: robonet_dataset.py:36-48, trainer.py:426-429).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.models import copy_model
from robot_aware_control_tpu.ops import losses as L

# per robot_viewpoint world-error thresholds
# (reference: measure_obj_movement.py:146-168)
THRESHOLDS = {
    "sawyer_sudri0_c0": 0.114,
    "sawyer_sudri0_c1": 0.21,
    "sawyer_sudri0_c2": 0.18,
    "sawyer_vestri_table2_c0": 0.09,
    "default": 0.1,
}


def copy_world_error(images, masks) -> float:
    """Mean world-region MSE of the copy baseline over a video
    (images (T, H, W, 3), masks (T, H, W, 1))."""
    x = jnp.asarray(images)[:, None] if images.ndim == 4 else jnp.asarray(images)
    m = jnp.asarray(masks)[:, None] if masks.ndim == 4 else jnp.asarray(masks)
    errs = []
    for t in range(1, x.shape[0]):
        pred = copy_model.step(x[t - 1], x[t], m[t])
        errs.append(float(L.world_mse_criterion(pred, x[t], m[t])))
    return float(np.mean(errs))


def make_movement_metadata(dataset, threshold: float,
                           write_path: str) -> Dict[str, bool]:
    """dataset: indexable returning dicts with images/masks/file_path.
    Saves {file_path: high_movement} (reference:
    measure_obj_movement.py:79-109)."""
    meta: Dict[str, bool] = {}
    num_high = 0
    for i in range(len(dataset)):
        item = dataset[i]
        err = copy_world_error(item["images"], item["masks"])
        high = err >= threshold
        meta[item["file_path"]] = bool(high)
        num_high += int(high)
    os.makedirs(os.path.dirname(write_path) or ".", exist_ok=True)
    with open(write_path, "wb") as f:
        pickle.dump(meta, f)
    return meta


def load_movement_metadata(path: str) -> Dict[str, bool]:
    with open(path, "rb") as f:
        return pickle.load(f)


def evaluate_on_movement_set(cfg, ckpt_path: str):
    """Evaluate a checkpoint on the high-movement video subset
    (reference: evaluation/evaluate_obj_movement.py:13-25 — loads the
    checkpoint and runs the epoch metrics over create_movement_loader)."""
    from robot_aware_control_tpu.data.loader import create_movement_loaders
    from robot_aware_control_tpu.evaluation.evaluate_checkpoint import (
        evaluate_checkpoint,
    )

    _, test_loader = create_movement_loaders(cfg)
    return evaluate_checkpoint(cfg, ckpt_path, loader=test_loader)


def main(argv=None):
    """CLI driver. Without --dynamics_model_ckpt: label all videos under
    data_root and write obj_movement.pkl (reference:
    measure_obj_movement.py __main__). With --dynamics_model_ckpt:
    evaluate that checkpoint on the high-movement subset (reference:
    evaluation/evaluate_obj_movement.py)."""
    from robot_aware_control_tpu.config import argparser
    from robot_aware_control_tpu.data.loader import discover_hdf5
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    cfg, _ = argparser(argv)
    if cfg.dynamics_model_ckpt:
        import json

        metrics = evaluate_on_movement_set(cfg, cfg.dynamics_model_ckpt)
        print(json.dumps({k: round(float(v), 5) for k, v in metrics.items()}))
        return
    pairs = discover_hdf5(cfg.data_root)
    ds = RoboNetHDF5Dataset([p for p, _ in pairs], [r for _, r in pairs], cfg)
    key = pairs[0][1] if pairs else "default"
    threshold = THRESHOLDS.get(key, THRESHOLDS["default"])
    write_path = os.path.join(cfg.data_root, "obj_movement.pkl")
    meta = make_movement_metadata(ds, threshold, write_path)
    n_high = sum(meta.values())
    print(f"{n_high}/{len(meta)} videos above threshold {threshold}; "
          f"wrote {write_path}")


if __name__ == "__main__":
    main()
