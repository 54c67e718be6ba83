"""Heatmap-conditioned training end-to-end (reference heatmap flags:
--model_use_heatmap/--model_use_future_heatmap, trainer.py:373-391,
heatmap creation robonet_dataset.py:482-544)."""

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.data.loader import DataLoader
from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training.step import make_train_step


def test_heatmap_training(tmp_path):
    cfg = Config(
        model="svg", g_dim=8, z_dim=2, image_height=48, image_width=64,
        robot_dim=5, action_dim=5, robot_joint_dim=5, n_past=1, n_future=2,
        model_use_mask=True, model_use_robot_state=True,
        model_use_heatmap=True, model_use_future_heatmap=True,
        reconstruction_loss="dontcare_l1", compute_dtype="float32",
        video_length=4, demo_length=4, impute_autograsp_action=False,
        batch_size=2, lr=1e-3,
    )
    files = collect_training_data("LocobotPush", 2, str(tmp_path), cfg, seed=0)
    ds = RoboNetHDF5Dataset(files, ["locobot_c0"] * 2, cfg, seed=0)
    batch = next(iter(DataLoader(ds, 2, num_workers=1, seed=0)))
    assert batch["heatmaps"].shape == (4, 2, 48, 64, 1)
    assert batch["heatmaps"].max() > 0  # eef projected into frame

    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt = tx.init(params)
    dev = {k: jnp.asarray(batch[k][:3])
           for k in ("images", "masks", "states", "heatmaps")}
    dev["actions"] = jnp.asarray(batch["actions"][:2])
    params, bn, opt, m = tstep(params, bn, opt, dev, jax.random.PRNGKey(0),
                               jnp.float32(1.0))
    assert np.isfinite(float(m["loss"]))
