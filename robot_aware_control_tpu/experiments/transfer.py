"""Zero-shot robot-transfer experiment.

Reproduces the reference's headline scientific claim (reference: README.md:15,
the paper's Sawyer->WidowX/Baxter transfer): a video-prediction model trained
with robot-awareness (mask conditioning + don't-care loss) on ONE robot
predicts world dynamics on an UNSEEN robot far better than a conventional
model, because the world module never learned robot pixels.

Pipeline (all in this repo, single command):
  1. collect scripted push episodes with the standard locobot,
  2. train (a) robot-aware SVG (masks + state + dontcare_l1) and
           (b) vanilla SVG (no conditioning, l1),
  3. collect episodes with the visually different "modified" robot,
  4. evaluate both checkpoints autoregressively on the transfer episodes,
     scoring world-region MSE/PSNR against the true masks.

Run: python -m robot_aware_control_tpu.experiments.transfer
     [--niter 12 --epoch_size 8 --num_episodes 120 ...]
"""

from __future__ import annotations

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config, argparser
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.data.loader import DataLoader
from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.step import make_eval_step
from robot_aware_control_tpu.training.trainer import PredictionTrainer


def _base_cfg(cfg: Config, **kw) -> Config:
    return cfg.replace(
        model="svg", experiment="train_locobot_singleview",
        robot_dim=5, action_dim=5, robot_joint_dim=5,
        n_eval=min(cfg.n_eval, cfg.video_length),
        impute_autograsp_action=False,
        scheduled_sampling=True, remat=True, **kw,
    )


def train_pair(cfg: Config):
    """Train robot-aware + vanilla models on the standard robot's data."""
    data_root = os.path.join(cfg.log_dir, "data_standard")
    collect_training_data("LocobotPush", cfg.num_episodes, data_root, cfg,
                          seed=cfg.seed)
    ra = _base_cfg(cfg, jobname="transfer_ra", data_root=data_root,
                   model_use_mask=True, model_use_future_mask=True,
                   model_use_robot_state=True,
                   reconstruction_loss="dontcare_l1",
                   checkpoint_interval=cfg.niter, eval_interval=10 ** 6)
    va = _base_cfg(cfg, jobname="transfer_vanilla", data_root=data_root,
                   model_use_mask=False, model_use_robot_state=False,
                   reconstruction_loss="l1",
                   checkpoint_interval=cfg.niter, eval_interval=10 ** 6)
    paths = {}
    for c in (ra, va):
        tr = PredictionTrainer(c)
        tr.train()
        paths[c.jobname] = ckpt.latest_checkpoint(tr.log_dir)
    return ra, va, paths


def eval_transfer(cfg_model: Config, ckpt_path: str, files):
    params, bn = get_model(cfg_model).init(jax.random.PRNGKey(0), cfg_model)
    trees, _ = ckpt.load_checkpoint(ckpt_path, {"params": params, "bn": bn})
    params, bn = trees["params"], trees["bn"]
    ds = RoboNetHDF5Dataset(files, ["locobot_c0"] * len(files),
                            cfg_model.replace(experiment="eval"), seed=0)
    loader = DataLoader(ds, cfg_model.test_batch_size, shuffle=False,
                        num_workers=2, seed=0)
    estep = make_eval_step(cfg_model.replace(sample_mean=True),
                           autoregressive=True)
    aggs, n = {}, 0
    for batch in loader:
        w = {k: jnp.asarray(batch[k][: cfg_model.n_eval])
             for k in ("images", "masks", "states")}
        w["actions"] = jnp.asarray(batch["actions"][: cfg_model.n_eval - 1])
        per_step, _ = estep(params, bn, w, jax.random.PRNGKey(1))
        for k, v in per_step.items():
            aggs[k] = aggs.get(k, 0.0) + jnp.mean(v)
        n += 1
    out = {k: float(v) / n for k, v in aggs.items()}
    out["world_psnr"] = float(10 * np.log10(1.0 / max(out["world_loss"], 1e-12)))
    return out


def main(argv=None):
    cfg, _ = argparser(argv)
    if cfg.num_episodes == 100:  # default -> experiment-sized
        cfg = cfg.replace(num_episodes=120)
    ra, va, paths = train_pair(cfg)

    transfer_root = os.path.join(cfg.log_dir, "data_modified")
    collect_training_data("ModifiedLocobotPush", 24, transfer_root, cfg,
                          seed=cfg.seed + 5)
    files = sorted(glob.glob(os.path.join(transfer_root, "**", "*.hdf5"),
                             recursive=True))

    m_ra = eval_transfer(ra, paths["transfer_ra"], files)
    m_va = eval_transfer(va, paths["transfer_vanilla"], files)
    result = {
        "robot_aware": {k: round(v, 6) for k, v in m_ra.items()},
        "vanilla": {k: round(v, 6) for k, v in m_va.items()},
        "world_mse_ratio_vanilla_over_ra": round(
            m_va["world_loss"] / m_ra["world_loss"], 2
        ),
    }
    out_path = os.path.join(cfg.log_dir, "transfer_results.json")
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
