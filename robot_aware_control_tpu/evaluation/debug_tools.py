"""Offline model-debugging tools.

Reference parity:
  * `test_action_rollout` (reference: src/prediction/test_action_rollout.py:
    20-243): sweep synthetic action sequences (straight lines in each
    direction, spirals) through a trained model from a real start frame and
    save gif strips of the imagined futures.
  * `debug_models` (reference: src/prediction/debug_models.py:46):
    side-by-side comparison of two checkpoints on the same inputs.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.planning.rollout import TrajectorySampler
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.plot import save_gif
from robot_aware_control_tpu.utils.state import DemoGoalState, State


def synthetic_action_sweeps(horizon: int, action_dim: int = 5,
                            magnitude: float = 0.6) -> np.ndarray:
    """Straight pushes in 8 compass directions + 2 arcs
    (reference: test_action_rollout.py:20-80)."""
    dirs = []
    for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        dirs.append([np.cos(th), np.sin(th)])
    seqs = []
    for d in dirs:
        a = np.zeros((horizon, action_dim), np.float32)
        a[:, :2] = np.asarray(d, np.float32) * magnitude
        seqs.append(a)
    for sign in (1, -1):
        a = np.zeros((horizon, action_dim), np.float32)
        ths = np.linspace(0, sign * np.pi, horizon)
        a[:, 0] = np.cos(ths) * magnitude
        a[:, 1] = np.sin(ths) * magnitude
        seqs.append(a)
    return np.stack(seqs) * 0.05  # env action scale


def action_rollout(cfg: Config, ckpt_path: str, start: State,
                   out_dir: str, horizon: Optional[int] = None) -> str:
    """Roll the sweeps through the checkpointed model, save a gif grid."""
    horizon = horizon or cfg.horizon
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    trees, _ = ckpt.load_checkpoint(ckpt_path, {"params": params, "bn": bn})
    sampler = TrajectorySampler(cfg, trees["params"], trees["bn"])
    acts = synthetic_action_sweeps(horizon, cfg.action_dim)
    goal = DemoGoalState(
        imgs=[np.asarray(start.img, np.float32)],
        masks=[np.zeros(np.asarray(start.img).shape[:2], np.float32)],
    )
    out = sampler.generate_model_rollouts(acts, start, goal, ret_obs=True)
    obs = out["obs"]  # (topk, T, H, W, 3)
    frames = [np.concatenate(list(obs[:, t]), axis=1) for t in range(obs.shape[1])]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "action_rollout.gif")
    save_gif(path, frames, fps=2)
    return path


def debug_models(cfg: Config, ckpt_a: str, ckpt_b: str, start: State,
                 out_dir: str) -> str:
    """Two-checkpoint side-by-side rollout comparison
    (reference: debug_models.py:46)."""
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    rows = []
    acts = synthetic_action_sweeps(cfg.horizon, cfg.action_dim)[:1]
    goal = DemoGoalState(
        imgs=[np.asarray(start.img, np.float32)],
        masks=[np.zeros(np.asarray(start.img).shape[:2], np.float32)],
    )
    for path in (ckpt_a, ckpt_b):
        trees, _ = ckpt.load_checkpoint(path, {"params": params, "bn": bn})
        sampler = TrajectorySampler(cfg, trees["params"], trees["bn"])
        out = sampler.generate_model_rollouts(acts, start, goal, ret_obs=True)
        rows.append(np.concatenate(list(out["obs"][0]), axis=1))
    os.makedirs(out_dir, exist_ok=True)
    gif = os.path.join(out_dir, "debug_models.png")
    from robot_aware_control_tpu.training.plot import image_strip

    image_strip(gif, [np.concatenate(rows, axis=0)])
    return gif
