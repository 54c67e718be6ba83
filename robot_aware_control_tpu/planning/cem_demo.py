"""End-to-end CEM planning demo CLI.

Reference parity: the `__main__` smoke block of src/cem/cem.py:182-250 —
plan actions from a real start/goal pair and dump diagnostics. Here the
start/goal come from the bundled JAX env (or a demo HDF5 via
--debug_trajectory_path), the plan rolls out in the env, and a
start|rollout|goal gif is written to the log dir.

    python -m robot_aware_control_tpu.planning.cem_demo \
        --action_candidates 100 --horizon 5 --opt_iter 10 ...
"""

from __future__ import annotations

import os

import jax
import numpy as np

from robot_aware_control_tpu.config import argparser
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.envs import LocobotPushEnv
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.planning.cem import CEMPolicy
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.logger import make_log_folder
from robot_aware_control_tpu.training.plot import save_gif
from robot_aware_control_tpu.utils.state import DemoGoalState, State


def main(argv=None):
    cfg, _ = argparser(argv)
    cfg = cfg.replace(
        model_use_mask=True, model_use_robot_state=True,
        reconstruction_loss="dontcare_l1", reward_type="dontcare",
        action_dim=max(cfg.action_dim, 5), robot_dim=5, robot_joint_dim=5,
    )
    log_dir = make_log_folder(cfg)

    params, bn = get_model(cfg).init(jax.random.PRNGKey(cfg.seed), cfg)
    if cfg.dynamics_model_ckpt:
        trees, _ = ckpt.load_checkpoint(
            cfg.dynamics_model_ckpt, {"params": params, "bn": bn}
        )
        params, bn = trees["params"], trees["bn"]

    env = LocobotPushEnv(cfg, seed=cfg.seed)
    if cfg.debug_trajectory_path:
        demo = demo_io.load_demo(cfg.debug_trajectory_path)
        goal_imgs = [g for g in demo.get("object_only_demo",
                                         demo["observations"])[1:]]
        goal_masks = [m[..., 0] for m in demo["masks"][1:]]
        env.reset()
    else:
        # goal = a scripted push outcome; start = fresh reset
        hist = env.generate_demo("straight_push")
        goal_imgs = [o["observation"] for o in hist["obs"][1:]]
        goal_masks = [o["masks"][..., 0] for o in hist["obs"][1:]]
        env.reset()

    start = State(
        img=env.render(),
        state=np.array([*np.asarray(env.state.eef), 0, 0], np.float32),
        qpos=np.asarray(env.state.qpos),
    )
    goal = DemoGoalState(imgs=goal_imgs, masks=goal_masks)
    policy = CEMPolicy(cfg, params, bn)
    plan = policy.get_action(start, goal, ep_num=0, step=0)
    print("plan:", np.round(plan, 4).tolist())

    frames = [start.img]
    for a in plan:
        obs, _, _, _ = env.step(a)
        frames.append(obs["observation"])
    strip = [np.concatenate([f, goal_imgs[-1]], axis=1) for f in frames]
    path = os.path.join(log_dir, "cem_demo.gif")
    save_gif(path, strip, fps=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
