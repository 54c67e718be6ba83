"""Clutter-push / Fetch-push environments.

Reference parity: `ClutterPushEnv` (reference:
src/env/robotics/clutter_push.py, Fetch-based, multiple pushable blocks,
demo generation, pure `robot_kinematics()` FK+mask query :96-117) and
`FetchPushEnv` (reference: src/env/robotics/fetch_push.py:19-101). The
TPU rebuild models both with the same capsule-arm + block physics on the
locobot workspace; the Fetch arm geometry difference only affects the
rendered silhouette and is absorbed by the capsule radii.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from robot_aware_control_tpu.envs.base import ACTION_SCALE, RobotEnv


class ClutterPushEnv(RobotEnv):
    action_dim = 2
    num_objects = 3

    def step(self, action):
        a = np.zeros(5, np.float32)
        a[:2] = np.clip(np.asarray(action, np.float32).ravel()[:2], -1, 1)
        return super().step(a)

    def _get_obs(self):
        obs = super()._get_obs()
        obs["obj_poses"] = np.asarray(self.state.obj_pos).copy()
        return obs

    def generate_demo(self, behavior: str = "push_one"):
        """Push a random block a random planar direction (reference demo
        generation: clutter_push.py 'generate demos' scripts)."""
        obs = self.reset()
        history = defaultdict(list)
        history["obs"].append(obs)
        # start sim state so runners can replay from the demo's
        # initial conditions (reference: episode_runner.py:121-139)
        history["sim_start"] = self.get_flattened_state()
        cfg = self._config
        ep_len = getattr(cfg, "demo_length", 12) if cfg else 12
        obj_i = self.rng.randint(self.num_objects)
        history["pushed_obj"] = obj_i
        theta = self.rng.uniform(-np.pi, np.pi)
        push_dir = np.array([np.cos(theta), np.sin(theta)], np.float32)
        for t in range(ep_len - 1):
            eef = np.asarray(self.state.eef)
            block = np.asarray(self.state.obj_pos[obj_i])
            behind = block[:2] - 0.05 * push_dir
            if t < 4 and np.linalg.norm(eef[:2] - behind) > 0.02:
                delta = behind - eef[:2]
            else:
                delta = push_dir * 0.03
            a = np.clip(delta / ACTION_SCALE, -1, 1).astype(np.float32)
            obs, _, _, _ = self.step(a)
            history["obs"].append(obs)
            history["ac"].append(np.pad(a, (0, 3)))
        return history


class FetchPushEnv(ClutterPushEnv):
    """Single-block Fetch push (reference: fetch_push.py:19-101)."""

    num_objects = 1
