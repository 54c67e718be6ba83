"""DeepMind Control suite wrapper (import-gated).

Reference parity: src/env/robotics/dmc_env.py wraps dm_control tasks behind
the same gym-style obs contract. dm_control is not part of this image, so
the wrapper raises with instructions unless it is importable; when present
it exposes reset/step with pixel observations like the other envs."""

from __future__ import annotations

import numpy as np


class DMCEnv:
    def __init__(self, domain: str = "cartpole", task: str = "swingup",
                 image_size=(48, 64), seed: int = 0):
        try:
            from dm_control import suite
        except ImportError as e:  # pragma: no cover - optional dep
            raise RuntimeError(
                "dm_control is not installed in this image; DMCEnv is an "
                "optional wrapper (reference: src/env/robotics/dmc_env.py)."
            ) from e
        self._env = suite.load(domain, task, task_kwargs={"random": seed})
        self._h, self._w = image_size

    def reset(self):
        ts = self._env.reset()
        return self._obs(ts)

    def step(self, action):
        ts = self._env.step(np.asarray(action))
        return self._obs(ts), ts.reward or 0.0, ts.last(), {}

    def _obs(self, ts):  # pragma: no cover - optional dep
        img = self._env.physics.render(self._h, self._w, camera_id=0)
        return {
            "observation": np.asarray(img, np.float32) / 255.0,
            "states": np.concatenate(
                [np.ravel(v) for v in ts.observation.values()]
            ).astype(np.float32),
        }
