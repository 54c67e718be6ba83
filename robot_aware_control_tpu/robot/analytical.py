"""Analytical robot models: batched state + mask prediction, all on device.

Redesign of the reference's `LocobotAnalyticalModel.predict_batch`
(reference: src/dataset/locobot/locobot_model.py:104-206), which loops over
the batch in Python, calls scalar IK per step, and renders each mask via
MuJoCo. Here the whole (T, N) block is one jitted program: eef integration
+ batched IK (`lax.scan` over T), capsule mask rendering, and workspace
re-normalization — usable directly inside the CEM rollout graph.

The Franka / WX250s analytical models (reference:
src/dataset/franka/franka_model.py:14-97, src/dataset/wx250s/wx250s_model.py:
11-120) shift the eef into the locobot frame and delegate to the same
planar-push kinematics; on real hardware their IK services replace the
closed-form solver (hardware-gated in mbrl/ros shims).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.norm import (
    LOCO_FRANKA_DIFF,
    LOCO_WX250S_DIFF,
    LOCOBOT_HIGH,
    LOCOBOT_LOW,
    denormalize,
    normalize,
)
from robot_aware_control_tpu.robot import locobot_kinematics as lk
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer


class LocobotAnalyticalModel:
    """predict_batch with the reference's data contract, jitted end-to-end."""

    def __init__(self, config: Config, camera_key: str = "locobot_c0",
                 push_height: float = lk.PUSH_HEIGHT,
                 default_pitch: float = lk.DEFAULT_PITCH,
                 default_roll: float = lk.DEFAULT_ROLL):
        self._cfg = config
        self.push_height = push_height
        self.default_pitch = default_pitch
        self.default_roll = default_roll
        size = (config.image_height, config.image_width)
        self.renderer = CapsuleMaskRenderer(
            size, camera_key, thick=False, modified=config.modified
        )
        self.renderer_thick = CapsuleMaskRenderer(
            size, camera_key, thick=True, modified=config.modified
        )
        self._traj_fn = jax.jit(self._predict_trajectory, static_argnames=("thick",))

    # ------------------------------------------------------------------
    def _predict_trajectory(self, start_state_raw, start_qpos, actions,
                            low, high, thick: bool):
        """start_state_raw (N, 5) raw world eef; start_qpos (N, 5);
        actions (T, N, >=2); low/high (N, 5).

        Returns (states_norm (T+1, N, 5), masks (T+1, N, h, w, 1),
        qpos (T+1, N, 5))."""
        states_raw, qpos = lk.integrate_planar_actions(
            start_state_raw, start_qpos, actions[..., :2],
            push_height=self.push_height, pitch=self.default_pitch,
            roll=self.default_roll,
        )
        renderer = self.renderer_thick if thick else self.renderer
        masks = renderer.render(qpos)
        states_norm = normalize(states_raw, low[None], high[None])
        return states_norm, masks, qpos

    # ------------------------------------------------------------------
    def predict_batch(self, data, thick: bool = False):
        """Reference-contract entry (reference: locobot_model.py:104-138).

        data: {"states" (T+1,N,5) normalized (row 0 meaningful),
               "qpos" (T+1,N,5), "actions" (T,N,A), "low"/"high" (N,5)}
        Returns (pred_states (T+1,N,5) normalized, pred_masks (T+1,N,h,w,1)).
        """
        low = jnp.asarray(data["low"])
        high = jnp.asarray(data["high"])
        start_norm = jnp.asarray(data["states"])[0]
        start_raw = denormalize(start_norm, low, high)
        start_qpos = jnp.asarray(data["qpos"])[0]
        actions = jnp.asarray(data["actions"])
        states, masks, _ = self._traj_fn(
            start_raw, start_qpos, actions, low, high, thick
        )
        return states, masks


class FrankaAnalyticalModel(LocobotAnalyticalModel):
    """Franka planar-push model: states arrive in the franka frame and are
    shifted into the locobot frame before the shared kinematics
    (reference: src/dataset/franka/franka_model.py:14-97,
    src/cem/trajectory_sampler.py:93-94)."""

    FRAME_SHIFT = LOCO_FRANKA_DIFF

    def to_locobot_frame(self, state):
        state = np.asarray(state, np.float32).copy()
        state[..., :2] += self.FRAME_SHIFT
        return state


class WX250sAnalyticalModel(LocobotAnalyticalModel):
    """WX250s planar-push model (reference: src/dataset/wx250s/
    wx250s_model.py:11-120); measured frame shift
    (reference: src/utils/camera_calibration.py LOCO_WX250S_DIFF)."""

    FRAME_SHIFT = LOCO_WX250S_DIFF

    def to_locobot_frame(self, state):
        state = np.asarray(state, np.float32).copy()
        state[..., :2] += self.FRAME_SHIFT
        return state


class ChainAnalyticalModel:
    """Native-frame analytical model for any chain robot (sawyer, baxter,
    widowx, franka, kuka, fetch, wx250s): planar eef integration in the
    robot's OWN frame, batched damped-least-squares chain IK
    (kinematic_chain.KinematicChain.ik), capsule masks from the chain's
    own geometry. Completes the capability the reference implements with
    per-robot PyBullet IK controllers + MuJoCo mask envs
    (reference: src/env/robotics/controllers/*.py,
    src/env/robotics/masks/*_mask_env.py)."""

    def __init__(self, cfg: Config, robot: str,
                 camera_key: str = None, push_height: float = 0.15):
        from robot_aware_control_tpu.robot.kinematic_chain import (
            CHAINS,
            get_mask_env,
        )

        self.cfg = cfg
        self.chain = CHAINS[robot]
        self.env = get_mask_env(
            robot, **({"camera_key": camera_key} if camera_key else {})
        )
        self.push_height = push_height

    def predict_trajectory(self, start_eef, start_qpos, actions):
        """start_eef (3,) raw, start_qpos (dof,), actions (T, N, >=2)
        planar metric displacements -> (states (T+1, N, 3),
        qpos (T+1, N, dof), masks (T+1, N, h, w, 1))."""
        T, N = actions.shape[0], actions.shape[1]
        eef0 = jnp.broadcast_to(jnp.asarray(start_eef, jnp.float32), (N, 3))
        deltas = jnp.concatenate(
            [jnp.asarray(actions[..., :2], jnp.float32),
             jnp.zeros((T, N, 1), jnp.float32)], -1,
        )
        eefs = eef0[None] + jnp.cumsum(deltas, axis=0)
        eefs = eefs.at[..., 2].set(self.push_height)
        eefs = jnp.concatenate([eef0[None], eefs], 0)  # (T+1, N, 3)
        q0 = jnp.broadcast_to(
            jnp.asarray(start_qpos, jnp.float32)[: self.chain.dof],
            (T + 1, N, self.chain.dof),
        )
        qpos, _ = self.chain.ik(eefs, q0)
        masks = self.env.generate_masks(qpos)
        return eefs, qpos, masks


def get_robot_model(cfg: Config, **kw):
    """Experiment-keyed dispatch (reference: src/cem/trajectory_sampler.py:
    26-33, src/prediction/trainer.py:123-130)."""
    if cfg.experiment == "control_franka":
        return FrankaAnalyticalModel(cfg, **kw)
    if cfg.experiment == "control_wx250s":
        return WX250sAnalyticalModel(cfg, **kw)
    return LocobotAnalyticalModel(cfg, **kw)
