"""On-device scene renderer for the simulation environments.

The reference renders observations with MuJoCo's OpenGL pipeline on the host
(reference: src/env/robotics/robot_env.py:20-217, per-frame `render()` +
segmentation masks via base_mask_env.py:73-82). TPU-native redesign: the
scene (table plane, colored object blocks, the capsule-modeled arm) is
rasterized analytically in jnp through the same calibrated camera used by
the mask renderer — branchless, batched over arbitrary leading dims, and
traceable, so ground-truth-physics CEM rollouts can render and score
thousands of candidate trajectories in one device program (the reference
fans gt rollouts over a multiprocessing pool instead —
src/cem/mujoco/trajectory_sampler.py:230-316).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.robot import locobot_kinematics as lk
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer

ARM_COLOR = np.array([0.25, 0.25, 0.28], np.float32)
GRIPPER_COLOR = np.array([0.55, 0.55, 0.60], np.float32)
TABLE_COLOR = np.array([0.47, 0.35, 0.24], np.float32)
FLOOR_COLOR = np.array([0.62, 0.62, 0.66], np.float32)


class SceneRenderer(CapsuleMaskRenderer):
    """RGB + robot-mask rendering of the tabletop scene."""

    def __init__(self, image_size=(48, 64), camera_key: str = "locobot_c0",
                 table_z: float = 0.1, modified: bool = False,
                 arm_color=None, radii=None):
        super().__init__(image_size, camera_key, thick=False,
                         modified=modified, radii=radii)
        self.arm_color = np.asarray(
            ARM_COLOR if arm_color is None else arm_color, np.float32
        )
        self.table_z = table_z
        # background: floor with the table plane projected analytically —
        # every pixel whose camera ray hits z=table_z inside the workspace
        # is table-colored, with a soft shading gradient.
        self._bg = self._make_background()

    def _make_background(self):
        h, w = self.h, self.w
        # unproject pixel rays: x = (u - cx)/fx etc., intersect z=table_z
        K = np.asarray(self._K)
        w2c = np.asarray(self._w2c)
        R, t = w2c[:3, :3], w2c[:3, 3]
        c2w_R = R.T
        cam_origin = -R.T @ t
        ys, xs = np.meshgrid(
            np.arange(h, dtype=np.float32) + 0.5,
            np.arange(w, dtype=np.float32) + 0.5,
            indexing="ij",
        )
        dirs_cam = np.stack(
            [(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1],
             np.ones_like(xs)], -1,
        )
        dirs_w = dirs_cam @ c2w_R.T
        denom = dirs_w[..., 2]
        tt = (self.table_z - cam_origin[2]) / np.where(
            np.abs(denom) < 1e-6, 1e-6, denom
        )
        hit = (tt > 0) & (np.abs(denom) > 1e-6)
        pts = cam_origin + tt[..., None] * dirs_w
        on_table = (
            hit
            & (pts[..., 0] > -0.05) & (pts[..., 0] < 0.75)
            & (pts[..., 1] > -0.45) & (pts[..., 1] < 0.45)
        )
        shade = 1.0 - 0.25 * np.clip(pts[..., 0], 0, 0.7)
        bg = np.where(
            on_table[..., None],
            TABLE_COLOR * shade[..., None],
            FLOOR_COLOR * (1.0 - 0.3 * ys[..., None] / h),
        ).astype(np.float32)
        return jnp.asarray(bg)

    # ------------------------------------------------------------------
    def render_objects(self, obj_pos, obj_half, obj_colors):
        """Project blocks as squares scaled by 1/depth.

        obj_pos (..., K, 3); obj_half (K,) half-extents (m);
        obj_colors (K, 3). Returns (hit (..., K, h, w), depth (..., K))."""
        u, v, z = self._project(obj_pos)  # (..., K)
        f = self._K[0, 0]
        r_pix = f * jnp.asarray(obj_half) / z  # (..., K)
        px = self._px.reshape((1,) * u.ndim + self._px.shape)
        py = self._py.reshape((1,) * u.ndim + self._py.shape)
        du = jnp.abs(px - u[..., None, None])
        dv = jnp.abs(py - v[..., None, None])
        cheb = jnp.maximum(du, dv)
        hit = cheb <= r_pix[..., None, None]
        return hit, z

    def render_scene(self, qpos, obj_pos, obj_half, obj_colors,
                     include_arm: bool = True):
        """Full scene RGB + robot mask.

        qpos (..., >=4); obj_pos (..., K, 3); obj_half (K,);
        obj_colors (K, 3). Returns (rgb (..., h, w, 3), mask (..., h, w, 1)).
        include_arm=False renders the robot-less scene — the "object only"
        goal images central to robot-aware control (reference demo types,
        src/mbrl/episode_runner.py:92-99)."""
        mask = self.render(qpos)  # (..., h, w, 1)
        hit, z = self.render_objects(obj_pos, obj_half, obj_colors)
        bg = jnp.broadcast_to(self._bg, mask.shape[:-3] + self._bg.shape)
        img = bg
        # nearest-object-wins compositing (painter's algorithm by depth)
        order = jnp.argsort(-z, axis=-1)  # far to near
        K = hit.shape[-3]
        colors = jnp.asarray(obj_colors, jnp.float32)
        for k in range(K):
            idx = order[..., k]
            hk = jnp.take_along_axis(
                hit, idx[..., None, None, None], axis=-3
            )[..., 0, :, :]
            ck = colors[idx]  # (..., 3)
            img = jnp.where(hk[..., None], ck[..., None, None, :], img)
        if not include_arm:
            return img, jnp.zeros_like(mask)
        # arm drawn last (closest to camera in this workspace)
        pts = lk.fk_points(qpos, self.l3)
        u, v, zz = self._project(pts)
        arm = mask[..., 0] > 0.5
        # gripper tip highlighted for visual distinctiveness
        tip_r = self._K[0, 0] * 0.025 / jnp.maximum(zz[..., 4], 1e-4)
        px = self._px.reshape((1,) * (u.ndim - 1) + self._px.shape)
        py = self._py.reshape((1,) * (u.ndim - 1) + self._py.shape)
        tip = (
            jnp.sqrt(
                (px - u[..., 4, None, None]) ** 2
                + (py - v[..., 4, None, None]) ** 2
            )
            <= tip_r[..., None, None]
        )
        img = jnp.where(arm[..., None], jnp.asarray(self.arm_color), img)
        img = jnp.where(tip[..., None], jnp.asarray(GRIPPER_COLOR), img)
        return img, mask
