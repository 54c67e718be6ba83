"""On-device robot mask rendering via projected capsules.

The reference obtains robot segmentation masks by setting joint angles in
MuJoCo and reading a segmentation render per frame, serially on the host
(reference: src/env/robotics/masks/base_mask_env.py:73-82, called per
candidate/per step from the planner — src/cem/pick/trajectory_sampler.py:
253-266 — the reference's worst hot path). That cannot live inside a TPU
rollout graph.

TPU-native redesign: the arm silhouette is a union of *capsules* (line
segments with radii) given by forward kinematics. Each capsule's endpoints
project through the camera (intrinsics + extrinsics); the pixel-space
radius scales with 1/depth. A pixel belongs to the mask if its distance to
any projected segment is within the interpolated radius — a pure
vectorized jnp computation, batched over (candidates x horizon) and fused
by XLA into the rollout program. "Thick" masks (reference:
LocobotMaskEnv(thick=True), src/dataset/locobot/locobot_model.py:30) are a
radius scale.

For dataset-faithful masks at training time the HDF5 masks are used as-is;
a MuJoCo-backed renderer with identical API lives in envs/mask_envs.py for
host-side parity and calibration checks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.data import calibration as calib
from robot_aware_control_tpu.robot import locobot_kinematics as lk

# per-segment radii (m) for [trunk, shoulder link, forearm, gripper]
LOCOBOT_RADII = np.array([0.045, 0.042, 0.038, 0.050], np.float32)
THICK_SCALE = 1.45


class CapsuleMaskRenderer:
    """Projects FK capsules into the image plane. All math is traceable."""

    def __init__(
        self,
        image_size: Tuple[int, int] = (48, 64),  # (h, w)
        camera_key: str = "locobot_c0",
        cam_name: str = "intel_realsense_d435",
        radii: Optional[np.ndarray] = None,
        thick: bool = False,
        modified: bool = False,
    ):
        self.h, self.w = image_size
        w2c = calib.get_world_to_camera(camera_key)
        K = calib.CAM_INTRINSICS[cam_name]
        ow, oh = calib.CAM_RESOLUTION[cam_name]
        self._w2c = jnp.asarray(w2c, jnp.float32)
        # fold the target-resolution rescale into the intrinsics
        S = np.diag([self.w / ow, self.h / oh, 1.0])
        self._K = jnp.asarray(S @ K, jnp.float32)
        r = LOCOBOT_RADII if radii is None else np.asarray(radii, np.float32)
        self.radii = jnp.asarray(r * (THICK_SCALE if thick else 1.0))
        self.l3 = lk.L3_MODIFIED if modified else lk.L3
        ys = jnp.arange(self.h, dtype=jnp.float32) + 0.5
        xs = jnp.arange(self.w, dtype=jnp.float32) + 0.5
        self._py, self._px = jnp.meshgrid(ys, xs, indexing="ij")

    # ------------------------------------------------------------------
    def _project(self, pts):
        """world (..., 3) -> (u (...,), v (...,), depth (...,))."""
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        ph = jnp.concatenate([pts, ones], -1)
        cam = jnp.einsum("ij,...j->...i", self._w2c[:3], ph)
        z = jnp.maximum(cam[..., 2], 1e-4)
        u = self._K[0, 0] * cam[..., 0] / z + self._K[0, 2]
        v = self._K[1, 1] * cam[..., 1] / z + self._K[1, 2]
        return u, v, z

    def segment_params(self, qpos):
        """FK + projection -> per-capsule pixel-space parameters
        (..., 4, 6) = [au, av, bu, bv, ra, rb]."""
        pts = lk.fk_points(qpos, self.l3)
        u, v, z = self._project(pts)
        f = self._K[0, 0]
        r_a = f * self.radii / jnp.maximum(z[..., :-1], 1e-4)
        r_b = f * self.radii / jnp.maximum(z[..., 1:], 1e-4)
        return jnp.stack(
            [u[..., :-1], v[..., :-1], u[..., 1:], v[..., 1:], r_a, r_b], -1
        )

    def render_pallas(self, qpos, interpret: bool = False):
        """Pallas-kernel path: one program per mask, all intermediates in
        VMEM (ops/pallas_kernels.py). Same output as `render`."""
        from robot_aware_control_tpu.ops.pallas_kernels import (
            capsule_mask_render,
        )

        segs = self.segment_params(qpos)
        lead = segs.shape[:-2]
        flat = segs.reshape((-1,) + segs.shape[-2:]).astype(jnp.float32)
        masks = capsule_mask_render(flat, self.h, self.w, interpret=interpret)
        return masks.reshape(lead + (self.h, self.w, 1))

    def render(self, qpos):
        """qpos (..., >=4) -> mask (..., h, w, 1) float32 in {0,1}."""
        pts = lk.fk_points(qpos, self.l3)  # (..., 5, 3)
        u, v, z = self._project(pts)  # (..., 5)

        a_u, b_u = u[..., :-1], u[..., 1:]  # (..., 4) segment endpoints
        a_v, b_v = v[..., :-1], v[..., 1:]
        a_z, b_z = z[..., :-1], z[..., 1:]

        # pixel-space radius at each endpoint: f * r / depth
        f = self._K[0, 0]
        r_a = f * self.radii / a_z
        r_b = f * self.radii / b_z

        # distance from every pixel to every segment, radius lerped along t
        px = self._px.reshape((1,) * (a_u.ndim) + self._px.shape)  # (...,1?,h,w)
        py = self._py.reshape((1,) * (a_u.ndim) + self._py.shape)
        au = a_u[..., None, None]
        av = a_v[..., None, None]
        bu = b_u[..., None, None]
        bv = b_v[..., None, None]
        dx, dy = bu - au, bv - av
        seg_len2 = dx * dx + dy * dy + 1e-8
        t = jnp.clip(((px - au) * dx + (py - av) * dy) / seg_len2, 0.0, 1.0)
        cx = au + t * dx
        cy = av + t * dy
        dist = jnp.sqrt((px - cx) ** 2 + (py - cy) ** 2)
        rad = r_a[..., None, None] * (1 - t) + r_b[..., None, None] * t
        hit = dist <= rad  # (..., 4, h, w)
        mask = jnp.any(hit, axis=-3)
        return mask[..., None].astype(jnp.float32)


def render_trajectory_masks(renderer: CapsuleMaskRenderer, qpos):
    """qpos (T, N, >=4) -> (T, N, h, w, 1)."""
    return renderer.render(qpos)
