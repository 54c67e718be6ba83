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

# per-segment radii (m) for [trunk, shoulder link, forearm, gripper],
# tuned against MuJoCo segmentation renders of the reference locobot.xml
# (benchmarks/mask_fidelity.py --tune; held-out protocol: tuned on seed-0
# IK poses, fidelity reported on the disjoint seed-1 set — RESULTS.md)
LOCOBOT_RADII = np.array([0.045, 0.046, 0.028, 0.042], np.float32)
# the reference's "thick" MJCF only inflates the gripper/finger meshes 1.2x
# (locobot_thick.xml vs locobot.xml mesh scales); model that as a
# gripper-capsule radius scale rather than a global one
THICK_SCALE = 1.2

# Static base silhouette: world-frame capsules fitted to the reference
# MJCF world-body geoms (locobot.xml: round mobile base cylinder r=0.178
# at z=0.07, camera-mount plates at x=0.053 spanning y +-0.108 / z 0..0.27,
# battery block, arm support column). The reference's segmentation masks
# include these base geoms (masks/base_mask_env.py:42-63 marks every robot
# geom), so the capsule mask must too. Radii tuned against MuJoCo
# segmentation renders by benchmarks/mask_fidelity.py.
LOCOBOT_BASE_SEGMENTS = np.array(
    [
        [[-0.14, 0.0, 0.07], [0.10, 0.0, 0.07]],      # mobile base (x)
        [[0.0, -0.10, 0.07], [0.0, 0.10, 0.07]],      # mobile base (y)
        [[0.053, -0.08, 0.15], [0.053, 0.08, 0.15]],  # camera plates
        [[-0.005, 0.0, 0.06], [-0.005, 0.0, 0.20]],   # battery column
    ],
    np.float32,
)
LOCOBOT_BASE_RADII = np.array([0.10, 0.10, 0.08, 0.025], np.float32)


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
        include_base: bool = True,
        base_segments: Optional[np.ndarray] = None,
        base_radii: Optional[np.ndarray] = None,
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
        if thick:  # gripper-only inflation, like locobot_thick.xml
            r = r.copy()
            r[-1] = r[-1] * THICK_SCALE
        self.radii = jnp.asarray(r)
        self.l3 = lk.L3_MODIFIED if modified else lk.L3
        if include_base:
            bs = (LOCOBOT_BASE_SEGMENTS if base_segments is None
                  else np.asarray(base_segments, np.float32))
            br = (LOCOBOT_BASE_RADII if base_radii is None
                  else np.asarray(base_radii, np.float32))
            self.base_segments = jnp.asarray(bs)
            self.base_radii = jnp.asarray(br)
        else:
            self.base_segments = None
            self.base_radii = None
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

    def _capsules(self, qpos):
        """FK + static base -> (a (...,S,3), b (...,S,3), radii (S,))."""
        pts = lk.fk_points(qpos, self.l3)  # (..., 5, 3)
        a, b = pts[..., :-1, :], pts[..., 1:, :]
        radii = self.radii
        if self.base_segments is not None:
            lead = a.shape[:-2]
            nb = self.base_segments.shape[0]
            ba = jnp.broadcast_to(self.base_segments[:, 0], lead + (nb, 3))
            bb = jnp.broadcast_to(self.base_segments[:, 1], lead + (nb, 3))
            a = jnp.concatenate([a, ba], -2)
            b = jnp.concatenate([b, bb], -2)
            radii = jnp.concatenate([radii, self.base_radii])
        return a, b, radii

    def segment_params(self, qpos):
        """FK + projection -> per-capsule pixel-space parameters
        (..., S, 6) = [au, av, bu, bv, ra, rb]."""
        pa, pb, radii = self._capsules(qpos)
        ua, va, za = self._project(pa)
        ub, vb, zb = self._project(pb)
        f = self._K[0, 0]
        r_a = f * radii / jnp.maximum(za, 1e-4)
        r_b = f * radii / jnp.maximum(zb, 1e-4)
        return jnp.stack([ua, va, ub, vb, r_a, r_b], -1)

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
        pa, pb, radii = self._capsules(qpos)
        a_u, a_v, a_z = self._project(pa)  # (..., S)
        b_u, b_v, b_z = self._project(pb)

        # pixel-space radius at each endpoint: f * r / depth
        f = self._K[0, 0]
        r_a = f * radii / a_z
        r_b = f * radii / b_z

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


    def render_heatmaps(self, eef, sx=5.0, sy=5.0, height=100.0):
        """Traceable eef gaussian heatmaps: eef (..., 3) raw world
        positions -> (..., h, w, 1) float32.

        Same gaussian/projection math as the host data layer
        (data/heatmaps.py, reference: robonet_dataset.py:482-544) but pure
        jnp, so the planner can condition heatmap-trained models on
        PREDICTED states inside the rollout graph — the reference planner
        always passes heatmap=None (src/cem/trajectory_sampler.py:135)."""
        u, v, _ = self._project(eef)  # (...,)
        # data-layer grid is integer-indexed (np.arange); ours is +0.5
        px = self._px - 0.5
        py = self._py - 0.5
        ue = u[..., None, None]
        ve = v[..., None, None]
        g = height / (2.0 * jnp.pi * sx * sy) * jnp.exp(
            -((px - ue) ** 2 / (2 * sx ** 2) + (py - ve) ** 2 / (2 * sy ** 2))
        )
        g = jnp.clip(g, 0.0, 1.0)
        in_frame = ((u >= 0) & (u < self.w) & (v >= 0) & (v < self.h))
        g = g * in_frame[..., None, None]
        return g[..., None].astype(jnp.float32)


def render_trajectory_masks(renderer: CapsuleMaskRenderer, qpos):
    """qpos (T, N, >=4) -> (T, N, h, w, 1)."""
    return renderer.render(qpos)
