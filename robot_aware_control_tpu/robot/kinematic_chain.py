"""Generic serial-arm kinematic chains + per-robot capsule mask envs.

The reference renders robot segmentation masks by loading each robot's MJCF
into MuJoCo and reading segmentation images (reference:
src/env/robotics/masks/base_mask_env.py:8-82 and the per-robot mask envs
sawyer_mask_env.py:21-80, baxter_mask_env.py, widowx_mask_env.py,
franka_mask_env.py, kuka_mask_env.py, fetch_mask_env.py,
wx250s_mask_env.py — ~1,660 LoC + meshes). TPU-native redesign: each robot
is a serial chain of revolute joints (fixed link offset + joint axis); FK
is a batched jnp scan of 4x4 transforms and the silhouette is the union of
capsules between consecutive joint origins, projected through the
calibrated camera — the same formulation as the locobot renderer
(robot/mask_renderer.py) generalized to arbitrary chains.

Link geometry uses nominal published arm dimensions; capsule radii
approximate link thickness. `generate_masks(qpos)` matches the reference
MaskEnv API (base_mask_env.py:73-82) but is batched and traceable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.data import calibration as calib


def _rot(axis, th):
    """Batched axis-angle rotation matrices. axis (3,), th (...,)."""
    x, y, z = axis
    c, s = jnp.cos(th), jnp.sin(th)
    C = 1 - c
    return jnp.stack([
        jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
        jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
    ], -2)


@dataclass(frozen=True)
class KinematicChain:
    """offsets: (L, 3) fixed translation before joint i (in parent frame);
    axes: (L, 3) unit rotation axes; radii: (L,) capsule radii between
    joint i and i+1 origins; tip: (3,) offset from the last joint."""

    name: str
    offsets: np.ndarray
    axes: np.ndarray
    radii: np.ndarray
    tip: np.ndarray
    base: np.ndarray  # (3,) world position of the chain base

    @property
    def dof(self) -> int:
        return len(self.axes)

    def fk_points(self, qpos):
        """qpos (..., >=dof) -> (..., dof+2, 3) world joint origins
        (base + each joint origin + tip)."""
        q = qpos[..., : self.dof]
        batch = q.shape[:-1]
        pos = jnp.broadcast_to(jnp.asarray(self.base, jnp.float32),
                               batch + (3,))
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), batch + (3, 3))
        pts = [pos]
        for i in range(self.dof):
            off = jnp.asarray(self.offsets[i], jnp.float32)
            pos = pos + jnp.einsum("...ij,j->...i", R, off)
            R = jnp.einsum("...ij,...jk->...ik", R,
                           _rot(self.axes[i], q[..., i]))
            pts.append(pos)
        tip = pos + jnp.einsum("...ij,j->...i", R,
                               jnp.asarray(self.tip, jnp.float32))
        pts.append(tip)
        return jnp.stack(pts, -2)

    def fk_full(self, qpos):
        """Like fk_points but also returns world joint axes:
        (pts (..., dof+2, 3), axes_world (..., dof, 3))."""
        q = qpos[..., : self.dof]
        batch = q.shape[:-1]
        pos = jnp.broadcast_to(jnp.asarray(self.base, jnp.float32),
                               batch + (3,))
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), batch + (3, 3))
        pts = [pos]
        axes_w = []
        for i in range(self.dof):
            off = jnp.asarray(self.offsets[i], jnp.float32)
            pos = pos + jnp.einsum("...ij,j->...i", R, off)
            ax = jnp.asarray(self.axes[i], jnp.float32)
            axes_w.append(jnp.einsum("...ij,j->...i", R, ax))
            R = jnp.einsum("...ij,...jk->...ik", R, _rot(self.axes[i], q[..., i]))
            pts.append(pos)
        tip = pos + jnp.einsum("...ij,j->...i", R,
                               jnp.asarray(self.tip, jnp.float32))
        pts.append(tip)
        return jnp.stack(pts, -2), jnp.stack(axes_w, -2)

    def ik(self, target, q0=None, iters: int = 60, damping: float = 5e-2,
           joint_limit: float = 2.9, tol: float = 5e-3):
        """Batched damped-least-squares position IK.

        The reference solves non-locobot IK with per-robot PyBullet
        controllers host-side, one query at a time (reference:
        src/env/robotics/controllers/*.py, 1,644 LoC). Here one traceable
        Gauss-Newton/DLS loop serves every chain: the position Jacobian
        column for revolute joint i is axis_w_i x (tip - p_i), and the
        damped normal equations are a batched 3x3 solve — vmappable over
        thousands of targets on device.

        target (..., 3) world positions; q0 (..., dof) initial config.
        Multi-start (3 seeds + optional q0) picks the best converged
        solution per target. Returns (qpos (..., dof), valid (...,))."""
        target = jnp.asarray(target, jnp.float32)
        batch = target.shape[:-1]
        seeds = [jnp.full((self.dof,), s, jnp.float32)
                 for s in (0.1, 0.6, -0.6)]
        starts = [jnp.broadcast_to(s, batch + (self.dof,)) for s in seeds]
        if q0 is not None:
            starts.insert(0, jnp.broadcast_to(
                jnp.asarray(q0, jnp.float32)[..., : self.dof],
                batch + (self.dof,),
            ))

        eye3 = jnp.eye(3, dtype=jnp.float32)

        def solve(q):
            def body(q, _):
                pts, axes_w = self.fk_full(q)
                tip = pts[..., -1, :]
                err = target - tip  # (..., 3)
                arm = tip[..., None, :] - pts[..., 1:-1, :]  # (..., dof, 3)
                Jcols = jnp.cross(axes_w, arm)  # (..., dof, 3)
                J = jnp.swapaxes(Jcols, -1, -2)  # (..., 3, dof)
                A = J @ jnp.swapaxes(J, -1, -2) + (damping ** 2) * eye3
                dq = jnp.einsum(
                    "...dk,...k->...d", Jcols,
                    jnp.linalg.solve(A, err[..., None])[..., 0],
                )
                q = jnp.clip(q + dq, -joint_limit, joint_limit)
                return q, None

            q, _ = jax.lax.scan(body, q, None, length=iters)
            tip = self.fk_points(q)[..., -1, :]
            return q, jnp.linalg.norm(target - tip, axis=-1)

        qs, errs = zip(*[solve(s) for s in starts])
        qs = jnp.stack(qs)           # (S, ..., dof)
        errs = jnp.stack(errs)       # (S, ...)
        best = jnp.argmin(errs, axis=0)
        q = jnp.take_along_axis(
            qs, best[None, ..., None], axis=0
        )[0]
        err = jnp.take_along_axis(errs, best[None], axis=0)[0]
        return q, err < tol


def _chain(name, base, segs, tip, axes):
    """segs: list of (offset xyz, radius)."""
    offsets = np.asarray([s[0] for s in segs], np.float32)
    radii = np.asarray([s[1] for s in segs], np.float32)
    return KinematicChain(
        name=name, offsets=offsets, axes=np.asarray(axes, np.float32),
        radii=radii, tip=np.asarray(tip, np.float32),
        base=np.asarray(base, np.float32),
    )


Z = (0, 0, 1.0)
Y = (0, 1.0, 0)
X = (1.0, 0, 0)

# nominal link geometry per robot (base near the locobot workspace so the
# shared camera registry applies; radii approximate link thickness)
CHAINS: Dict[str, KinematicChain] = {
    "sawyer": _chain(
        "sawyer", (0.0, 0.0, 0.08),
        [((0, 0, 0.317), 0.09), ((0.081, 0.05, 0.14), 0.08),
         ((0, -0.03, 0.26), 0.07), ((0, 0.03, 0.127), 0.06),
         ((0, 0, 0.275), 0.055), ((0, 0.01, 0.105), 0.05),
         ((0, 0, 0.10), 0.045)],
        (0, 0, 0.11),
        [Z, Y, X, Y, X, Y, X],
    ),
    "baxter": _chain(
        "baxter", (0.0, 0.0, 0.1),
        [((0.06, 0, 0.27), 0.10), ((0.07, 0, 0.0), 0.08),
         ((0.1, 0, -0.0), 0.08), ((0.26, 0, 0), 0.07),
         ((0.12, 0, 0), 0.06), ((0.26, 0, 0), 0.055),
         ((0.1, 0, 0), 0.05)],
        (0.12, 0, 0),
        [Z, Y, X, Y, X, Y, X],
    ),
    "widowx": _chain(
        "widowx", (0.1, 0.0, 0.09),
        [((0, 0, 0.125), 0.05), ((0, 0, 0.04), 0.045),
         ((0.05, 0, 0.14), 0.04), ((0.14, 0, 0), 0.035),
         ((0.05, 0, 0), 0.03)],
        (0.1, 0, 0),
        [Z, Y, Y, Y, X],
    ),
    "franka": _chain(
        "franka", (0.0, 0.0, 0.06),
        [((0, 0, 0.333), 0.08), ((0, 0, 0), 0.07),
         ((0, -0.0, 0.316), 0.065), ((0.0825, 0, 0), 0.06),
         ((-0.0825, 0, 0.384), 0.055), ((0, 0, 0), 0.05),
         ((0.088, 0, 0), 0.045)],
        (0, 0, 0.107),
        [Z, Y, Z, Y, Z, Y, Z],
    ),
    "kuka": _chain(
        "kuka", (0.0, 0.0, 0.05),
        [((0, 0, 0.34), 0.09), ((0, 0, 0), 0.08),
         ((0, 0, 0.4), 0.07), ((0, 0, 0), 0.065),
         ((0, 0, 0.4), 0.06), ((0, 0, 0), 0.05),
         ((0, 0, 0.126), 0.045)],
        (0, 0, 0.08),
        [Z, Y, Z, Y, Z, Y, Z],
    ),
    "fetch": _chain(
        "fetch", (0.0, 0.0, 0.3),
        [((0.12, 0, 0.3), 0.10), ((0.117, 0, 0.06), 0.08),
         ((0.219, 0, 0), 0.07), ((0.133, 0, 0), 0.065),
         ((0.197, 0, 0), 0.06), ((0.1245, 0, 0), 0.05),
         ((0.1385, 0, 0), 0.045)],
        (0.15, 0, 0),
        [Z, Y, X, Y, X, Y, X],
    ),
    "wx250s": _chain(
        "wx250s", (0.1, 0.0, 0.08),
        [((0, 0, 0.11), 0.05), ((0.05, 0, 0.25), 0.045),
         ((0.25, 0, 0), 0.04), ((0.066, 0, 0), 0.035),
         ((0.065, 0, 0), 0.03), ((0.043, 0, 0), 0.03)],
        (0.09, 0, 0),
        [Z, Y, Y, X, Y, X],
    ),
}


# register per-robot default viewpoints framing the whole arm (the shared
# workspace cameras are tuned for the tabletop and crop tall arms)
for _name, _c in CHAINS.items():
    _center = _c.base + np.array([0.15, 0.0, 0.35])
    _eye = _c.base + np.array([1.5, 0.9, 0.9])
    calib.register_camera(f"{_name}_mask_c0", calib.look_at(_eye, _center))


class ChainMaskEnv:
    """Per-robot mask renderer with the reference MaskEnv API
    (reference: base_mask_env.py:73-82): `generate_masks(qpos_list)` returns
    one binary mask per configuration — here batched and jit-compiled."""

    def __init__(self, robot: str, image_size: Tuple[int, int] = (48, 64),
                 camera_key: Optional[str] = None,
                 cam_name: str = "intel_realsense_d435",
                 thick: bool = False):
        self.chain = CHAINS[robot]
        self.robot = robot
        self.h, self.w = image_size
        key = camera_key or f"{robot}_mask_c0"
        w2c = calib.get_world_to_camera(key)
        K = calib.CAM_INTRINSICS[cam_name]
        ow, oh = calib.CAM_RESOLUTION[cam_name]
        S = np.diag([self.w / ow, self.h / oh, 1.0])
        self._w2c = jnp.asarray(w2c, jnp.float32)
        self._K = jnp.asarray(S @ K, jnp.float32)
        scale = 1.45 if thick else 1.0
        # one capsule per consecutive joint-origin pair (dof+1 segments)
        radii = np.concatenate([
            self.chain.radii, self.chain.radii[-1:]
        ]) * scale
        self.radii = jnp.asarray(radii, jnp.float32)
        ys = jnp.arange(self.h, dtype=jnp.float32) + 0.5
        xs = jnp.arange(self.w, dtype=jnp.float32) + 0.5
        self._py, self._px = jnp.meshgrid(ys, xs, indexing="ij")
        self._render = jax.jit(self._render_impl)

    def _project(self, pts):
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        cam = jnp.einsum("ij,...j->...i", self._w2c[:3],
                         jnp.concatenate([pts, ones], -1))
        z = jnp.maximum(cam[..., 2], 1e-4)
        u = self._K[0, 0] * cam[..., 0] / z + self._K[0, 2]
        v = self._K[1, 1] * cam[..., 1] / z + self._K[1, 2]
        return u, v, z

    def _render_impl(self, qpos):
        pts = self.chain.fk_points(qpos)  # (..., S+1, 3)
        u, v, z = self._project(pts)
        a_u, b_u = u[..., :-1], u[..., 1:]
        a_v, b_v = v[..., :-1], v[..., 1:]
        a_z, b_z = z[..., :-1], z[..., 1:]
        f = self._K[0, 0]
        r_a = f * self.radii / a_z
        r_b = f * self.radii / b_z
        px = self._px.reshape((1,) * a_u.ndim + self._px.shape)
        py = self._py.reshape((1,) * a_u.ndim + self._py.shape)
        au, av = a_u[..., None, None], a_v[..., None, None]
        bu, bv = b_u[..., None, None], b_v[..., None, None]
        dx, dy = bu - au, bv - av
        seg_len2 = dx * dx + dy * dy + 1e-8
        t = jnp.clip(((px - au) * dx + (py - av) * dy) / seg_len2, 0.0, 1.0)
        dist = jnp.sqrt((px - (au + t * dx)) ** 2 + (py - (av + t * dy)) ** 2)
        rad = r_a[..., None, None] * (1 - t) + r_b[..., None, None] * t
        mask = jnp.any(dist <= rad, axis=-3)
        return mask[..., None].astype(jnp.float32)

    def generate_masks(self, qpos) -> np.ndarray:
        """(reference: base_mask_env.py:73-82). qpos (..., >=dof)."""
        return np.asarray(self._render(jnp.asarray(qpos, jnp.float32)))


def get_mask_env(robot: str, **kw) -> ChainMaskEnv:
    """Per-robot dispatch matching the reference env classes
    (SawyerMaskEnv, BaxterMaskEnv, WidowXMaskEnv, FrankaMaskEnv,
    KukaMaskEnv, FetchMaskEnv, WX250sMaskEnv)."""
    if robot == "locobot":
        from robot_aware_control_tpu.robot.mask_renderer import (
            CapsuleMaskRenderer,
        )

        class _Locobot:
            def __init__(self, **kw2):
                self.r = CapsuleMaskRenderer(**kw2)

            def generate_masks(self, qpos):
                return np.asarray(self.r.render(jnp.asarray(qpos)))

        return _Locobot(**kw)
    return ChainMaskEnv(robot, **kw)
