"""Measured serial-arm kinematic chains + per-robot capsule mask envs.

The reference renders robot segmentation masks by loading each robot's MJCF
into MuJoCo and reading segmentation images (reference:
src/env/robotics/masks/base_mask_env.py:8-82 and the per-robot mask envs
sawyer_mask_env.py:21-80, baxter_mask_env.py, widowx_mask_env.py,
franka_mask_env.py, kuka_mask_env.py, fetch_mask_env.py,
wx250s_mask_env.py — ~1,660 LoC + meshes). TPU-native redesign: each robot
is a product-of-exponentials chain *measured from the reference MJCF*
(zero-pose world joint anchors/axes + one fitted capsule per robot geom —
see benchmarks/extract_chain_geometry.py and robot/_chain_data.py); FK is
a short unrolled jnp product of rotations, the silhouette is the union of
those capsules rigidly attached to their driven-joint frames, projected
through the *measured* camera extrinsics the reference ships
(src/utils/camera_calibration.py via data/calibration.py) with the MJCF
main_cam's fovy intrinsics (e.g. sawyer/robot.xml:34, fovy=43.3).

`generate_masks(qpos)` matches the reference MaskEnv API
(base_mask_env.py:73-82) but is batched, jit-compiled, and differentiable.
Fidelity vs MuJoCo segmentation renders is quantified per robot by
benchmarks/mask_fidelity.py (IoU table in RESULTS.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.data import calibration as calib
from robot_aware_control_tpu.robot._chain_data import CHAIN_DATA

try:  # radii tuned against MuJoCo segmentation renders (mask_fidelity.py)
    from robot_aware_control_tpu.robot._chain_tuned import TUNED_RADII
except ImportError:  # pragma: no cover - tuning not yet run
    TUNED_RADII = {}
try:  # per-capsule axial extensions from the same held-out tuning pass
    from robot_aware_control_tpu.robot._chain_tuned import TUNED_EXT
except ImportError:  # pragma: no cover - tuning not yet run
    TUNED_EXT = {}
try:  # global occluder radius scale from the same tuning pass
    from robot_aware_control_tpu.robot._chain_tuned import TUNED_OCC_SCALE
except ImportError:  # pragma: no cover - tuning not yet run
    TUNED_OCC_SCALE = {}


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
    """Product-of-exponentials chain from zero-pose measurements.

    anchors: (J, 3) world joint anchor positions at qpos=0;
    axes: (J, 3) world joint axes at qpos=0; jnt_range: (J, 2);
    tip: (3,) world eef position at qpos=0 (rides the last joint frame).

    FK recursion (reference semantics: MuJoCo hinge trees,
    src/env/robotics/assets/*/robot.xml): with R_k = prod_{i<=k}
    Rot(axis_i, q_i), anchor_k(q) = anchor_{k-1}(q) +
    R_{k-1} (anchor_k^0 - anchor_{k-1}^0). Evaluating with zero-pose world
    quantities reproduces MuJoCo FK exactly for any qpos.
    """

    name: str
    anchors: np.ndarray
    axes: np.ndarray
    jnt_range: np.ndarray
    tip: np.ndarray

    @property
    def dof(self) -> int:
        return len(self.axes)

    def fk_frames(self, qpos):
        """qpos (..., >=dof) -> (pos (..., J, 3), R (..., J, 3, 3)):
        world anchor position and cumulative rotation (incl. joint k's own
        rotation) of every driven joint frame."""
        q = qpos[..., : self.dof]
        batch = q.shape[:-1]
        anchors0 = jnp.asarray(self.anchors, jnp.float32)
        pos = jnp.broadcast_to(anchors0[0], batch + (3,))
        R = _rot(tuple(np.asarray(self.axes[0], np.float64)), q[..., 0])
        ps, Rs = [pos], [R]
        for i in range(1, self.dof):
            off = anchors0[i] - anchors0[i - 1]
            pos = ps[-1] + jnp.einsum("...ij,j->...i", Rs[-1], off)
            R = jnp.einsum(
                "...ij,...jk->...ik", Rs[-1],
                _rot(tuple(np.asarray(self.axes[i], np.float64)), q[..., i]),
            )
            ps.append(pos)
            Rs.append(R)
        return jnp.stack(ps, -2), jnp.stack(Rs, -3)

    def fk_points(self, qpos):
        """qpos (..., >=dof) -> (..., dof+2, 3) world points:
        base anchor + every joint anchor + eef tip."""
        pos, R = self.fk_frames(qpos)
        anchors0 = jnp.asarray(self.anchors, jnp.float32)
        tip0 = jnp.asarray(self.tip, jnp.float32)
        tip = pos[..., -1, :] + jnp.einsum(
            "...ij,j->...i", R[..., -1, :, :], tip0 - anchors0[-1]
        )
        base = jnp.broadcast_to(anchors0[0], pos[..., :1, :].shape)
        return jnp.concatenate([base, pos, tip[..., None, :]], -2)

    def fk_full(self, qpos):
        """(pts (..., dof+2, 3) as fk_points, axes_world (..., dof, 3))."""
        q = qpos[..., : self.dof]
        pos, R = self.fk_frames(qpos)
        anchors0 = jnp.asarray(self.anchors, jnp.float32)
        axes0 = jnp.asarray(self.axes, jnp.float32)
        # world axis of joint i rotates with the frames BEFORE it
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32), q.shape[:-1] + (3, 3)
        )
        R_prev = jnp.concatenate([eye[..., None, :, :], R[..., :-1, :, :]], -3)
        axes_w = jnp.einsum("...kij,kj->...ki", R_prev, axes0)
        tip0 = jnp.asarray(self.tip, jnp.float32)
        tip = pos[..., -1, :] + jnp.einsum(
            "...ij,j->...i", R[..., -1, :, :], tip0 - anchors0[-1]
        )
        base = jnp.broadcast_to(anchors0[0], pos[..., :1, :].shape)
        pts = jnp.concatenate([base, pos, tip[..., None, :]], -2)
        return pts, axes_w

    def ik(self, target, q0=None, iters: int = 60, damping: float = 5e-2,
           tol: float = 5e-3):
        """Batched damped-least-squares position IK.

        The reference solves non-locobot IK with per-robot PyBullet
        controllers host-side, one query at a time (reference:
        src/env/robotics/controllers/*.py, 1,644 LoC). Here one traceable
        Gauss-Newton/DLS loop serves every chain: the position Jacobian
        column for revolute joint i is axis_w_i x (tip - anchor_i), and the
        damped normal equations are a batched 3x3 solve — vmappable over
        thousands of targets on device. Joint limits are the measured MJCF
        ranges.

        target (..., 3) world positions; q0 (..., dof) initial config.
        Multi-start (3 seeds + optional q0) picks the best converged
        solution per target. Returns (qpos (..., dof), valid (...,))."""
        target = jnp.asarray(target, jnp.float32)
        batch = target.shape[:-1]
        lo = jnp.asarray(self.jnt_range[:, 0], jnp.float32)
        hi = jnp.asarray(self.jnt_range[:, 1], jnp.float32)
        mid = 0.5 * (lo + hi)
        span = 0.5 * (hi - lo)
        seeds = [mid, mid + 0.25 * span, mid - 0.25 * span]
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
                q = jnp.clip(q + dq, lo, hi)
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


def _make_chain(key: str) -> KinematicChain:
    d = CHAIN_DATA[key]
    return KinematicChain(
        name=key,
        anchors=np.asarray(d["anchors"], np.float32),
        axes=np.asarray(d["axes"], np.float32),
        jnt_range=np.asarray(d["jnt_range"], np.float32),
        tip=np.asarray(d["eef"], np.float32),
    )


CHAINS: Dict[str, KinematicChain] = {k: _make_chain(k) for k in CHAIN_DATA}


# default measured viewpoint per robot — the extrinsics each reference
# mask-env main actually loads (sawyer_mask_env.py:226-230,
# widowx_mask_env.py:119-127, baxter_mask_env.py:179-196,
# franka_mask_env.py:126-140, kuka_mask_env.py:113-121 (reuses the
# sawyer_sudri0_c0 rig), fetch_mask_env.py:171-185, wx250s_model.py:25-28)
DEFAULT_CAMERA: Dict[str, str] = {
    "sawyer": "sawyer_sudri0_c0",
    "widowx": "widowx_widowx1_c0",
    "baxter": "baxter_left_c0",
    "baxter_right": "baxter_right_c0",
    "franka": "franka_c0",
    "kuka": "kuka_c0",
    "fetch": "fetch_c0",
    "wx250s": "wx250s_c0",
}


class ChainMaskEnv:
    """Per-robot mask renderer with the reference MaskEnv API
    (reference: base_mask_env.py:73-82): `generate_masks(qpos_list)`
    returns one binary mask per configuration — here batched and
    jit-compiled. Geometry and cameras are measured (see module
    docstring); `native_size` echoes each reference env's render size
    (e.g. sawyer_mask_env.py:28-29 — 85x64)."""

    def __init__(self, robot: str, image_size: Tuple[int, int] = (48, 64),
                 camera_key: Optional[str] = None, thick: bool = False,
                 arm: str = "left", occlude: bool = True):
        key = robot
        if robot == "baxter" and arm == "right":
            key = "baxter_right"
        data = CHAIN_DATA[key]
        self.chain = CHAINS[key]
        self.robot = robot
        self.h, self.w = image_size
        self.native_size = tuple(data["native_size"])  # (W, H)
        cam = camera_key or DEFAULT_CAMERA[key]
        w2c = calib.get_world_to_camera(cam)
        # intrinsics from the MJCF main_cam fovy at the native render size,
        # rescaled to the requested output size
        nw, nh = self.native_size
        f = (nh / 2.0) / np.tan(np.radians(data["fovy"]) / 2.0)
        sx, sy = self.w / nw, self.h / nh
        self._fx, self._fy = f * sx, f * sy
        self._cx, self._cy = self.w / 2.0, self.h / 2.0
        self._w2c = jnp.asarray(w2c, jnp.float32)

        radii = np.asarray(
            TUNED_RADII.get(key, data["caps_r"]), np.float32
        )
        scale = 1.45 if thick else 1.0
        self.radii = jnp.asarray(radii * scale, jnp.float32)
        # per-capsule axial endpoint extension (m): the mesh fitter pulls
        # capsule endpoints inside the hull (extract_chain_geometry.py
        # fit_capsule `shrink`), which leaves silhouettes short at link
        # ends; the held-out tuning pass recovers it per capsule
        self.ext = jnp.asarray(
            TUNED_EXT.get(key, np.zeros(len(radii))), jnp.float32
        )
        self._attach = np.asarray(data["caps_attach"], np.int32)
        self._ca = jnp.asarray(data["caps_a"], jnp.float32)
        self._cb = jnp.asarray(data["caps_b"], jnp.float32)
        # occluder capsules: geoms the reference's mask filter EXCLUDES
        # but whose z-buffer presence still hides mask geoms behind them
        # in the segmentation render (fetch's torso/head/arm vs its
        # gripper-only mask, fetch_mask_env.py:120-131). Rendered with a
        # depth test. The geometry is measured; one global radius scale
        # per robot is fitted by the fidelity tuner (the mesh fitter's
        # 85th-pct radius over-covers thin protrusions). Occlusion is
        # OPT-IN per robot: scale comes from TUNED_OCC_SCALE, default 0
        # (off) — a robot renders occluded only after the tuner showed
        # occlusion beats the plain render on its tune set.
        occ_r = np.asarray(data.get("occ_r", np.zeros(0)), np.float32)
        live = occ_r > 0  # the mesh fitter yields r=0 for flat geoms
        self.has_occluders = bool(live.any())
        self._occ_scale = (
            float(TUNED_OCC_SCALE.get(key, 0.0)) if occlude else 0.0
        )
        self.occlude = self.has_occluders and self._occ_scale > 0.0
        if self.has_occluders:
            self._occ_attach = np.asarray(
                data["occ_attach"], np.int32)[live]
            self._occ_a = jnp.asarray(
                np.asarray(data["occ_a"], np.float32)[live])
            self._occ_b = jnp.asarray(
                np.asarray(data["occ_b"], np.float32)[live])
            self._occ_r = jnp.asarray(occ_r[live])  # unscaled
        ys = jnp.arange(self.h, dtype=jnp.float32) + 0.5
        xs = jnp.arange(self.w, dtype=jnp.float32) + 0.5
        self._py, self._px = jnp.meshgrid(ys, xs, indexing="ij")
        self._render = jax.jit(self._render_impl)

    def _project(self, pts):
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        cam = jnp.einsum("ij,...j->...i", self._w2c[:3],
                         jnp.concatenate([pts, ones], -1))
        z = jnp.maximum(cam[..., 2], 1e-4)
        u = self._fx * cam[..., 0] / z + self._cx
        v = self._fy * cam[..., 1] / z + self._cy
        return u, v, z

    def _capsule_endpoints(self, qpos, attach=None, ca=None, cb=None):
        """World-space capsule endpoints for a batch of configurations:
        capsules attached to driven joint k transform rigidly with frame k
        (static capsules, attach=-1, stay at their zero-pose world pose)."""
        attach = self._attach if attach is None else attach
        ca = self._ca if ca is None else ca
        cb = self._cb if cb is None else cb
        pos, R = self.chain.fk_frames(qpos)  # (..., J, 3), (..., J, 3, 3)
        batch = qpos.shape[:-1]
        anchors0 = jnp.asarray(self.chain.anchors, jnp.float32)
        att = jnp.asarray(np.maximum(attach, 0), jnp.int32)
        is_static = jnp.asarray(attach < 0)
        p_att = pos[..., att, :]                      # (..., C, 3)
        R_att = R[..., att, :, :]                     # (..., C, 3, 3)
        anch = anchors0[att]                          # (C, 3)
        a = p_att + jnp.einsum("...cij,cj->...ci", R_att, ca - anch)
        b = p_att + jnp.einsum("...cij,cj->...ci", R_att, cb - anch)
        stat = is_static[:, None]
        a = jnp.where(stat, jnp.broadcast_to(ca, batch + ca.shape), a)
        b = jnp.where(stat, jnp.broadcast_to(cb, batch + cb.shape), b)
        return a, b

    # capsule axes are subdivided in 3D before projection: a straight
    # screen-space segment between the two projected endpoints distorts
    # for geometry close to the camera (perspective bends the projected
    # axis), which showed up as edge-of-frame IoU drops vs MuJoCo
    SUBDIV = 3

    def _render_impl(self, qpos):
        return self.render_with(qpos, self.radii, self.ext)

    def _seg_cover_depth(self, qpos, radii, ext, attach=None, ca=None,
                         cb=None):
        """Screen coverage + surface depth per capsule sub-segment.

        Returns (cover (..., C*S, H, W) bool, depth (..., C*S, H, W) f32):
        cover is the silhouette test of the original renderer; depth is
        the camera-z of the capsule axis at the pixel's closest axis
        point minus the 3-D radius — the front surface the reference's
        z-buffer sees."""
        a, b = self._capsule_endpoints(qpos, attach, ca, cb)  # (..., C, 3)
        axis = b - a
        u = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-9)
        a = a - ext[:, None] * u
        b = b + ext[:, None] * u
        S = self.SUBDIV
        ts = jnp.linspace(0.0, 1.0, S + 1)
        # (..., C, S+1, 3) polyline points along each capsule axis
        pts = a[..., None, :] + (b - a)[..., None, :] * ts[:, None]
        u, v, z = self._project(pts)
        # consecutive polyline points form the sub-segments
        a_u, b_u = u[..., :-1], u[..., 1:]
        a_v, b_v = v[..., :-1], v[..., 1:]
        a_z, b_z = z[..., :-1], z[..., 1:]
        # flatten (C, S) -> C*S segments; radii repeat per sub-segment
        batch = a.shape[:-2]
        C = a.shape[-2]
        a_u = a_u.reshape(batch + (C * S,))
        b_u = b_u.reshape(batch + (C * S,))
        a_v = a_v.reshape(batch + (C * S,))
        b_v = b_v.reshape(batch + (C * S,))
        a_z = a_z.reshape(batch + (C * S,))
        b_z = b_z.reshape(batch + (C * S,))
        radii = jnp.repeat(radii, S)
        # screen-space radius from per-point depth
        r_a = self._fx * radii / a_z
        r_b = self._fx * radii / b_z
        px = self._px.reshape((1,) * a_u.ndim + self._px.shape)
        py = self._py.reshape((1,) * a_u.ndim + self._py.shape)
        au, av = a_u[..., None, None], a_v[..., None, None]
        bu, bv = b_u[..., None, None], b_v[..., None, None]
        dx, dy = bu - au, bv - av
        seg_len2 = dx * dx + dy * dy + 1e-8
        t = jnp.clip(((px - au) * dx + (py - av) * dy) / seg_len2, 0.0, 1.0)
        dist = jnp.sqrt((px - (au + t * dx)) ** 2 + (py - (av + t * dy)) ** 2)
        rad = r_a[..., None, None] * (1 - t) + r_b[..., None, None] * t
        behind = (a_z + b_z)[..., None, None] > 2e-4  # both clamped => skip
        cover = (dist <= rad) & behind
        z_axis = a_z[..., None, None] * (1 - t) + b_z[..., None, None] * t
        depth = z_axis - radii[..., None, None]
        return cover, depth

    _INF_DEPTH = 1e9
    # occluder/mask surfaces that abut (wrist link vs gripper base) can
    # flip order by millimetres under the capsule approximation; favor
    # keeping mask pixels within this depth tolerance (m)
    OCC_EPS = 0.0

    def occluder_depth(self, qpos, scale: Optional[float] = None):
        """(..., H, W) nearest occluder surface depth (inf where none).
        Computed in capsule chunks to bound the peak (..., C*S, H, W)
        intermediate at large native render sizes (fetch: 27 occluders
        at 240x320). `scale` is an ABSOLUTE multiplier on the measured
        occluder radii (the fidelity tuner sweeps it); None means the
        shipped TUNED_OCC_SCALE, and scale<=0 or no occluder geometry
        yields an all-far map (occlusion off)."""
        s_abs = self._occ_scale if scale is None else float(scale)
        if not self.has_occluders or s_abs <= 0.0:
            shape = qpos.shape[:-1] + (self.h, self.w)
            return jnp.full(shape, self._INF_DEPTH, jnp.float32)
        n = len(self._occ_attach)
        out = None
        chunk = 8
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            cover, depth = self._seg_cover_depth(
                qpos, self._occ_r[s:e] * s_abs,
                jnp.zeros(e - s, jnp.float32),
                self._occ_attach[s:e], self._occ_a[s:e], self._occ_b[s:e],
            )
            d = jnp.min(
                jnp.where(cover, depth, self._INF_DEPTH), axis=-3
            )
            out = d if out is None else jnp.minimum(out, d)
        return out

    def render_with(self, qpos, radii, ext, occ_depth=None):
        """Parametric silhouette render: `radii` (C,) capsule radii and
        `ext` (C,) axial endpoint extensions are traced arguments, so the
        fidelity tuner (benchmarks/mask_fidelity.py) evaluates thousands
        of parameter candidates under ONE compilation (pass the
        pose-only `occ_depth=self.occluder_depth(qpos)` once for that).
        When the robot's tuned occluder scale is >0 (see __init__), a
        mask pixel survives only if its nearest mask-capsule surface is
        in front of every occluder surface there — the z-buffer
        semantics of the reference's segmentation render. An explicit
        `occ_depth` always wins over the shipped setting (the tuner
        passes maps at candidate scales, including all-far = off)."""
        cover, depth = self._seg_cover_depth(qpos, radii, ext)
        if occ_depth is None and self.occlude:
            occ_depth = self.occluder_depth(qpos)
        if occ_depth is not None:
            vis = cover & (depth <= occ_depth[..., None, :, :] + self.OCC_EPS)
        else:
            vis = cover
        mask = jnp.any(vis, axis=-3)
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
