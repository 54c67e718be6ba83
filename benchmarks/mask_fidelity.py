"""Quantify capsule-mask fidelity against MuJoCo segmentation masks.

The TPU framework replaces the reference's MuJoCo segmentation renders
(reference: src/env/robotics/masks/base_mask_env.py:73-82, thick/thin
locobot variants src/env/robotics/masks/locobot_mask_env.py:14-31) with the
on-device capsule renderer (robot_aware_control_tpu/robot/mask_renderer.py).
This harness measures how close the two are: it loads the reference MJCF
(`locobot.xml` / `locobot_thick.xml`), applies the measured camera
extrinsics exactly as LocobotAnalyticalModel does (reference:
src/dataset/locobot/locobot_model.py:26-35 with
camera_to_world_dict["locobot_modified_c0"], set_opencv_camera_pose at
src/env/robotics/masks/base_mask_env.py:8-22), sweeps eef targets over the
pushing workspace through the SAME analytic IK the planner uses, and
reports mask IoU.

Usage:
  python benchmarks/mask_fidelity.py [--tune] [--grid 7] [--out PATH]

Writes JSON {"thin": {...}, "thick": {...}} with mean/min IoU; --tune runs
a coordinate search over capsule radii and prints the best radii found.

Requires: mujoco python bindings + a working EGL software renderer and the
reference checkout at /root/reference (override with REFERENCE_ROOT).
Skips gracefully (exit 0, {"skipped": ...}) if either is missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
ASSET_DIR = os.path.join(REFERENCE_ROOT, "src/env/robotics/assets/locobot")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mat_to_quat_wxyz(R):
    """Rotation matrix -> unit quaternion (w, x, y, z)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    x = np.sqrt(max(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2])) / 2.0
    y = np.sqrt(max(0.0, 1.0 - R[0, 0] + R[1, 1] - R[2, 2])) / 2.0
    z = np.sqrt(max(0.0, 1.0 - R[0, 0] - R[1, 1] + R[2, 2])) / 2.0
    x = np.copysign(x, R[2, 1] - R[1, 2])
    y = np.copysign(y, R[0, 2] - R[2, 0])
    z = np.copysign(z, R[1, 0] - R[0, 1])
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


class MujocoMaskOracle:
    """Reference-faithful mask renders from the reference MJCF under
    mujoco 3 (the reference used mujoco_py; geometry/camera math is the
    same engine)."""

    def __init__(self, thick: bool, cam_ext: np.ndarray, h=48, w=64):
        import mujoco

        self.mujoco = mujoco
        xml = "locobot_thick.xml" if thick else "locobot.xml"
        self.model = mujoco.MjModel.from_xml_path(os.path.join(ASSET_DIR, xml))
        self.data = mujoco.MjData(self.model)
        self.h, self.w = h, w
        # set_opencv_camera_pose semantics (base_mask_env.py:8-22):
        # R_mj = R_cv * Rot180y; quaternion stored wxyz
        cid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_CAMERA, "main_cam")
        R = cam_ext[:3, :3] @ np.diag([-1.0, 1.0, -1.0])
        self.model.cam_pos[cid] = cam_ext[:3, 3]
        self.model.cam_quat[cid] = _mat_to_quat_wxyz(R)
        self.joint_adr = []
        for i in range(1, 6):
            jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, f"joint_{i}")
            self.joint_adr.append(self.model.jnt_qposadr[jid])
        self.finger_adr = []
        for name in ("joint_6", "joint_7"):
            jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, name)
            if jid >= 0:
                self.finger_adr.append(self.model.jnt_qposadr[jid])
        self.renderer = mujoco.Renderer(self.model, height=h, width=w)
        self.renderer.enable_segmentation_rendering()

    def mask(self, qpos5: np.ndarray) -> np.ndarray:
        """(5,) joint angles -> (h, w) bool robot mask, reference image
        orientation (generate_masks: locobot_mask_env.py:96-108 with finger
        joints at [-0.025, 0.025]; all locobot geoms are robot geoms)."""
        for adr, q in zip(self.joint_adr, qpos5):
            self.data.qpos[adr] = q
        for adr, q in zip(self.finger_adr, (-0.025, 0.025)):
            self.data.qpos[adr] = q
        self.mujoco.mj_forward(self.model, self.data)
        self.renderer.update_scene(self.data, camera="main_cam")
        seg = self.renderer.render()
        mask = seg[..., 0] >= 0
        # mujoco_py returned bottom-up rows which the reference flips in
        # columns (base_mask_env.py:37 `out[:, ::-1]`) — net effect vs the
        # top-down mujoco.Renderer output is a 180 deg image rotation.
        return mask[::-1, ::-1]


def iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 1.0


def sweep_qpos(grid: int):
    """IK over a workspace grid at PUSH_HEIGHT (planner eef convention,
    reference: src/dataset/locobot/locobot_model.py:15-17,50-66)."""
    import jax

    # host-side analysis: avoid initializing the (slow, tunneled) TPU
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from robot_aware_control_tpu.robot import locobot_kinematics as lk

    xs = np.linspace(0.2, 0.42, grid)
    ys = np.linspace(-0.22, 0.22, grid)
    targets = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    eef = np.concatenate(
        [targets, np.full((len(targets), 1), lk.PUSH_HEIGHT)], -1
    )
    q, valid = lk.ik(
        jnp.asarray(eef, np.float32), alpha=-lk.DEFAULT_PITCH,
        cur_config=jnp.zeros((len(eef), 4), np.float32),
    )
    q = np.asarray(q)
    valid = np.asarray(valid)
    qpos = np.concatenate(
        [q, np.full((len(q), 1), lk.DEFAULT_ROLL, np.float32)], -1
    )
    return qpos[valid]


def capsule_masks(qpos, thick, radii=None, base_radii=None):
    import robot_aware_control_tpu.robot.mask_renderer as mr

    r = mr.CapsuleMaskRenderer(
        (48, 64), "locobot_c0", thick=thick, radii=radii,
        base_radii=base_radii,
    )
    return np.asarray(r.render(qpos))[..., 0] > 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("--tune", action="store_true")
    ap.add_argument("--out", default="benchmarks/mask_fidelity.json")
    args = ap.parse_args()

    os.environ.setdefault("MUJOCO_GL", "egl")
    if not os.path.isdir(ASSET_DIR):
        print(json.dumps({"skipped": f"no reference assets at {ASSET_DIR}"}))
        return
    try:
        import mujoco  # noqa: F401
    except Exception as e:  # pragma: no cover
        print(json.dumps({"skipped": f"mujoco unavailable: {e}"}))
        return

    from robot_aware_control_tpu.data import calibration as calib

    # the reference mask model uses the locobot_modified_c0 rig for its
    # analytical model (locobot_model.py:32); the planner's renderer keys
    # locobot_c0 — both are the same physical rig up to the hand-tuned
    # offsets, so measure against the key the planner actually uses.
    cam_ext = calib.get_camera_to_world("locobot_c0")
    qpos = sweep_qpos(args.grid)
    print(f"{len(qpos)} IK-valid sweep poses")

    results = {}
    for thick in (False, True):
        oracle = MujocoMaskOracle(thick, cam_ext)
        mj = np.stack([oracle.mask(q) for q in qpos])
        caps = capsule_masks(qpos, thick)
        ious = [iou(a, b) for a, b in zip(mj, caps)]
        results["thick" if thick else "thin"] = {
            "mean_iou": float(np.mean(ious)),
            "min_iou": float(np.min(ious)),
            "median_iou": float(np.median(ious)),
            "mj_mean_px": float(mj.sum(axis=(1, 2)).mean()),
            "capsule_mean_px": float(caps.sum(axis=(1, 2)).mean()),
            "n": len(ious),
        }
        if args.tune:
            import robot_aware_control_tpu.robot.mask_renderer as mr

            arm = np.array(mr.LOCOBOT_RADII, np.float32)
            base_r = np.array(mr.LOCOBOT_BASE_RADII, np.float32)

            def score(a_r, b_r):
                c = capsule_masks(qpos, thick, radii=a_r, base_radii=b_r)
                return np.mean([iou(a, b) for a, b in zip(mj, c)])

            best = score(arm, base_r)
            for _ in range(3):
                for i in range(len(arm) + len(base_r)):
                    for d in (-0.02, -0.01, -0.005, 0.005, 0.01, 0.02):
                        ca, cb = arm.copy(), base_r.copy()
                        if i < len(arm):
                            ca[i] = max(0.005, ca[i] + d)
                        else:
                            cb[i - len(arm)] = max(0.005, cb[i - len(arm)] + d)
                        s = score(ca, cb)
                        if s > best:
                            best, arm, base_r = s, ca, cb
            key = "thick" if thick else "thin"
            results[key]["tuned_iou"] = float(best)
            results[key]["tuned_arm_radii"] = [float(x) for x in arm]
            results[key]["tuned_base_radii"] = [float(x) for x in base_r]
    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
