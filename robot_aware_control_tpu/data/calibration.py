"""Camera calibration registry.

The reference hardcodes per-robot/viewpoint extrinsics and intrinsics
(reference: src/utils/camera_calibration.py:6-178). We keep a registry API
plus synthetic defaults built from explicit look-at geometry so the full
pipeline (heatmaps, capsule mask rendering, camera-frame actions) runs
hermetically; real calibrations register at runtime (e.g. from AprilTag
detection, reference: locobot_rospkg/nodes/visual_MPC_controller.py:109-219).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def look_at(eye, target, up=(0, 0, 1.0)):
    """camera-to-world 4x4 (OpenCV convention: +z forward, +x right, +y down)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(fwd, upv)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def intrinsics(fx, fy, cx, cy):
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


# intrinsics at native sensor resolutions (resized by consumers)
CAM_INTRINSICS: Dict[str, np.ndarray] = {
    # 640x480 depth cam class (reference uses intel realsense d435)
    "intel_realsense_d435": intrinsics(612.0, 612.0, 320.0, 240.0),
    # 320x240 webcam class (reference uses logitech c420)
    "logitech_c420": intrinsics(320.8, 320.8, 160.0, 120.0),
}

CAM_RESOLUTION: Dict[str, tuple] = {
    "intel_realsense_d435": (640, 480),
    "logitech_c420": (320, 240),
}

# camera_to_world extrinsics per robot_viewpoint key. Synthetic defaults: a
# camera ~0.8m out, 0.6m up, looking at the workspace center.
_DEFAULT_WORKSPACE_CENTER = np.array([0.28, 0.0, 0.15])
CAMERA_TO_WORLD: Dict[str, np.ndarray] = {}
WORLD_TO_CAMERA: Dict[str, np.ndarray] = {}


def register_camera(key: str, camera_to_world: np.ndarray):
    CAMERA_TO_WORLD[key] = np.asarray(camera_to_world, np.float64)
    WORLD_TO_CAMERA[key] = np.linalg.inv(CAMERA_TO_WORLD[key])


def get_camera_to_world(key: str) -> np.ndarray:
    if key not in CAMERA_TO_WORLD:
        register_camera(key, look_at([0.9, 0.0, 0.75], _DEFAULT_WORKSPACE_CENTER))
    return CAMERA_TO_WORLD[key]


def get_world_to_camera(key: str) -> np.ndarray:
    get_camera_to_world(key)
    return WORLD_TO_CAMERA[key]


# seed the registry with the viewpoints the reference refers to by name
for _key in ("locobot_c0", "locobot_modified_c0", "franka_c0", "wx250s_c0",
             "synthetic_c0"):
    get_camera_to_world(_key)


def robot_camera_info(robot: str, viewpoint: str):
    """(world2cam, intrinsics K, native resolution) for a robot viewpoint
    (reference mapping: robonet_dataset.py:497-518)."""
    if robot == "locobot":
        key, cam = "locobot_c0", "intel_realsense_d435"
    elif robot in ("sawyer", "baxter", "widowx"):
        key, cam = f"{robot}_{viewpoint}", "logitech_c420"
    else:
        key, cam = f"{robot}_{viewpoint}", "intel_realsense_d435"
    return get_world_to_camera(key), CAM_INTRINSICS[cam], CAM_RESOLUTION[cam]
