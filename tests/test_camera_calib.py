"""PnP calibration solver tests (reference: robonet/camera_calib)."""

import numpy as np

from robot_aware_control_tpu.data import calibration
from robot_aware_control_tpu.data.camera_calib import calibrate_viewpoint, solve_pnp


def test_solve_pnp_recovers_known_pose(rng):
    # use an exactly-orthonormal synthetic pose: the measured registry
    # extrinsics (calibration._MEASURED_CAMERA_TO_WORLD) are physical
    # measurements whose rotation blocks are only orthonormal to ~1e-3,
    # which PnP (optimizing over rigid transforms) cannot reproduce exactly
    K = calibration.CAM_INTRINSICS["intel_realsense_d435"]
    w2c_true = np.linalg.inv(calibration.look_at([0.9, 0.1, 0.7],
                                                 [0.28, 0.0, 0.15]))
    R, t = w2c_true[:3, :3], w2c_true[:3, 3]
    pts3d = np.stack([
        rng.uniform(0.1, 0.5, 12), rng.uniform(-0.3, 0.3, 12),
        rng.uniform(0.1, 0.4, 12),
    ], -1)
    cam = pts3d @ R.T + t
    uv = (cam[:, :2] / cam[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
    w2c, rms = solve_pnp(pts3d, uv, K)
    assert rms < 0.5  # sub-pixel
    np.testing.assert_allclose(w2c[:3, 3], t, atol=1e-3)
    np.testing.assert_allclose(w2c[:3, :3], R, atol=1e-3)


def test_calibrate_viewpoint_registers(rng):
    K = calibration.CAM_INTRINSICS["intel_realsense_d435"]
    w2c_true = calibration.get_world_to_camera("locobot_c0")
    R, t = w2c_true[:3, :3], w2c_true[:3, 3]
    pts3d = np.stack([
        rng.uniform(0.1, 0.5, 10), rng.uniform(-0.3, 0.3, 10),
        rng.uniform(0.1, 0.4, 10),
    ], -1)
    cam = pts3d @ R.T + t
    uv = (cam[:, :2] / cam[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
    w2c, rms = calibrate_viewpoint("test_cam_c9", pts3d, uv,
                                   "intel_realsense_d435")
    got = calibration.get_world_to_camera("test_cam_c9")
    np.testing.assert_allclose(got, w2c, atol=1e-6)
