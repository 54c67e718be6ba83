"""AprilTag extrinsics-calibration flow on synthetic renders of a known
tag pose (VERDICT r3 #10; reference:
locobot_rospkg/nodes/visual_MPC_controller.py:109-219)."""

import numpy as np
import pytest

from robot_aware_control_tpu.control.apriltag import (
    TAG36H11_CODES,
    TagDetection,
    calibrate_camera_from_tag,
    cam_to_base_from_tag,
    detect_tag,
    estimate_tag_pose,
    render_tag,
    tag_bits,
)

K = np.array([[612.45, 0.0, 330.55],
              [0.0, 612.45, 248.61],
              [0.0, 0.0, 1.0]])  # the reference rig (:134)
TAG_SIZE = 0.0353  # m (:136)


def _pose(rvec, t):
    from robot_aware_control_tpu.data.camera_calib import _rodrigues

    T = np.eye(4)
    T[:3, :3] = _rodrigues(np.asarray(rvec, np.float64))
    T[:3, 3] = t
    return T


# a mildly tilted tag ~0.45 m in front of the camera
CAM_T_TAG = _pose([0.25, -0.35, 0.15], [0.03, -0.02, 0.45])


def test_tag_bits_roundtrip():
    b = tag_bits(0)
    assert b.shape == (6, 6) and set(np.unique(b)) <= {0, 1}
    code = 0
    for bit in b.ravel():
        code = (code << 1) | int(bit)
    assert code == TAG36H11_CODES[0]


@pytest.mark.parametrize("tag_id", [0, 1, 3])
def test_detect_id_and_corners(tag_id):
    img = render_tag(tag_id, CAM_T_TAG, K, TAG_SIZE, (480, 640))
    det = detect_tag(img)
    assert det is not None and det.tag_id == tag_id
    # detected corners must match the projected tag footprint corners
    # as a SET within a pixel (canonical order checked via pose below)
    from robot_aware_control_tpu.control.apriltag import _CORNERS_TAG

    obj = _CORNERS_TAG * (TAG_SIZE / 2.0)
    cam = obj @ CAM_T_TAG[:3, :3].T + CAM_T_TAG[:3, 3]
    px = (cam / cam[:, 2:3]) @ K.T
    for p in px[:, :2]:
        assert np.min(np.linalg.norm(det.corners - p, axis=1)) < 1.0


def test_pose_recovery():
    img = render_tag(0, CAM_T_TAG, K, TAG_SIZE, (480, 640))
    det = detect_tag(img, K=K, tag_size=TAG_SIZE)
    assert det is not None
    np.testing.assert_allclose(det.pose_t, CAM_T_TAG[:3, 3], atol=2e-3)
    # rotation up to the tag's decoded orientation must match exactly;
    # the decode fixes orientation, so direct comparison applies
    np.testing.assert_allclose(det.pose_R, CAM_T_TAG[:3, :3], atol=2e-2)


def test_pose_estimate_on_exact_corners():
    from robot_aware_control_tpu.control.apriltag import _CORNERS_TAG

    obj = _CORNERS_TAG * (TAG_SIZE / 2.0)
    cam = obj @ CAM_T_TAG[:3, :3].T + CAM_T_TAG[:3, 3]
    px = ((cam / cam[:, 2:3]) @ K.T)[:, :2]
    R, t = estimate_tag_pose(px, K, TAG_SIZE)
    np.testing.assert_allclose(R, CAM_T_TAG[:3, :3], atol=1e-6)
    np.testing.assert_allclose(t, CAM_T_TAG[:3, 3], atol=1e-6)


def test_cam_to_base_composition_roundtrip():
    """Ground-truth geometry: given the true camTbase and tagTbase, the
    detector's tag-in-camera pose must compose back to camTbase
    (visual_MPC_controller.py:176-196)."""
    cam_T_base = _pose([0.1, 2.9, 0.2], [0.9, 0.1, 0.6])
    tag_T_base = _pose([0.0, 0.3, 1.2], [0.45, -0.05, 0.12])
    # tag pose in camera frame implied by the two
    tag_T_cam = np.linalg.inv(cam_T_base) @ tag_T_base
    got = cam_to_base_from_tag(
        tag_T_base, tag_T_cam[:3, :3], tag_T_cam[:3, 3]
    )
    np.testing.assert_allclose(got, cam_T_base, atol=1e-10)


def test_full_calibration_flow_registers_camera():
    """End-to-end: FK tag pose + synthetic camera frame -> registered
    extrinsics match the ground-truth camera pose."""
    from robot_aware_control_tpu.data import calibration

    cam_T_base = _pose([0.05, 2.95, 0.1], [0.85, 0.05, 0.55])
    tag_T_base = cam_T_base @ CAM_T_TAG  # consistent FK tag pose
    img = render_tag(0, CAM_T_TAG, K, TAG_SIZE, (480, 640))
    got = calibrate_camera_from_tag(
        "apriltag_test_c0", img, tag_T_base, K, TAG_SIZE,
        offset=(0.0, 0.0, 0.0),
    )
    assert got is not None
    np.testing.assert_allclose(got, cam_T_base, atol=5e-3)
    reg = calibration.get_camera_to_world("apriltag_test_c0")
    np.testing.assert_allclose(reg, got, atol=1e-12)


def test_pluggable_detector_and_offset():
    """An external pupil_apriltags-style detector plugs in unchanged
    (the reference's default path, :117-127), and the measured position
    offset (:204) is applied to the registered extrinsics."""

    class FakeResult:
        def __init__(self, corners):
            self.tag_id = 0
            self.corners = corners

    class FakeDetector:
        def __init__(self, corners):
            self._c = corners

        def detect(self, gray):
            return [FakeResult(self._c)]

    from robot_aware_control_tpu.control.apriltag import _CORNERS_TAG

    obj = _CORNERS_TAG * (TAG_SIZE / 2.0)
    cam = obj @ CAM_T_TAG[:3, :3].T + CAM_T_TAG[:3, 3]
    px = ((cam / cam[:, 2:3]) @ K.T)[:, :2]
    cam_T_base = _pose([0.0, 3.0, 0.0], [0.8, 0.0, 0.5])
    tag_T_base = cam_T_base @ CAM_T_TAG
    blank = np.full((480, 640), 0.5)
    got = calibrate_camera_from_tag(
        "apriltag_test_c1", blank, tag_T_base, K, TAG_SIZE,
        offset=(0.0, -0.015, 0.0125), detector=FakeDetector(px),
    )
    assert got is not None
    want = cam_T_base.copy()
    want[:3, 3] += [0.0, -0.015, 0.0125]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_no_tag_returns_none():
    blank = np.full((120, 160), 0.8)
    assert detect_tag(blank) is None
    assert calibrate_camera_from_tag(
        "apriltag_test_c2", blank, np.eye(4), K, TAG_SIZE
    ) is None


def test_controller_calibrate_extrinsics():
    """VisualMPCController.calibrate_extrinsics drives the flow through
    the RobotInterface (frame grab -> detect -> register)."""
    from robot_aware_control_tpu.control.real_robot import (
        VisualMPCController,
    )

    cam_T_base = _pose([0.02, 3.0, 0.05], [0.82, 0.02, 0.52])
    tag_T_base = cam_T_base @ CAM_T_TAG
    img = render_tag(1, CAM_T_TAG, K, TAG_SIZE, (480, 640))

    class StubRobot:
        def get_image(self):
            return np.repeat(img[..., None], 3, axis=-1)

        def get_eef_state(self):
            return np.zeros(3, np.float32)

        def get_qpos(self):
            return np.zeros(5, np.float32)

        def execute_action(self, a):
            pass

        def move_to(self, t):
            pass

    ctrl = VisualMPCController.__new__(VisualMPCController)
    ctrl.robot = StubRobot()
    got = ctrl.calibrate_extrinsics(
        "apriltag_test_c3", tag_T_base, K, tag_size=TAG_SIZE,
        offset=(0.0, 0.0, 0.0),
    )
    assert got is not None
    np.testing.assert_allclose(got, cam_T_base, atol=5e-3)
