"""Golden parity of the data layer vs the ACTUAL reference RoboNetDataset.

Imports `src.dataset.robonet.robonet_dataset.RoboNetDataset` from
/root/reference (never copied), runs it on fixture HDF5 episodes through a
faithful torchvision shim (tests/_torchvision_shim.py — torch itself is
real), and asserts per-item parity with our numpy reader
(robot_aware_control_tpu/data/robonet_hdf5.py) for:

  * snippet selection under a pinned RNG (robonet_dataset.py:92-99)
  * image ToTensor+bilinear-Resize (:57-58, 294)
  * mask re-binarization via bool cast after resize (:295-299)
  * state/qpos padding to robot_dim/robot_joint_dim (:209-223)
  * workspace normalization + per-robot eef frames (:302-334), incl. the
    franka->locobot shift (:311-317)
  * camera-frame bound/state transforms for sawyer/widowx/franka (:225-255)
  * autograsp action imputation — intended semantics (:173-195)
  * finetune raw_* outputs (:151-167)

Two reference bugs found while building this golden, locked by tests so
the deviation stays documented (see also docs/PARITY.md):
  (1) autograsp imputation crashes: `_load_actions` receives scalar
      gripper bounds (`raw_low[4]`, :102,106) then indexes them
      (`gripper_high[-1]`, :184) -> IndexError for every (5,)-shaped
      bounds file — which is what the reference's own preprocessing
      writes (collect_mask_data.py:168,187 stores `env/low_bound[-1]`).
  (2) camera_raw actions are all zeros: `_make_camera_actions` rebinds
      `actions = np.zeros_like(actions)` (:376) before using them to
      compute `next_eef_pos` (:381), so the projected displacement is
      identically zero. We implement the intended projection
      delta = cam(s+a) - cam(s), oracle-checked here.

The color-jitter/crop augmentation path is NOT goldened: the reference
drives it with the process-global `random` module per frame (:265-275),
ours is an episode-consistent numpy redesign; both are stochastic
augmentations, not semantics.
"""

import os
import sys

import h5py
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _torchvision_shim import install as install_torchvision_shim

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not present"
)

from robot_aware_control_tpu.config import Config  # noqa: E402
from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset  # noqa: E402

SEED = 123
EP_LEN, VID_LEN = 10, 7
H0, W0 = 64, 85  # raw robonet frame size; resized to 48x64
ADIM, RDIM, JDIM = 5, 5, 7


def _ref_dataset_cls():
    install_torchvision_shim()
    sys.path.insert(0, REF)
    try:
        from src.dataset.robonet.robonet_dataset import RoboNetDataset
    finally:
        sys.path.remove(REF)
    return RoboNetDataset


class _RefCfg:
    """Stands in for the reference argparse namespace (only the fields
    RoboNetDataset reads)."""

    data_root = ""
    load_movement_info = False
    video_length = VID_LEN
    n_past, n_future = 1, 5
    action_dim = ADIM
    impute_autograsp_action = True
    image_width, image_height = 64, 48
    seed = SEED
    preload_ram = False
    preprocess_action = "raw"
    robot_dim = RDIM
    robot_joint_dim = JDIM
    model_use_heatmap = False
    experiment = "train_robonet"


def _write_fixture(path, rng, robot, *, adim=ADIM, sdim=5, jdim=5,
                   normalized_states=True, bounds=True, key_style="frames"):
    """One episode in the reference's preprocessed layout (the format its
    own collect_mask_data.py:170-190 writes)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    images = rng.randint(0, 256, (EP_LEN, H0, W0, 3), dtype=np.uint8)
    # blob masks with curved edges so the resize produces fractional values
    # in (0, 0.5) — this is what distinguishes bool-cast rebinarization
    # (reference) from a >0.5 threshold
    yy, xx = np.mgrid[0:H0, 0:W0]
    masks = np.stack([
        ((yy - 20 - t) ** 2 + (xx - 30 - 2 * t) ** 2 < 95) for t in range(EP_LEN)
    ])
    if normalized_states:
        states = rng.rand(EP_LEN, sdim).astype(np.float32)
    else:
        states = np.concatenate(
            [rng.uniform(0.1, 0.4, (EP_LEN, 3)), rng.rand(EP_LEN, sdim - 3)], -1
        ).astype(np.float32)
    actions = rng.uniform(-0.04, 0.04, (EP_LEN - 1, adim)).astype(np.float32)
    qpos = rng.randn(EP_LEN, jdim).astype(np.float32)
    with h5py.File(path, "w") as hf:
        hf.create_dataset(key_style, data=images)
        hf.create_dataset("mask" if key_style == "frames" else "masks", data=masks)
        hf.create_dataset("states", data=states)
        hf.create_dataset("actions", data=actions)
        hf.create_dataset("qpos", data=qpos)
        if bounds:
            low = np.array([0.42, 0.14, 0.17, 0.0, 0.0], np.float32)
            high = np.array([0.87, 0.75, 0.31, 1.0, 100.0], np.float32)
            hf.create_dataset("low_bound", data=low)
            hf.create_dataset("high_bound", data=high)
        hf.attrs["robot"] = robot
    return path


def _our_cfg(**kw):
    base = dict(
        data_root="", video_length=VID_LEN, n_past=1, n_future=5,
        action_dim=ADIM, impute_autograsp_action=True, image_width=64,
        image_height=48, seed=SEED, robot_dim=RDIM, robot_joint_dim=JDIM,
        preprocess_action="raw", experiment="train_robonet",
        img_augmentation=False,
    )
    base.update(kw)
    return Config(**base)


def _assert_item_parity(ref_item, our_item, *, img_atol=3e-5, state_atol=2e-6):
    ref_imgs = ref_item["images"].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        our_item["images"], ref_imgs, atol=img_atol,
        err_msg="images (ToTensor+Resize)",
    )
    ref_masks = ref_item["masks"].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(
        our_item["masks"], ref_masks, err_msg="masks (resize + bool cast)"
    )
    np.testing.assert_allclose(
        our_item["states"], ref_item["states"], atol=state_atol, err_msg="states"
    )
    ref_actions = ref_item["actions"]
    if isinstance(ref_actions, torch.Tensor):
        ref_actions = ref_actions.numpy()
    np.testing.assert_allclose(
        our_item["actions"], ref_actions, atol=1e-6, err_msg="actions"
    )
    np.testing.assert_array_equal(our_item["qpos"], ref_item["qpos"], err_msg="qpos")
    assert our_item["robot"] == ref_item["robot"]
    assert our_item["folder"] == ref_item["folder"]


@pytest.fixture()
def robonet_fixtures(tmp_path):
    """sawyer + widowx episodes (bounds files, normalized states) and a
    locobot episode (raw states, fixed workspace, observations/masks keys)."""
    rng = np.random.RandomState(0)
    files, robots = [], []
    for i, (robot, vp) in enumerate((
        ("sawyer", "sawyer_sudri0_c0"),
        ("widowx", "widowx_widowx1_c0"),
        ("sawyer", "sawyer_vestri_table2_c1"),
    )):
        p = _write_fixture(
            str(tmp_path / vp / f"traj{i}.hdf5"), rng, robot, key_style="frames"
        )
        files.append(p)
        robots.append(vp)
    p = _write_fixture(
        str(tmp_path / "locobot_c0" / "traj9.hdf5"), rng, "locobot",
        normalized_states=False, bounds=False, key_style="observations",
    )
    files.append(p)
    robots.append("locobot_c0")
    return files, robots


def test_dataset_item_parity_raw(robonet_fixtures):
    """Raw-action path: every tensor in the item dict matches, across two
    passes over the dataset (locks the snippet-RNG stream, not just one
    draw)."""
    files, robots = robonet_fixtures
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS(files, robots, _RefCfg())
    our_ds = RoboNetHDF5Dataset(files, robots, _our_cfg())
    for _pass in range(2):
        for i in range(len(files)):
            ref_item = ref_ds[i]
            our_item = our_ds[i]
            _assert_item_parity(ref_item, our_item)
            assert our_item["file_path"] == ref_item["file_path"]


def test_snippet_rng_stream_parity(robonet_fixtures):
    """The random snippet start indices consume an identical
    RandomState(seed) stream (reference :59, :96-99). Detected via the qpos
    window, which is copied through unprocessed."""
    files, robots = robonet_fixtures
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS(files, robots, _RefCfg())
    our_ds = RoboNetHDF5Dataset(files, robots, _our_cfg())
    order = [2, 0, 3, 1, 1, 0, 2, 3, 0]
    for i in order:
        np.testing.assert_array_equal(ref_ds[i]["qpos"], our_ds[i]["qpos"])


def test_load_snippet_window(robonet_fixtures):
    """load_snippet=True switches the window to n_past+n_future frames
    (reference :51-52)."""
    files, robots = robonet_fixtures
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS(files, robots, _RefCfg(), load_snippet=True)
    our_ds = RoboNetHDF5Dataset(files, robots, _our_cfg(), load_snippet=True)
    ref_item, our_item = ref_ds[0], our_ds[0]
    assert ref_item["images"].shape[0] == 6 == our_item["images"].shape[0]
    _assert_item_parity(ref_item, our_item)


class _RefCamCfg(_RefCfg):
    preprocess_action = "camera_raw"
    experiment = "finetune_sawyer_view"


@pytest.fixture()
def camera_fixtures(tmp_path):
    rng = np.random.RandomState(1)
    specs = (
        ("sawyer", "sawyer_sudri0_c0", dict()),
        ("widowx", "widowx_widowx1_c0", dict()),
        ("franka", "franka_c0", dict(normalized_states=False, bounds=False)),
        ("locobot", "locobot_c0", dict(normalized_states=False, bounds=False,
                                       key_style="observations")),
    )
    files, robots = [], []
    for i, (robot, vp, kw) in enumerate(specs):
        files.append(_write_fixture(
            str(tmp_path / vp / f"traj{i}.hdf5"), rng, robot, **kw
        ))
        robots.append(vp)
    return files, robots


def test_camera_frame_states_and_bounds_parity(camera_fixtures):
    """camera_raw: bounds projected through the measured extrinsics
    (:225-255) and eef states transformed + normalized in the camera frame
    (:302-334) match for sawyer/widowx/franka/locobot viewpoints, incl. the
    finetune raw_low/raw_high/raw_states outputs (:151-167)."""
    files, robots = camera_fixtures
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS(files, robots, _RefCamCfg())
    our_ds = RoboNetHDF5Dataset(
        files, robots,
        _our_cfg(preprocess_action="camera_raw", experiment="finetune_sawyer_view"),
    )
    for i in range(len(files)):
        ref_item, our_item = ref_ds[i], our_ds[i]
        np.testing.assert_allclose(
            our_item["states"], ref_item["states"], atol=3e-6,
            err_msg=f"{robots[i]} camera states",
        )
        for k in ("low", "high", "raw_low", "raw_high"):
            np.testing.assert_allclose(
                our_item[k], ref_item[k], atol=1e-6, err_msg=f"{robots[i]} {k}"
            )
        np.testing.assert_allclose(
            our_item["raw_states"], ref_item["raw_states"], atol=3e-6,
            err_msg=f"{robots[i]} raw_states",
        )
        np.testing.assert_allclose(
            our_item["raw_actions"], ref_item["raw_actions"], atol=1e-6,
            err_msg=f"{robots[i]} raw_actions",
        )


def test_camera_actions_reference_bug_and_intended_oracle(camera_fixtures):
    """Reference bug (2): its camera_raw actions are identically zero
    because `_make_camera_actions` zeroes the actions before using them
    (robonet_dataset.py:376,381). Lock the bug, then oracle-check our
    implementation against the intended projection computed with the
    reference's own calibration matrices."""
    files, robots = camera_fixtures
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS(files, robots, _RefCamCfg())
    our_ds = RoboNetHDF5Dataset(
        files, robots,
        _our_cfg(preprocess_action="camera_raw", experiment="finetune_sawyer_view"),
    )
    sys.path.insert(0, REF)
    try:
        from src.utils.camera_calibration import (
            camera_to_world_dict,
            world_to_camera_dict,
        )
    finally:
        sys.path.remove(REF)

    for i in range(len(files)):
        ref_item, our_item = ref_ds[i], our_ds[i]
        # (a) the reference emits zeros — the bug
        assert float(np.abs(ref_item["actions"].numpy()).max()) == 0.0
        # (b) ours implements the intended delta = cam(s+a) - cam(s)
        states = np.asarray(our_item["states"])
        low, high = np.asarray(our_item["low"]), np.asarray(our_item["high"])
        raw_actions = np.asarray(our_item["raw_actions"])
        w2c = world_to_camera_dict[robots[i]]
        c2w = camera_to_world_dict[robots[i]]
        c_eef = states[:, :3] * (high[:3] - low[:3]) + low[:3]
        ones = np.ones((len(c_eef), 1))
        eef_w = ((c2w @ np.concatenate([c_eef, ones], 1).T).T)[:-1, :3]
        next_w = eef_w + raw_actions[:, :3]
        cam = lambda p: ((w2c @ np.concatenate(  # noqa: E731
            [p, np.ones((len(p), 1))], 1).T).T)[:, :3]
        intended = np.zeros_like(raw_actions)
        intended[:, :3] = cam(next_w) - cam(eef_w)
        np.testing.assert_allclose(
            np.asarray(our_item["actions"]), intended, atol=1e-5,
            err_msg=f"{robots[i]} intended camera actions",
        )


def test_autograsp_reference_bug_and_intended_parity(tmp_path):
    """Reference bug (1): with a 4-dim action file, 5-dim target and (5,)
    bounds (the shape its own preprocessing writes), the reference's
    imputation crashes indexing a scalar (robonet_dataset.py:102,184).
    Lock the crash, then golden our imputation against the reference's
    `_load_actions` fed 1-element bound arrays (the intended semantics)."""
    rng = np.random.RandomState(2)
    path = _write_fixture(
        str(tmp_path / "sawyer_sudri0_c0" / "t.hdf5"), rng, "sawyer", adim=4
    )
    RefDS = _ref_dataset_cls()
    ref_ds = RefDS([path], ["sawyer_sudri0_c0"], _RefCfg())
    with pytest.raises(IndexError):
        ref_ds[0]

    # intended semantics via the reference's own method with indexable bounds
    with h5py.File(path, "r") as hf:
        g_low = np.asarray([hf["low_bound"][4]])
        g_high = np.asarray([hf["high_bound"][4]])
        ref_actions = ref_ds._load_actions(hf, g_low, g_high, 0, VID_LEN - 1)

    our_ds = RoboNetHDF5Dataset([path], ["sawyer_sudri0_c0"], _our_cfg())
    our_item = our_ds[0]
    # align snippets: our rng drew a start; recompute reference slice there
    start = None
    with h5py.File(path, "r") as hf:
        all_q = np.asarray(hf["qpos"], np.float32)
        padded = np.pad(all_q, [(0, 0), (0, JDIM - all_q.shape[-1])])
        for s in range(EP_LEN - VID_LEN + 1):
            if np.array_equal(padded[s : s + VID_LEN], our_item["qpos"]):
                start = s
                break
        assert start is not None
        ref_actions = ref_ds._load_actions(
            hf, g_low, g_high, start, start + VID_LEN - 1
        )
    assert ref_actions.shape == (VID_LEN - 1, ADIM)
    np.testing.assert_allclose(
        our_item["actions"], ref_actions, atol=1e-6,
        err_msg="autograsp imputation (intended semantics)",
    )
    # the imputed column is the binarized next gripper force
    mid = (100.0 + 0.0) / 2
    with h5py.File(path, "r") as hf:
        next_g = np.asarray(hf["states"])[1:, -1]
    col = np.where(next_g > mid, 100.0, 0.0)[start : start + VID_LEN - 1]
    np.testing.assert_allclose(np.asarray(our_item["actions"])[:, 4], col)


def test_state_qpos_padding_parity(tmp_path):
    """Files with narrower state/qpos than robot_dim/robot_joint_dim are
    zero-padded identically (reference :209-223)."""
    rng = np.random.RandomState(3)
    path = _write_fixture(
        str(tmp_path / "widowx_widowx1_c0" / "t.hdf5"), rng, "widowx",
        sdim=5, jdim=4,
    )
    RefDS = _ref_dataset_cls()
    cfg = _RefCfg()
    ref_item = RefDS([path], ["widowx_widowx1_c0"], cfg)[0]
    our_item = RoboNetHDF5Dataset([path], ["widowx_widowx1_c0"], _our_cfg())[0]
    assert ref_item["qpos"].shape[-1] == JDIM == our_item["qpos"].shape[-1]
    np.testing.assert_array_equal(our_item["qpos"], ref_item["qpos"])
    np.testing.assert_allclose(our_item["states"], ref_item["states"], atol=2e-6)
