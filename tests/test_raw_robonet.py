"""Raw public-RoboNet ingestion tests (data/raw_robonet.py).

Hermetic: fixtures are written with cv2-encoded video (jpg per-frame and
mp4 streams) in the exact raw layout the public release uses
(reference: robonet/robonet/datasets/util/hdf5_loader.py:40-77,
util/metadata_helper.py:84-131), then decoded and compared bit-for-bit
against the raw-frame (preprocessed) path.
"""

import os

import h5py
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from robot_aware_control_tpu.config import Config  # noqa: E402
from robot_aware_control_tpu.data import raw_robonet as rr  # noqa: E402
from robot_aware_control_tpu.data.robonet_hdf5 import (  # noqa: E402
    RoboNetHDF5Dataset,
)

T, H, W = 9, 48, 64
LOW = np.array([0.42, 0.14, 0.17, 0.0, 0.0], np.float32)
HIGH = np.array([0.87, 0.75, 0.31, 1.0, 100.0], np.float32)


def _episode(rng, ncam=1, adim=4, sdim=5, jdim=7):
    # piecewise-constant blocks survive jpg/mp4 compression recognizably
    imgs = np.kron(
        rng.randint(0, 256, (T, ncam, H // 8, W // 8, 3)),
        np.ones((1, 1, 8, 8, 1)),
    ).astype(np.uint8)
    states = rng.rand(T, sdim).astype(np.float32)
    actions = rng.uniform(-0.04, 0.04, (T - 1, adim)).astype(np.float32)
    qpos = rng.uniform(-0.6, 0.6, (T, jdim)).astype(np.float32)
    return imgs, states, actions, qpos


def _write(path, ep, encoding, **kw):
    imgs, states, actions, qpos = ep
    return rr.write_raw_robonet_hdf5(
        path, imgs, states, actions, qpos, LOW, HIGH, encoding=encoding, **kw
    )


def test_jpg_decode_matches_raw_frame_path(tmp_path):
    """jpg-encoded frames decode to exactly the tensors a raw-frame file
    of the decoded images yields (the VERDICT bit-for-bit criterion)."""
    rng = np.random.RandomState(0)
    ep = _episode(rng)
    jpg_path = _write(str(tmp_path / "jpg" / "traj0.hdf5"), ep, "jpg")
    md_jpg = rr.load_metadata_dict(jpg_path)
    assert md_jpg["img_encoding"] == "jpg" and md_jpg["img_T"] == T
    with h5py.File(jpg_path, "r") as hf:
        decoded = rr.load_camera_imgs(0, hf, md_jpg, (H, W))
    assert decoded.shape == (T, H, W, 3) and decoded.dtype == np.uint8

    raw_path = _write(
        str(tmp_path / "raw" / "traj0.hdf5"),
        (decoded[:, None], ep[1], ep[2], ep[3]),
        "raw",
    )
    md_raw = rr.load_metadata_dict(raw_path)
    with h5py.File(raw_path, "r") as hf:
        passthrough = rr.load_camera_imgs(0, hf, md_raw, (H, W))
    np.testing.assert_array_equal(decoded, passthrough)

    # load_data end-to-end equality (images, actions, states, qpos)
    p = rr.LoaderParams(target_adim=5, target_sdim=5, img_size=(H, W))
    out_jpg = rr.load_data(jpg_path, md_jpg, p)
    out_raw = rr.load_data(raw_path, md_raw, p)
    for a, b, name in zip(out_jpg, out_raw, ("images", "actions", "states",
                                             "qpos")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_mp4_decode_roundtrip(tmp_path):
    """mp4 stream decode: shapes/dtype exact, pixels within codec loss of
    the source, and identical to an independent OpenCV decode of the same
    stream (bit-for-bit: same decoder, same bytes)."""
    rng = np.random.RandomState(1)
    ep = _episode(rng)
    path = _write(str(tmp_path / "mp4" / "traj0.hdf5"), ep, "mp4")
    md = rr.load_metadata_dict(path)
    assert md["img_encoding"] == "mp4" and md["img_T"] == T
    with h5py.File(path, "r") as hf:
        decoded = rr.load_camera_imgs(0, hf, md, (H, W))
        stream = np.asarray(hf["env"]["cam0_video"]["frames"])
    assert decoded.shape == (T, H, W, 3)
    # independent decode of the same byte stream
    ref_frames = np.stack(rr._decode_mp4(stream))
    np.testing.assert_array_equal(decoded, ref_frames)
    # codec is lossy but the blocky fixture survives: mean error small
    err = np.abs(decoded.astype(np.int32) - ep[0][:, 0].astype(np.int32))
    assert float(err.mean()) < 12.0, float(err.mean())


def test_resize_method_selection(tmp_path):
    """Downscale uses INTER_AREA, upscale INTER_CUBIC — the reference's
    choice (hdf5_loader.py:52-54), asserted via exact cv2 equality."""
    rng = np.random.RandomState(2)
    ep = _episode(rng)
    path = _write(str(tmp_path / "t" / "traj0.hdf5"), ep, "raw")
    md = rr.load_metadata_dict(path)
    src = ep[0][:, 0]
    with h5py.File(path, "r") as hf:
        down = rr.load_camera_imgs(0, hf, md, (24, 32))
        up = rr.load_camera_imgs(0, hf, md, (96, 128))
    np.testing.assert_array_equal(
        down[0], cv2.resize(src[0], (32, 24), interpolation=cv2.INTER_AREA)
    )
    np.testing.assert_array_equal(
        up[0], cv2.resize(src[0], (128, 96), interpolation=cv2.INTER_CUBIC)
    )


def test_autograsp_imputation_and_mismatch_flags(tmp_path):
    """load_actions: adim+1 autograsp imputation from next gripper state
    (hdf5_loader.py:108-120), PAD_ZERO and CLEAVE branches."""
    rng = np.random.RandomState(3)
    ep = _episode(rng, adim=4)
    path = _write(str(tmp_path / "t" / "traj0.hdf5"), ep, "raw")
    md = rr.load_metadata_dict(path)
    with h5py.File(path, "r") as hf:
        p = rr.LoaderParams(target_adim=5)
        acts = rr.load_actions(hf, md, p)
        assert acts.shape == (T - 1, 5)
        np.testing.assert_array_equal(acts[:, :4], ep[2])
        mid = (HIGH[-1] + LOW[-1]) / 2
        expect = np.where(ep[1][1:, -1] > mid, HIGH[-1], LOW[-1])
        np.testing.assert_allclose(acts[:, 4], expect)

        # PAD_ZERO without autograsp primitives falls through to padding
        p = rr.LoaderParams(target_adim=6, impute_autograsp_action=False,
                            action_mismatch=rr.ACTION_MISMATCH.PAD_ZERO)
        acts = rr.load_actions(hf, md, p)
        assert acts.shape == (T - 1, 6)
        np.testing.assert_array_equal(acts[:, 4:], 0)

        # CLEAVE truncates
        p = rr.LoaderParams(target_adim=2,
                            action_mismatch=rr.ACTION_MISMATCH.CLEAVE)
        np.testing.assert_array_equal(
            rr.load_actions(hf, md, p), ep[2][:, :2]
        )

        # ERROR raises
        with pytest.raises(ValueError):
            rr.load_actions(hf, md, rr.LoaderParams(
                target_adim=2, action_mismatch=rr.ACTION_MISMATCH.ERROR))

        # states: pad & cleave
        p = rr.LoaderParams(target_sdim=7,
                            state_mismatch=rr.STATE_MISMATCH.PAD_ZERO)
        st = rr.load_states(hf, md, p)
        assert st.shape == (T, 7)
        np.testing.assert_array_equal(st[:, 5:], 0)
        p = rr.LoaderParams(target_sdim=3,
                            state_mismatch=rr.STATE_MISMATCH.CLEAVE)
        np.testing.assert_array_equal(rr.load_states(hf, md, p), ep[1][:, :3])


def test_metadata_table_and_cache(tmp_path):
    rng = np.random.RandomState(4)
    d = tmp_path / "db"
    for i in range(3):
        _write(str(d / f"traj{i}.hdf5"), _episode(rng), "raw",
               object_classes=("toys",) if i < 2 else ("cloth",))
    table = rr.load_metadata(str(d))
    assert len(table) == 3
    assert os.path.exists(d / "meta_data.pkl")
    # cache hit returns the same frame
    table2 = rr.load_metadata(str(d))
    assert list(table2.frame.index) == list(table.frame.index)
    md = table.get_file_metadata(str(d / "traj1.hdf5"))
    assert md["robot"] == "sawyer" and md["adim"] == 4 and md["sdim"] == 5
    assert md["primitives"] == "autograsp"
    np.testing.assert_allclose(np.asarray(md["low_bound"]), LOW)
    assert len(table.select_objects("cloth")) == 1
    files = table.files
    assert all(os.path.isfile(f) for f in files)
    # snippet draw: load_T window via seeded rng is reproducible
    p = rr.LoaderParams(target_adim=5, img_size=(H, W), load_T=4)
    out1 = rr.load_data(files[0], table.get_file_metadata(files[0]), p, rng=7)
    out2 = rr.load_data(files[0], table.get_file_metadata(files[0]), p, rng=7)
    np.testing.assert_array_equal(out1[0], out2[0])
    assert out1[0].shape[0] == 4 and out1[1].shape[0] == 3

    # sha256 guard fires on a tampered file
    with h5py.File(files[0], "a") as hf:
        hf["env"]["state"][0, 0] = 99.0
    with pytest.raises(AssertionError):
        rr.load_data(files[0], table.get_file_metadata(files[0]),
                     rr.LoaderParams(target_adim=5))


def test_annotations(tmp_path):
    rng = np.random.RandomState(5)
    ep = _episode(rng)
    path = _write(str(tmp_path / "t" / "traj0.hdf5"), ep, "raw",
                  extra_metadata={"contains_annotation": True})
    # bbox annotations: (T, ncam, obj, 2 corners, 2)
    boxes = rng.randint(5, 40, (T, 1, 2, 2, 2)).astype(np.int32)
    boxes[..., 1, :] = boxes[..., 0, :] + 6
    with h5py.File(path, "a") as hf:
        hf["env"].create_dataset("bbox_annotations", data=boxes)
    md = rr.load_metadata_dict(path)
    with h5py.File(path, "r") as hf:
        annot = rr.load_annotations(
            hf, md, rr.LoaderParams(img_size=(H, W)), [0]
        )
    assert annot.shape == (T, 1, H, W, 2)
    assert annot.sum() == T * 1 * 2  # one center pixel per object per frame
    # missing annotations: zero_if_missing returns zeros, else raises
    md2 = dict(md)
    md2.pop("contains_annotation")
    with h5py.File(path, "r") as hf:
        z = rr.load_annotations(
            hf, md2,
            rr.LoaderParams(img_size=(H, W), zero_if_missing_annotation=True),
            [0],
        )
        assert z.sum() == 0
        with pytest.raises(AssertionError):
            rr.load_annotations(hf, md2, rr.LoaderParams(img_size=(H, W)), [0])


def _our_cfg(**kw):
    base = dict(
        data_root="", video_length=6, n_past=1, n_future=5, action_dim=5,
        impute_autograsp_action=True, image_width=64, image_height=48,
        seed=11, robot_dim=5, robot_joint_dim=7, preprocess_action="raw",
        experiment="train_robonet", img_augmentation=False,
    )
    base.update(kw)
    return Config(**base)


def test_dataset_reads_raw_layout_directly(tmp_path):
    """RoboNetHDF5Dataset consumes a raw public-RoboNet jpg file directly:
    same item semantics as the converted/preprocessed path, bit-for-bit."""
    rng = np.random.RandomState(6)
    ep = _episode(rng, adim=4)
    raw = _write(str(tmp_path / "sawyer_sudri0_c0" / "traj0.hdf5"), ep, "jpg",
                 camera_configuration="sudri0")

    # the converted (preprocessed) twin, masks rendered by the same chain
    out_dir = str(tmp_path / "converted")
    converted = rr.convert_raw_robonet(
        [raw], out_dir, "sawyer_sudri0_c0", cam_index=0
    )
    assert len(converted) == 1 and converted[0].endswith("traj0_c0.hdf5")
    with h5py.File(converted[0], "r") as hf:
        assert set(hf.keys()) >= {"mask", "frames", "states", "actions",
                                  "qpos", "low_bound", "high_bound"}
        assert hf.attrs["robot"] == "sawyer"
        assert hf["frames"].shape == (T, 64, 85, 3)
        assert hf["mask"].dtype == np.bool_

    ds_raw = RoboNetHDF5Dataset([raw], ["sawyer_sudri0_c0"], _our_cfg())
    ds_pre = RoboNetHDF5Dataset(converted, ["sawyer_sudri0_c0"], _our_cfg())
    item_raw, item_pre = ds_raw[0], ds_pre[0]
    for k in ("images", "states", "actions", "masks", "qpos"):
        np.testing.assert_array_equal(
            np.asarray(item_raw[k]), np.asarray(item_pre[k]), err_msg=k
        )
    assert item_raw["images"].shape == (6, 48, 64, 3)
    assert item_raw["actions"].shape == (5, 5)  # autograsp-imputed dim
    assert set(np.unique(item_raw["masks"])) <= {0.0, 1.0}
    assert item_raw["masks"].sum() > 0  # chain actually rendered something
    assert item_raw["robot"] == "sawyer"


def test_converter_cli(tmp_path, capsys):
    """`python -m robot_aware_control_tpu.data.raw_robonet` converts a
    directory of public-RoboNet files to the preprocessed layout."""
    rng = np.random.RandomState(8)
    raw_dir = tmp_path / "sawyer_sudri0_c0"
    _write(str(raw_dir / "traj0.hdf5"), _episode(rng, adim=4), "jpg",
           camera_configuration="sudri0")
    out_dir = str(tmp_path / "pre")
    rr.main(["--robonet_dir", str(raw_dir), "--out", out_dir,
             "--viewpoint", "sawyer_sudri0_c0"])
    assert "wrote 1 trajectories" in capsys.readouterr().out
    with h5py.File(os.path.join(out_dir, "traj0_c0.hdf5"), "r") as hf:
        assert hf["frames"].shape == (T, 64, 85, 3)
        assert hf.attrs["robot"] == "sawyer"


def test_raw_multicam_viewpoint_selects_matching_stream(tmp_path):
    """A raw MULTI-camera file read under a `<view>_c<k>` directory must
    decode camera k — the stream the viewpoint's calibrated extrinsics
    (and hence the rendered masks) belong to — not camera 0 (reference
    convention: per-camera view dirs, robonet_dataloaders.py:137-208)."""
    rng = np.random.RandomState(10)
    imgs, states, actions, qpos = _episode(rng, ncam=2, adim=4)
    raw = _write(str(tmp_path / "multi" / "traj0.hdf5"),
                 (imgs, states, actions, qpos), "raw",
                 camera_configuration="sudri0")

    def item_for(viewpoint):
        ds = RoboNetHDF5Dataset([raw], [viewpoint], _our_cfg())
        return ds[0]

    it_c0, it_c1 = item_for("sawyer_sudri0_c0"), item_for("sawyer_sudri0_c1")
    # the two viewpoints see different camera streams
    assert np.abs(it_c0["images"] - it_c1["images"]).max() > 0.1

    # c1 equals a single-camera file containing ONLY camera 1's frames
    solo = _write(str(tmp_path / "solo" / "traj0.hdf5"),
                  (imgs[:, 1:2], states, actions, qpos), "raw",
                  camera_configuration="sudri0")
    np.testing.assert_array_equal(
        it_c1["images"], item_for("sawyer_sudri0_c1")["images"])
    it_solo = RoboNetHDF5Dataset([solo], ["sawyer_sudri0_c1"], _our_cfg())[0]
    np.testing.assert_array_equal(it_c1["images"], it_solo["images"])
    np.testing.assert_array_equal(it_c1["masks"], it_solo["masks"])


def test_trainer_trains_on_public_raw_layout(tmp_path):
    """End-to-end lock for VERDICT r3 Missing #2: a tree of PUBLIC
    RoboNet files (jpg-encoded video, env/policy layout) under the
    reference's sawyer_views/<view>/ directory convention trains through
    `PredictionTrainer` with NO external preprocessing step — the loaders
    detect the raw layout per file and decode + render masks on the fly
    (reference pipeline this replaces: robonet/datasets/util/
    hdf5_loader.py:25-100 feeding src/prediction/multirobot_trainer.py)."""
    import json

    from robot_aware_control_tpu.training.trainer import PredictionTrainer

    rng = np.random.RandomState(9)
    root = tmp_path / "data"
    # SAWYER_TRAIN_DIRS views (train/test split) + the held-out transfer view
    for d, n in (("sudri0_c0", 3), ("sudri0_c1", 2), ("sudri2_c1", 1)):
        for i in range(n):
            _write(str(root / "sawyer_views" / d / f"traj{i}.hdf5"),
                   _episode(rng, adim=4), "jpg",
                   camera_configuration=d.split("_")[0])
    cfg = _our_cfg(
        data_root=str(root),
        experiment="train_sawyer_multiview",
        model="det",
        g_dim=8,
        image_height=16,
        image_width=16,
        batch_size=2,
        test_batch_size=1,
        niter=1,
        epoch_size=1,
        n_past=1,
        n_future=2,
        n_eval=3,
        checkpoint_interval=1,
        eval_interval=5,
        compute_dtype="float32",
        model_use_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        log_dir=str(tmp_path / "log"),
        jobname="raw_e2e",
        num_devices=1,
    )
    tr = PredictionTrainer(cfg)
    tr.train()
    assert tr.transfer_loader is not None  # sudri2_c1 picked up
    from robot_aware_control_tpu.training import checkpoint as ckpt

    assert ckpt.latest_checkpoint(tr.log_dir) is not None
    metrics_path = os.path.join(tr.log_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    with open(metrics_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    losses = [r[k] for r in rows for k in r if k.endswith("recon_loss")]
    assert losses and all(np.isfinite(v) for v in losses)


def test_trainer_trains_multiview_raw(tmp_path):
    """--multiview --camera_ids on MULTI-STREAM raw files trains through
    `PredictionTrainer` end to end: both selected camera streams decode,
    stack vertically with per-view chain masks, and the whole window
    optimizes with finite dontcare losses — the trainer-level lock on the
    vendored loader's multi-cam consumption (VERDICT r4 Next #10;
    reference: robonet/datasets/util/hdf5_loader.py:32 cams_to_load).
    The dataset-level halves-match parity is
    test_multiview_raw_dataset_stacks_views; this covers the remaining
    loader -> train-step path."""
    import json

    from robot_aware_control_tpu.training.trainer import PredictionTrainer

    rng = np.random.RandomState(21)
    root = tmp_path / "data"
    for d, n in (("sudri0_c0", 3), ("sudri0_c1", 2)):
        for i in range(n):
            _write(str(root / "sawyer_views" / d / f"traj{i}.hdf5"),
                   _episode(rng, ncam=2, adim=4), "jpg",
                   camera_configuration=d.split("_")[0])
    cfg = _our_cfg(
        data_root=str(root),
        experiment="train_sawyer_multiview",
        model="det",
        g_dim=8,
        multiview=True,
        camera_ids=(0, 1),
        image_height=32,  # 2 views x 16, stacked vertically
        image_width=16,
        batch_size=2,
        test_batch_size=1,
        niter=1,
        epoch_size=1,
        n_past=1,
        n_future=2,
        n_eval=3,
        checkpoint_interval=5,
        eval_interval=5,
        compute_dtype="float32",
        model_use_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        log_dir=str(tmp_path / "log"),
        jobname="raw_mv_e2e",
        num_devices=1,
    )
    tr = PredictionTrainer(cfg)
    # the items feeding the train step really are two stacked streams
    train_loader, _ = tr._setup_data()
    item = train_loader.dataset[0]
    assert item["images"].shape[1:] == (32, 16, 3)
    tr.train()
    metrics_path = os.path.join(tr.log_dir, "metrics.jsonl")
    with open(metrics_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    losses = [r[k] for r in rows for k in r if k.endswith("recon_loss")]
    assert losses and all(np.isfinite(v) for v in losses)


def test_bgr_channel_order_all_encodings(tmp_path):
    """Files labeled image_format=BGR decode back to true-RGB under every
    encoding (hdf5_loader.py:69-71 reads the same attr). Locks the writer/
    loader contract: writer input is always true RGB; the attr labels the
    on-disk order only."""
    rng = np.random.RandomState(12)
    ep = _episode(rng)
    truth = ep[0][:, 0].astype(np.int32)
    for enc in ("raw", "jpg", "mp4"):
        path = _write(str(tmp_path / enc / "traj0.hdf5"), ep, enc,
                      image_format="BGR")
        md = rr.load_metadata_dict(path)
        assert md["image_format"] == "BGR"
        with h5py.File(path, "r") as hf:
            out = rr.load_camera_imgs(0, hf, md, (H, W)).astype(np.int32)
        if enc == "raw":
            # passthrough is exact — and the on-disk array really is BGR
            np.testing.assert_array_equal(out, truth)
            with h5py.File(path, "r") as hf:
                disk = np.asarray(hf["env"]["cam0_video"]["frames"])
            np.testing.assert_array_equal(disk, truth[..., ::-1])
        else:
            err = np.abs(out - truth).mean()
            err_swapped = np.abs(out[..., ::-1] - truth).mean()
            assert err < 12.0, (enc, err)  # codec loss only
            assert err_swapped > 2 * err, (enc, err, err_swapped)


def test_multicam_sampling_load_data(tmp_path):
    """cams_to_load samples an arbitrary subset of a multi-stream file
    (the vendored loader's cams_to_load=[0,1,2] SAVP usage,
    hdf5_loader.py:32,160-166): images come back (T, n_sel, H, W, 3) in
    request order, each stream matching its solo decode; out-of-range
    indices fail loudly."""
    rng = np.random.RandomState(13)
    imgs, states, actions, qpos = _episode(rng, ncam=3, adim=4)
    path = _write(str(tmp_path / "m" / "traj0.hdf5"),
                  (imgs, states, actions, qpos), "raw")
    md = rr.load_metadata_dict(path)
    assert md["ncam"] == 3
    p = rr.LoaderParams(target_adim=5, img_size=(H, W),
                        cams_to_load=[2, 0])
    images, _, _, _ = rr.load_data(path, md, p)
    assert images.shape == (T, 2, H, W, 3)
    np.testing.assert_array_equal(images[:, 0], imgs[:, 2])
    np.testing.assert_array_equal(images[:, 1], imgs[:, 0])
    with pytest.raises(IndexError):
        rr.load_data(path, md, rr.LoaderParams(
            target_adim=5, img_size=(H, W), cams_to_load=[3]))


def test_metadata_filters(tmp_path):
    """The pandas-side selections the reference pipelines filter on
    (metadata_helper.py:13-81): object_classes membership/exact-set and
    camera_configuration row filters."""
    rng = np.random.RandomState(14)
    d = tmp_path / "db"
    specs = [("toys",), ("toys", "cloth"), ("cloth",)]
    for i, oc in enumerate(specs):
        _write(str(d / f"traj{i}.hdf5"), _episode(rng), "raw",
               object_classes=oc,
               camera_configuration="sudri0" if i < 2 else "vestri1")
    table = rr.load_metadata(str(d))
    # membership select: any trajectory containing the class
    assert len(table.select_objects("toys")) == 2
    assert len(table.select_objects("cloth")) == 2
    # exact-set select via a list argument
    exact = table.select_objects(["cloth", "toys"])
    assert list(exact.frame.index) == ["traj1.hdf5"]
    # camera_configuration row filter, reference pipeline style
    sudri = table[[c == "sudri0" for c in table.frame["camera_configuration"]]]
    assert len(sudri) == 2 and "camera_configuration" in sudri.keys()
    # filters compose
    assert len(sudri.select_objects("cloth")) == 1


def test_schema_canary_lists_missing_and_unknown_keys(tmp_path):
    """A file that fails to parse raises RawSchemaError naming the missing
    required paths AND the keys this loader doesn't know — schema drift in
    a future release surfaces as a named diff, not a bare KeyError
    (VERDICT r4 Next #7)."""
    bad = str(tmp_path / "bad.hdf5")
    with h5py.File(bad, "w") as hf:
        env = hf.create_group("env")  # no state, no cameras
        env.create_dataset("teleport_log", data=np.zeros(3))
        hf.create_group("wizardry")
        hf.create_group("policy").create_dataset("actionz", data=np.zeros(3))
    with pytest.raises(rr.RawSchemaError) as ei:
        rr.load_metadata_dict(bad)
    msg = str(ei.value)
    for expected in ("env/state", "policy/actions", "wizardry",
                     "env/teleport_log", "policy/actionz", "n_cams"):
        assert expected in msg, (expected, msg)
    # a well-formed file produces a clean report and parses fine
    good = _write(str(tmp_path / "good.hdf5"),
                  _episode(np.random.RandomState(15)), "raw")
    with h5py.File(good, "r") as hf:
        report = rr.schema_report(hf)
    assert "missing required: (none)" in report
    assert "unknown keys: (none)" in report
    rr.load_metadata_dict(good)


def test_multiview_raw_dataset_stacks_views(tmp_path):
    """--multiview + --camera_ids on a multi-stream raw file: the dataset
    item carries the selected streams stacked vertically with per-view
    masks, matching the env-side MultiviewMixin layout
    (envs/variants.py:92-105). Closes the vendored loader's multi-cam
    consumption gap (VERDICT r4 Next #10)."""
    rng = np.random.RandomState(16)
    imgs, states, actions, qpos = _episode(rng, ncam=2, adim=4)
    raw = _write(str(tmp_path / "sawyer_sudri0_c0" / "traj0.hdf5"),
                 (imgs, states, actions, qpos), "raw",
                 camera_configuration="sudri0")
    # native decode resolution is (64, 85); pick cfg sizes that make the
    # post-stack resize the identity so halves compare exactly
    mv_cfg = _our_cfg(multiview=True, camera_ids=(0, 1),
                      image_height=128, image_width=85)
    item = RoboNetHDF5Dataset([raw], ["sawyer_sudri0_c0"], mv_cfg)[0]
    assert item["images"].shape == (6, 128, 85, 3)
    assert item["masks"].shape[:3] == (6, 128, 85)

    solo = {
        c: RoboNetHDF5Dataset(
            [raw], [f"sawyer_sudri0_c{c}"],
            _our_cfg(image_height=64, image_width=85),
        )[0]
        for c in (0, 1)
    }
    np.testing.assert_array_equal(item["images"][:, :64], solo[0]["images"])
    np.testing.assert_array_equal(item["images"][:, 64:], solo[1]["images"])
    np.testing.assert_array_equal(item["masks"][:, :64], solo[0]["masks"])
    np.testing.assert_array_equal(item["masks"][:, 64:], solo[1]["masks"])
    # camera_ids out of range fall back to the first streams
    fb_cfg = _our_cfg(multiview=True, camera_ids=(0, 4),
                      image_height=128, image_width=85)
    fb = RoboNetHDF5Dataset([raw], ["sawyer_sudri0_c0"], fb_cfg)[0]
    np.testing.assert_array_equal(fb["images"], item["images"])


def test_dataset_raw_layout_unknown_robot_zero_masks(tmp_path):
    """Raw files from a robot with no measured chain still load (masks
    zeroed) rather than crash."""
    rng = np.random.RandomState(7)
    ep = _episode(rng, adim=5)
    raw = _write(str(tmp_path / "mystery_c0" / "traj0.hdf5"), ep, "raw",
                 robot="mysterybot")
    ds = RoboNetHDF5Dataset([raw], ["mystery_c0"], _our_cfg())
    item = ds[0]
    assert item["masks"].sum() == 0
    assert item["images"].shape == (6, 48, 64, 3)


def test_schema_canary_survives_dataset_where_group_expected(tmp_path):
    """`env`/`policy` stored as DATASETS (not groups) still produce the
    named RawSchemaError diff — the canary's 'never raises' contract must
    hold for node-kind drift, not just missing keys (r5 review fix)."""
    bad = str(tmp_path / "flat.hdf5")
    with h5py.File(bad, "w") as hf:
        hf.create_dataset("env", data=np.zeros(3))
        hf.create_dataset("policy", data=np.zeros(3))
    with pytest.raises(rr.RawSchemaError) as ei:
        rr.load_metadata_dict(bad)
    msg = str(ei.value)
    assert "env is not a group" in msg
    assert "policy is not a group" in msg


def test_multiview_single_valid_camera_id_honored(tmp_path):
    """--multiview --camera_ids 1 on an ncam=2 file must train on STREAM 1
    with stream-1 extrinsics masks — not silently substitute streams
    [0, 1] or render the mask under the primary view's calibration
    (r5 review fix)."""
    rng = np.random.RandomState(21)
    ep = _episode(rng, ncam=2, adim=4)
    raw = _write(str(tmp_path / "sawyer_sudri0_c0" / "traj0.hdf5"), ep,
                 "raw", camera_configuration="sudri0")
    got = RoboNetHDF5Dataset(
        [raw], ["sawyer_sudri0_c0"],
        _our_cfg(multiview=True, camera_ids=(1,),
                 image_height=64, image_width=85),
    )[0]
    want = RoboNetHDF5Dataset(
        [raw], ["sawyer_sudri0_c1"],
        _our_cfg(image_height=64, image_width=85),
    )[0]
    np.testing.assert_array_equal(got["images"], want["images"])
    np.testing.assert_array_equal(got["masks"], want["masks"])


def test_multiview_unsuffixed_dir_uses_per_view_calibration(tmp_path):
    """A multi-stream file under a dir WITHOUT a _c<k> suffix must still
    derive per-view calibration keys (base + appended _c<k>) — reusing the
    primary key for every view would pair view-1 pixels with view-0
    extrinsics masks (r5 review fix)."""
    rng = np.random.RandomState(22)
    ep = _episode(rng, ncam=2, adim=4)
    raw = _write(str(tmp_path / "sawyer_sudri0" / "traj0.hdf5"), ep,
                 "raw", camera_configuration="sudri0")
    item = RoboNetHDF5Dataset(
        [raw], ["sawyer_sudri0"],
        _our_cfg(multiview=True, camera_ids=(0, 1),
                 image_height=128, image_width=85),
    )[0]
    want_c1 = RoboNetHDF5Dataset(
        [raw], ["sawyer_sudri0_c1"],
        _our_cfg(image_height=64, image_width=85),
    )[0]
    # view 1 rows carry the _c1-calibration masks, not a copy of view 0's
    np.testing.assert_array_equal(item["masks"][:, 64:], want_c1["masks"])
    np.testing.assert_array_equal(item["images"][:, 64:], want_c1["images"])
