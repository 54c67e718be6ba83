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
