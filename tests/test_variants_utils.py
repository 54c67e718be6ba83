"""Env variants, RRT/collision, sweep, attention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.envs.variants import (
    LocobotOcclusionEnv,
    LocobotPickMultiviewEnv,
    make,
)
from robot_aware_control_tpu.models.svg_vector import attention, attention_init
from robot_aware_control_tpu.training.sweep import expand_grid, run_sweep
from robot_aware_control_tpu.utils.planning_geom import (
    RRT,
    planar_rrt,
    segment_sphere_collision,
)


def test_occlusion_env_blocks_column():
    env = LocobotOcclusionEnv(seed=0)
    obs = env.reset()
    img = obs["observation"]
    x0, x1 = int(0.55 * 64), int(0.75 * 64)
    occluded = img[:, x0:x1]
    assert np.allclose(occluded, occluded[0, 0])  # uniform occluder color
    assert obs["masks"].sum() > 0  # mask NOT occluded


def test_multiview_env_stacks_views():
    env = LocobotPickMultiviewEnv(seed=0)
    obs = env.reset()
    assert obs["observation"].shape == (96, 64, 3)
    assert obs["masks"].shape == (96, 64, 1)
    top, bottom = obs["observation"][:48], obs["observation"][48:]
    assert not np.allclose(top, bottom)  # genuinely distinct viewpoints


def test_env_registry():
    env = make("LocobotPush", seed=0)
    assert env.action_dim == 2
    with pytest.raises(KeyError):
        make("NotAnEnv")


def test_segment_sphere_collision():
    assert segment_sphere_collision([0, 0, 0], [1, 0, 0], [0.5, 0.05, 0], 0.1)
    assert not segment_sphere_collision([0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], 0.1)


def test_planar_rrt_avoids_obstacle():
    path = planar_rrt([0.0, 0.0], [1.0, 0.0], low=[-0.2, -0.6],
                      high=[1.2, 0.6], obstacles=[[0.5, 0.0]],
                      obstacle_radius=0.15, seed=0, max_iters=5000,
                      step_size=0.08)
    assert path is not None
    np.testing.assert_allclose(path[-1], [1.0, 0.0], atol=1e-6)
    # no segment passes through the obstacle
    for a, b in zip(path[:-1], path[1:]):
        assert not segment_sphere_collision(
            [a[0], a[1], 0], [b[0], b[1], 0], [0.5, 0, 0], 0.15
        )


def test_collision_objects_and_rrt():
    """CollisionBox/CollisionSphere semantics + object-aware RRT
    (reference: collision.py:22-71, rrt.py)."""
    from robot_aware_control_tpu.utils.planning_geom import (
        CollisionBox,
        CollisionSphere,
        rrt_with_objects,
    )

    box = CollisionBox([0.0, 0.0], [0.1, 0.2])
    assert box.in_collision([0.1, 0.2])  # boundary collides
    assert not box.in_collision([0.11, 0.0])
    sph = CollisionSphere([1.0, 0.0], 0.5)
    assert sph.in_collision([1.4, 0.0])
    assert not sph.in_collision([1.6, 0.0])
    assert sph.line_in_collision(np.array([0.0, 0.0]), np.array([1.0, 0.0]))
    assert not sph.line_in_collision(np.array([0.0, 2.0]), np.array([1.0, 0.0]))

    path = rrt_with_objects(
        [0.0, 0.0], [1.0, 0.0], low=[-0.2, -0.6], high=[1.2, 0.6],
        objects=[CollisionSphere([0.5, 0.0], 0.15)],
        step_size=0.08, max_iters=4000, seed=3,
    )
    assert path is not None
    for p in path:
        assert np.linalg.norm(np.asarray(p) - [0.5, 0.0]) > 0.14


def test_expand_grid():
    base = Config(jobname="s")
    cfgs = expand_grid(base, {"lr": [1e-3, 1e-4], "g_dim": [8, 16]})
    assert len(cfgs) == 4
    assert len({c.jobname for c in cfgs}) == 4


def test_run_sweep_selects_best(tmp_path):
    base = Config(
        model="det", experiment="synthetic", g_dim=8, image_height=16,
        image_width=16, batch_size=2, test_batch_size=2, niter=1,
        epoch_size=1, n_past=1, n_future=2, n_eval=3, video_length=4,
        checkpoint_interval=5, eval_interval=5, compute_dtype="float32",
        robot_dim=5, action_dim=5, robot_joint_dim=5, model_use_mask=True,
        model_use_robot_state=True, reconstruction_loss="l1",
        log_dir=str(tmp_path), jobname="sw", num_devices=1,
    )
    best, results = run_sweep(base, {"lr": [1e-3, 1e-4]},
                              metric="train/loss", mode="min")
    assert best is not None
    assert len(results) == 2
    assert all(r["value"] is not None for r in results)


def test_attention_shapes(rng):
    params = attention_init(jax.random.PRNGKey(0), 8)
    feats = jnp.asarray(rng.rand(2, 5, 8), jnp.float32)
    out = attention(params, feats)
    assert out.shape == (2, 8)
