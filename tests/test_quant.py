"""int8 planning-path quantization (ops/quant.py + ops/nn int8 conv).

TPU-native extension with no reference analogue (the reference plans in
f32 torch, src/cem/trajectory_sampler.py:123-174): CEM is forward-only,
so rollout convs can use the MXU's 2x int8 throughput. These tests bound
the quantization error at the conv, model-rollout, and planner levels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.ops import nn, quant
from robot_aware_control_tpu.planning.cem import CEMPolicy
from robot_aware_control_tpu.utils.state import DemoGoalState, State


def test_int8_conv_matches_f32_within_quant_error(rng):
    p = nn.conv_init(jax.random.PRNGKey(0), 3, 3, 8, 16)
    x = jnp.asarray(rng.rand(2, 10, 12, 8).astype(np.float32))
    y_f = nn.conv2d(p, x)
    y_q = nn.conv2d(quant.quantize_conv_params(p), x)
    # symmetric 8-bit: relative error well under 2% at these magnitudes
    denom = float(jnp.abs(y_f).max())
    assert float(jnp.abs(y_q - y_f).max()) / denom < 0.02


def test_int8_conv_exact_on_grid_values(rng):
    """Weights/activations on the int8 grid with per-channel max 1 ->
    scales are exactly 1/127 and the int path reproduces the f32 conv to
    float rounding."""
    w = (rng.randint(-127, 128, (3, 3, 4, 8)) / 127.0).astype(np.float32)
    w[0, 0, 0, :] = 1.0  # pin every output channel's amax to 127/127
    p = {"w": jnp.asarray(w), "b": jnp.zeros((8,), jnp.float32)}
    x_np = (rng.randint(-127, 128, (1, 6, 6, 4)) / 127.0).astype(np.float32)
    x_np[0, 0, 0, 0] = 1.0  # pin the activation amax
    x = jnp.asarray(x_np)
    np.testing.assert_allclose(
        np.asarray(nn.conv2d(quant.quantize_conv_params(p), x)),
        np.asarray(nn.conv2d(p, x)), atol=1e-5,
    )


def test_quantize_tree_structure(rng):
    tree = {
        "enc": [{"conv": nn.conv_init(jax.random.PRNGKey(1), 3, 3, 4, 8)}],
        "upc1": {"conv": nn.conv_init(jax.random.PRNGKey(2), 4, 4, 8, 4)},
        "head": nn.linear_init(jax.random.PRNGKey(3), 16, 4),
    }
    q = quant.quantize_conv_tree(tree)
    assert q["enc"][0]["conv"]["w_q"].dtype == jnp.int8
    assert q["enc"][0]["conv"]["w_scale"].shape == (8,)
    # transpose-conv params (lax.conv_transpose consumers) stay float
    assert "w" in q["upc1"]["conv"] and "w_q" not in q["upc1"]["conv"]
    # linear layers stay float
    assert "w" in q["head"] and "w_q" not in q["head"]
    # idempotent
    q2 = quant.quantize_conv_tree(q)
    assert q2["enc"][0]["conv"]["w_q"].dtype == jnp.int8


@pytest.fixture(scope="module")
def quant_cfg():
    return Config(
        model="svg", g_dim=16, z_dim=4, image_width=64, image_height=48,
        action_dim=5, robot_dim=5, robot_joint_dim=5, model_use_mask=True,
        model_use_robot_state=True, reconstruction_loss="dontcare_l1",
        reward_type="dontcare", compute_dtype="float32", horizon=3,
        opt_iter=2, action_candidates=8, topk=3, cem_init_std=0.015,
    )


def test_svg_rollout_drift_bounded(quant_cfg, rng):
    """5-step autoregressive rollout: int8 params track f32 within a few
    grey levels — quantization noise must not compound into planning-
    relevant drift."""
    cfg = quant_cfg
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    q_params = quant.quantize_conv_tree(params)
    h, w = cfg.image_height, cfg.image_width

    def rollout(p):
        carry = model.init_carry(cfg, 2)
        x = jnp.asarray(rng_frames["x0"])
        skip = None
        frames = []
        for t in range(5):
            out, carry, _ = model.step(
                cfg, p, bn, carry, image=x,
                mask=jnp.asarray(rng_frames["masks"][t]),
                robot=jnp.asarray(rng_frames["robot"][t]), heatmap=None,
                action=jnp.asarray(rng_frames["acts"][t]),
                rng=jax.random.PRNGKey(t), skip=skip, sample_mean=True,
                train=False,
            )
            if t == 0:
                skip = out["skip"]
            from robot_aware_control_tpu.models.svg import composite
            x = composite(out["x_pred"], x)
            frames.append(np.asarray(x))
        return np.stack(frames)

    rng_frames = {
        "x0": rng.rand(2, h, w, 3).astype(np.float32),
        "masks": rng.rand(5, 2, h, w, 1).astype(np.float32),
        "robot": rng.rand(5, 2, 5).astype(np.float32),
        "acts": (rng.rand(5, 2, 5).astype(np.float32) - 0.5) * 0.1,
    }
    f_f32 = rollout(params)
    f_int8 = rollout(q_params)
    drift = np.abs(f_f32 - f_int8).max()
    assert drift < 0.05, f"int8 rollout drift {drift:.4f} (frames in [0,1])"


def test_cem_plan_int8_smoke(quant_cfg, rng):
    """--plan_quantize int8 plans end-to-end and stays near the f32 plan."""
    cfg = quant_cfg
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    h, w = cfg.image_height, cfg.image_width
    start = State(
        img=rng.rand(h, w, 3).astype(np.float32),
        state=np.array([0.3, 0.0, 0.15, 0, 0], np.float32),
        qpos=np.zeros(5, np.float32),
    )
    goal = DemoGoalState(
        imgs=[rng.rand(h, w, 3).astype(np.float32) for _ in range(2)],
        masks=[np.zeros((h, w), np.float32) for _ in range(2)],
    )
    policy_q = CEMPolicy(cfg.replace(plan_quantize="int8"), params, bn)
    assert "w_q" in policy_q.params["frame_lstm"]["cell0"]["gates"]
    plan_q = policy_q.get_action(start, goal)
    assert plan_q.shape == (cfg.horizon - 1, 2)
    assert np.all(np.isfinite(plan_q))
    assert np.all(np.abs(plan_q) <= 0.05 + 1e-6)
    # deterministic given the same seed inputs (dynamic activation scales
    # are pure functions of the data — no hidden state)
    np.testing.assert_allclose(plan_q, policy_q.get_action(start, goal))
