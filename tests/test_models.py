"""Model step-function tests: shapes, determinism, scan compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models import copy_model, det, robot_mlp, svg

CFG = Config(
    model="svg",
    g_dim=16,
    z_dim=4,
    image_width=64,
    image_height=48,
    batch_size=2,
    action_dim=5,
    robot_dim=5,
    model_use_mask=True,
    model_use_robot_state=True,
    reconstruction_loss="dontcare_l1",
    compute_dtype="float32",
)


def _batch(cfg, b=2):
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (b, cfg.image_height, cfg.image_width, 3))
    mask = (jax.random.uniform(k, (b, cfg.image_height, cfg.image_width, 1)) > 0.8).astype(jnp.float32)
    robot = jax.random.normal(k, (b, cfg.robot_dim))
    action = jax.random.normal(k, (b, cfg.action_dim))
    return img, mask, robot, action


def test_svg_step_shapes_and_carry():
    cfg = CFG
    params, state = svg.init(jax.random.PRNGKey(0), cfg)
    carry = svg.init_carry(cfg, 2)
    img, mask, robot, action = _batch(cfg)

    out, carry2, state2 = svg.step(
        cfg, params, state, carry,
        image=img, mask=mask, robot=robot, heatmap=None, action=action,
        rng=jax.random.PRNGKey(1),
        next_image=img, next_mask=mask, next_robot=robot,
        train=True,
    )
    assert out["x_pred"].shape == (2, 48, 64, 4)
    assert out["mu"].shape == (2, 6, 8, 4)
    assert out["mu_p"].shape == (2, 6, 8, 4)
    # carry advanced
    h0 = np.asarray(carry.frame[0][0])
    h1 = np.asarray(carry2.frame[0][0])
    assert not np.allclose(h0, h1)
    # bn state advanced
    m0 = jax.tree_util.tree_leaves(state["encoder"])[0]
    m1 = jax.tree_util.tree_leaves(state2["encoder"])[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))

    comp = svg.composite(out["x_pred"], img)
    assert comp.shape == (2, 48, 64, 3)


def test_svg_prior_only_rollout_step():
    cfg = CFG
    params, state = svg.init(jax.random.PRNGKey(0), cfg)
    carry = svg.init_carry(cfg, 2)
    img, mask, robot, action = _batch(cfg)
    out, _, _ = svg.step(
        cfg, params, state, carry,
        image=img, mask=mask, robot=robot, heatmap=None, action=action,
        rng=jax.random.PRNGKey(1), train=False, sample_mean=True,
    )
    assert out["mu"] is None  # no posterior without next frame
    assert out["x_pred"].shape == (2, 48, 64, 4)


def test_svg_step_jits_and_is_deterministic():
    cfg = CFG
    params, state = svg.init(jax.random.PRNGKey(0), cfg)
    carry = svg.init_carry(cfg, 2)
    img, mask, robot, action = _batch(cfg)

    def f(params, state, carry, img, mask, robot, action, rng):
        out, c, s = svg.step(
            cfg, params, state, carry,
            image=img, mask=mask, robot=robot, heatmap=None, action=action,
            rng=rng, train=False,
        )
        return out["x_pred"]

    jf = jax.jit(f)
    a = jf(params, state, carry, img, mask, robot, action, jax.random.PRNGKey(7))
    b = jf(params, state, carry, img, mask, robot, action, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_det_step():
    cfg = CFG.replace(model="det")
    params, state = det.init(jax.random.PRNGKey(0), cfg)
    carry = det.init_carry(cfg, 2)
    img, mask, robot, action = _batch(cfg)
    out, carry2, state2 = det.step(
        cfg, params, state, carry, img, mask, robot, action, train=True
    )
    assert out["x_pred"].shape == (2, 48, 64, 4)


def test_copy_model():
    img = jnp.zeros((1, 4, 4, 3))
    nxt = jnp.ones((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0].set(1.0)
    pred = copy_model.step(img, nxt, mask)
    assert float(pred[0, 0, 0, 0]) == 1.0  # robot pixel from next image
    assert float(pred[0, 1, 1, 0]) == 0.0  # world pixel from prev image


def test_robot_mlps():
    cfg = CFG.replace(robot_joint_dim=5)
    jp = robot_mlp.joint_pos_predictor_init(jax.random.PRNGKey(0), cfg)
    gp = robot_mlp.gripper_state_predictor_init(jax.random.PRNGKey(1), cfg)
    q = jnp.zeros((3, 5))
    r = jnp.zeros((3, 5))
    a = jnp.zeros((3, 5))
    assert robot_mlp.joint_pos_predictor(jp, q, a).shape == (3, 5)
    assert robot_mlp.gripper_state_predictor(gp, r, a).shape == (3, 5)


def test_svg_future_robot_state_variant():
    cfg = CFG.replace(model_use_future_robot_state=True)
    params, state = svg.init(jax.random.PRNGKey(0), cfg)
    carry = svg.init_carry(cfg, 2)
    img, mask, robot, action = _batch(cfg)
    out, _, _ = svg.step(
        cfg, params, state, carry,
        image=img, mask=mask, robot=(robot, robot), heatmap=None, action=action,
        rng=jax.random.PRNGKey(1), train=False,
    )
    assert out["x_pred"].shape == (2, 48, 64, 4)
