"""Resolution / conditioning variants: 128x128 (reference vgg.py),
multiview stacked views (reference multiview flag), n_past>1 skip
freezing (reference trainer.py:409-410)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.synthetic import synthetic_batch
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training.step import make_train_step


def test_svg_step_128x128():
    """128x128 path (reference: vgg.py variant) — fully convolutional."""
    cfg = Config(model="svg", g_dim=8, z_dim=2, image_height=128,
                 image_width=128, action_dim=5, robot_dim=5,
                 model_use_mask=True, model_use_robot_state=True,
                 compute_dtype="float32")
    from robot_aware_control_tpu.models import svg

    params, bn = svg.init(jax.random.PRNGKey(0), cfg)
    carry = svg.init_carry(cfg, 1)
    rng = np.random.RandomState(0)
    out, _, _ = svg.step(
        cfg, params, bn, carry,
        image=jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32),
        mask=jnp.asarray(rng.rand(1, 128, 128, 1), jnp.float32),
        robot=jnp.asarray(rng.rand(1, 5), jnp.float32),
        heatmap=None,
        action=jnp.asarray(rng.rand(1, 5), jnp.float32),
        rng=jax.random.PRNGKey(1), skip=None, train=False,
    )
    assert out["x_pred"].shape == (1, 128, 128, 4)


def test_multiview_stacked_training():
    """Two stacked views train through the fully-conv models
    (image_height = 2 x per-view height)."""
    cfg = Config(model="det", g_dim=8, image_height=32, image_width=16,
                 action_dim=5, robot_dim=5, robot_joint_dim=5,
                 model_use_mask=True, model_use_robot_state=True,
                 n_past=1, n_future=2, reconstruction_loss="l1",
                 compute_dtype="float32", batch_size=2, lr=1e-3)
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt = tx.init(params)
    batch = synthetic_batch(cfg, 2, 3, seed=0)
    dev = {k: jnp.asarray(batch[k]) for k in ("images", "masks", "states")}
    dev["actions"] = jnp.asarray(batch["actions"])
    params, bn, opt, m = tstep(params, bn, opt, dev, jax.random.PRNGKey(0),
                               jnp.float32(1.0))
    assert np.isfinite(float(m["loss"]))


def test_n_past_2_skip_freezing():
    """Skip connections update through n_past frames then freeze
    (reference: trainer.py:409-410)."""
    cfg = Config(model="det", g_dim=8, image_height=16, image_width=16,
                 action_dim=5, robot_dim=5, robot_joint_dim=5,
                 model_use_mask=True, model_use_robot_state=True,
                 n_past=2, n_future=2, reconstruction_loss="l1",
                 compute_dtype="float32", batch_size=2, lr=1e-3)
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt = tx.init(params)
    batch = synthetic_batch(cfg, 2, 4, seed=0)
    dev = {k: jnp.asarray(batch[k]) for k in ("images", "masks", "states")}
    dev["actions"] = jnp.asarray(batch["actions"])
    losses = []
    for i in range(3):
        params, bn, opt, m = tstep(params, bn, opt, dev,
                                   jax.random.PRNGKey(i), jnp.float32(1.0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
