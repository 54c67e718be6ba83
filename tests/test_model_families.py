"""Vector SVG/Det and CDNA model family tests (reference:
src/prediction/models/dynamics.py:75-266, 647-815)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.synthetic import synthetic_batch
from robot_aware_control_tpu.models import cdna
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training.step import make_train_step


def _cfg(model, **kw):
    base = dict(
        model=model,
        g_dim=16,
        z_dim=4,
        rnn_size=32,
        image_width=64,
        image_height=48,
        action_dim=5,
        robot_dim=5,
        robot_joint_dim=5,
        action_enc_dim=4,
        robot_enc_dim=4,
        prior_rnn_layers=1,
        posterior_rnn_layers=1,
        predictor_rnn_layers=1,
        model_use_mask=True,
        model_use_robot_state=True,
        n_past=1,
        n_future=2,
        compute_dtype="float32",
        cdna_kernel_size=5,
        lr=1e-3,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("model", ["svg_vec", "det_vec", "cdna_det",
                                   "cdna_robonet"])
def test_model_family_step_shapes(model):
    cfg = _cfg(model)
    mod = get_model(cfg)
    params, state = mod.init(jax.random.PRNGKey(0), cfg)
    B = 2
    carry = mod.init_carry(cfg, B)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, 48, 64, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(B, 48, 64, 1) > 0.8, jnp.float32)
    robot = jnp.asarray(rng.rand(B, 5), jnp.float32)
    action = jnp.asarray(rng.rand(B, 5), jnp.float32)
    if model == "svg_vec":
        out, carry2, state2 = mod.step(
            cfg, params, state, carry, img, mask, robot, None, action,
            jax.random.PRNGKey(1), next_image=img, next_mask=mask,
            next_robot=robot, train=True,
        )
        assert out["mu"].shape == (B, cfg.z_dim)
        assert out["x_pred"].shape == (B, 48, 64, 3)
    elif model == "det_vec":
        out, carry2, state2 = mod.step(
            cfg, params, state, carry, img, mask, robot, action, train=True
        )
        assert out["x_pred"].shape == (B, 48, 64, 3)
    else:
        out, carry2, state2 = mod.step(
            cfg, params, state, carry, img, mask, robot, action,
            context_image=img, train=True,
        )
        assert out["x_pred"].shape == (B, 48, 64, 3)
    assert np.all(np.isfinite(np.asarray(out["x_pred"], np.float32)))


def test_cdna_kernels_normalized_and_shift_invariance():
    """A delta-kernel einsum warp must reproduce a pure image shift."""
    img = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    k = jnp.zeros((1, 3, 3, 1)).at[0, 1, 2, 0].set(1.0)  # shift left by 1
    out = cdna.apply_cdna_kernels(img, k)
    assert float(out[0, 4, 3, 0, 0]) == pytest.approx(1.0)
    assert float(jnp.sum(out)) == pytest.approx(1.0)


@pytest.mark.parametrize("model", ["svg_vec", "cdna_det"])
def test_train_step_runs_for_family(model):
    cfg = _cfg(model, reconstruction_loss="l1", scheduled_sampling=False,
               batch_size=2)
    mod = get_model(cfg)
    params, bn = mod.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt_state = tx.init(params)
    batch = synthetic_batch(cfg, 2, cfg.n_past + cfg.n_future, seed=0)
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ("images", "masks", "states")}
    dev["actions"] = jnp.asarray(batch["actions"])
    losses = []
    for i in range(3):
        params, bn, opt_state, m = tstep(
            params, bn, opt_state, dev, jax.random.PRNGKey(i), jnp.float32(1.0)
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
