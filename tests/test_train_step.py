"""End-to-end train/eval step tests: loss decreases on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.synthetic import synthetic_batch
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training.step import (
    make_eval_step,
    make_optimizer,
    make_train_step,
)

TINY = Config(
    model="svg",
    g_dim=16,
    z_dim=4,
    image_width=64,
    image_height=48,
    batch_size=2,
    action_dim=5,
    robot_dim=5,
    robot_joint_dim=5,
    n_past=1,
    n_future=3,
    n_eval=4,
    model_use_mask=True,
    model_use_robot_state=True,
    reconstruction_loss="dontcare_l1",
    scheduled_sampling=True,
    compute_dtype="float32",
    lr=1e-3,
)


def _window(batch, w):
    out = {k: v[:w] for k, v in batch.items() if k in ("images", "masks", "states")}
    out["actions"] = batch["actions"][: w - 1]
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_train_step_runs_and_learns():
    cfg = TINY
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt_state = tx.init(params)

    batch = _window(synthetic_batch(cfg, 2, 8, seed=0), cfg.n_past + cfg.n_future)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        params, bn, opt_state, metrics = tstep(
            params, bn, opt_state, batch, sub, jnp.float32(1.0)
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_train_step_det_model():
    cfg = TINY.replace(model="det", reconstruction_loss="l1", model_use_mask=False)
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt_state = tx.init(params)
    batch = _window(synthetic_batch(cfg, 2, 8, seed=0), cfg.n_past + cfg.n_future)
    l0 = None
    rng = jax.random.PRNGKey(0)
    for i in range(5):
        rng, sub = jax.random.split(rng)
        params, bn, opt_state, metrics = tstep(
            params, bn, opt_state, batch, sub, jnp.float32(1.0)
        )
        if l0 is None:
            l0 = float(metrics["loss"])
    assert float(metrics["loss"]) < l0


def test_eval_step_metrics():
    cfg = TINY
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    estep = make_eval_step(cfg, autoregressive=True)
    batch = _window(synthetic_batch(cfg, 2, 8, seed=1), cfg.n_eval)
    per_step, preds = estep(params, bn, batch, jax.random.PRNGKey(2))
    assert preds.shape == (cfg.n_eval - 1, 2, 48, 64, 3)
    for k in ("psnr", "ssim", "recon_loss", "robot_loss", "world_loss", "kld"):
        assert per_step[k].shape == (cfg.n_eval - 1,)
        assert np.isfinite(np.asarray(per_step[k])).all(), k


def test_eval_step_one_step_mode():
    cfg = TINY
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    estep = make_eval_step(cfg, autoregressive=False)
    batch = _window(synthetic_batch(cfg, 2, 8, seed=1), cfg.n_eval)
    per_step, _ = estep(params, bn, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(per_step["psnr"])).all()


def test_remat_policies_match():
    """remat=off / remat=full / remat=conv are numerically identical —
    rematerialization changes memory/FLOP scheduling, never values."""
    batch = _window(synthetic_batch(TINY, 2, 8, seed=3), TINY.n_past + TINY.n_future)
    rng, prob = jax.random.PRNGKey(7), jnp.float32(1.0)
    outs = []
    for remat, policy in ((False, "full"), (True, "full"), (True, "conv")):
        cfg = TINY.replace(remat=remat, remat_policy=policy)
        model = get_model(cfg)
        params, bn = model.init(jax.random.PRNGKey(0), cfg)
        tstep, tx = make_train_step(cfg)
        opt_state = tx.init(params)
        params, bn, opt_state, metrics = tstep(
            params, bn, opt_state, batch, rng, prob
        )
        outs.append((params, float(metrics["loss"])))
    p0, l0 = outs[0]
    for p, l in outs[1:]:
        assert abs(l - l0) < 1e-4 * max(1.0, abs(l0))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
            p0, p,
        )
