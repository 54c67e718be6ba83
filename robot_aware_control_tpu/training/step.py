"""Jitted training / evaluation steps.

The reference trains per-window with an external Python time loop that
mutates module hidden state and accumulates loss across the window before a
single Adam step (reference: src/prediction/trainer.py:326-465). Here the
*entire window* — scheduled sampling, conditioning permutations, robot-pixel
blackout, skip freezing, compositing, recon+KL — is one `lax.scan` inside
one jitted, donated `train_step`, so XLA fuses the whole unrolled graph and
a step is a single device program. Batch shards over the mesh's "data" axis;
the gradient all-reduce is inserted by XLA over ICI.

Semantics preserved from the reference hot loop (trainer.py:326-465):
  * scheduled sampling: one Bernoulli per step for the whole batch
    (trainer.py:141-147, 352-356); ground truth always at the first step.
  * robot-pixel blackout of model inputs when a dontcare loss or
    black_robot_input is active (trainer.py:364-368).
  * future-mask / future-state / heatmap conditioning concat
    (trainer.py:373-381); at the final target step the future mask input
    duplicates the current one (trainer.py:386-391).
  * skip frozen after n_past conditioning frames unless last_frame_skip
    (trainer.py:370, 409-410).
  * composite x̂ = (1-m̂)·x_prev + m̂·x̂_rgb (trainer.py:406-407).
  * loss = Σ_t recon + β·Σ_t KL, one optimizer step per window
    (trainer.py:459-461); logged metrics divided by n_future
    (trainer.py:463-465).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models import copy_model, det, svg
from robot_aware_control_tpu.models.common import composite as model_composite, skip_zeros
from robot_aware_control_tpu.models.registry import is_stochastic
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.ops import losses as L
from robot_aware_control_tpu.ops import metrics as M


def make_optimizer(cfg: Config):
    """Adam with torch-matching hyperparameters (reference: trainer.py:109-116)."""
    if cfg.optimizer == "adam":
        return optax.adam(cfg.lr, b1=cfg.beta1, b2=0.999, eps=1e-8)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(cfg.lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(f"Unknown optimizer: {cfg.optimizer}")


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _model_step(cfg, params, bn, carry, skip, use_curr_skip, x_j, m_in, r_in,
                hm_in, a_j, rng, next_inputs, train, force_use_prior=False,
                sample_mean=False, context_image=None):
    """Dispatch one step to the configured model family."""
    if cfg.model in ("svg", "svg_vec"):
        mod = svg if cfg.model == "svg" else _svg_vector()
        kwargs = {}
        if next_inputs is not None:
            kwargs = dict(
                next_image=next_inputs["image"],
                next_mask=next_inputs["mask"],
                next_robot=next_inputs["robot"],
            )
            if cfg.model == "svg":
                kwargs["next_heatmap"] = next_inputs["heatmap"]
        out, new_carry, new_bn = mod.step(
            cfg, params, bn, carry,
            image=x_j, mask=m_in, robot=r_in, heatmap=hm_in, action=a_j,
            rng=rng, skip=skip, use_curr_skip=use_curr_skip,
            force_use_prior=force_use_prior, sample_mean=sample_mean,
            train=train, **kwargs,
        )
    elif cfg.model in ("det", "det_vec"):
        mod = det if cfg.model == "det" else _svg_vector().det
        kwargs = {"rng": rng} if cfg.model == "det_vec" else {}  # dropout
        out, new_carry, new_bn = mod.step(
            cfg, params, bn, carry, x_j, m_in, r_in, a_j,
            skip=skip, use_curr_skip=use_curr_skip, train=train, **kwargs,
        )
        out = dict(out, mu=None, logvar=None, mu_p=None, logvar_p=None)
    elif cfg.model in ("cdna_det", "cdna_robonet"):
        from robot_aware_control_tpu.models import cdna

        mod = cdna if cfg.model == "cdna_det" else cdna.robonet
        out, new_carry, new_bn = mod.step(
            cfg, params, bn, carry, x_j, m_in, r_in, a_j,
            context_image=context_image, skip=skip,
            use_curr_skip=use_curr_skip, train=train,
        )
        out = dict(out, mu=None, logvar=None, mu_p=None, logvar_p=None)
    else:
        raise ValueError(cfg.model)
    return out, new_carry, new_bn


def _svg_vector():
    from robot_aware_control_tpu.models import svg_vector

    return svg_vector


def _conditioning(cfg, m_j, m_i, r_j, r_i, hm_j, hm_i, last_step):
    """Build mask/state/heatmap conditioning inputs for one step
    (reference: trainer.py:373-381)."""
    m_in = m_j
    if cfg.model_use_future_mask:
        m_in = jnp.concatenate([m_j, m_i], -1)
    r_in = r_j
    if cfg.model_use_future_robot_state:
        r_in = (r_j, r_i)
    hm_in = hm_j
    if cfg.model_use_future_heatmap and hm_j is not None:
        hm_in = jnp.concatenate([hm_j, hm_i], -1)
    return m_in, r_in, hm_in


def _next_conditioning(cfg, x_i_black, m_i, r_i, hm_i):
    """Posterior-side inputs; future-channel duplication at the target step
    (reference: trainer.py:386-391)."""
    m_next = m_i
    if cfg.model_use_future_mask:
        m_next = jnp.concatenate([m_i, m_i], -1)
    hm_next = hm_i
    if cfg.model_use_future_heatmap and hm_i is not None:
        hm_next = jnp.concatenate([hm_i, hm_i], -1)
    return {"image": x_i_black, "mask": m_next, "robot": r_i, "heatmap": hm_next}


def _recon_loss(cfg: Config, prediction, target, mask, batch_weight=None):
    """(reference: trainer.py:149-161)"""
    kind = cfg.reconstruction_loss
    if kind == "mse":
        return L.mse_criterion(prediction, target)
    if kind == "l1":
        return L.l1_criterion(prediction, target, batch_weight)
    if kind == "dontcare_mse":
        return L.dontcare_mse_criterion(
            prediction, target, mask, cfg.robot_pixel_weight
        )
    if kind == "dontcare_l1":
        return L.dontcare_l1_criterion(
            prediction, target, mask, cfg.robot_pixel_weight, batch_weight
        )
    raise NotImplementedError(kind)


def make_train_step(cfg: Config):
    """Builds the jitted whole-window training step.

    Signature: train_step(params, bn_state, opt_state, batch, rng, sched_prob)
      -> (params, bn_state, opt_state, metrics_dict)

    batch: time-first dict
      images   (W, B, H, W', 3) float32 in [0,1]
      masks    (W, B, H, W', 1)
      states   (W, B, robot_dim)
      actions  (W-1, B, action_dim)
      heatmaps (W, B, H, W', 1) iff model_use_heatmap
      batch_weight (B,) optional movement weighting (trainer.py:426-429)
    """
    tx = make_optimizer(cfg)
    dtype = _compute_dtype(cfg)
    window = cfg.n_past + cfg.n_future
    is_svg = is_stochastic(cfg)

    def loss_fn(params, bn_state, batch, rng, sched_prob):
        x = batch["images"]
        masks = batch["masks"]
        states = batch["states"]
        actions = batch["actions"]
        heatmaps = batch.get("heatmaps")
        batch_weight = batch.get("batch_weight")
        B = x.shape[1]

        carry0 = {
            "model": get_model(cfg).init_carry(cfg, B, dtype),
            "skip": skip_zeros(cfg, B, dtype),
            "x_prev": x[0],
            "bn": bn_state,
            "rng": rng,
        }
        xs = {
            "x_j": x[:-1], "x_i": x[1:],
            "m_j": masks[:-1], "m_i": masks[1:],
            "r_j": states[:-1], "r_i": states[1:],
            "a_j": actions,
            "idx": jnp.arange(1, window),
        }
        if heatmaps is not None:
            xs["hm_j"], xs["hm_i"] = heatmaps[:-1], heatmaps[1:]

        def scan_step(carry, inp):
            i = inp["idx"]
            rng, rng_model, rng_ss = jax.random.split(carry["rng"], 3)

            if cfg.scheduled_sampling:
                use_truth = jax.random.bernoulli(rng_ss, sched_prob)
            else:
                use_truth = jnp.bool_(True)
            take_truth = jnp.logical_or(i <= 1, use_truth)
            x_j = jnp.where(take_truth, inp["x_j"], carry["x_prev"])

            m_j, m_i = inp["m_j"], inp["m_i"]
            r_j, r_i = inp["r_j"], inp["r_i"]
            hm_j = inp.get("hm_j")
            hm_i = inp.get("hm_i")
            x_i = inp["x_i"]

            x_j_black, x_i_black = x_j, x_i
            if cfg.dontcare:
                x_j_black = L.zero_robot_region(m_j, x_j)
                x_i_black = L.zero_robot_region(m_i, x_i)

            m_in, r_in, hm_in = _conditioning(cfg, m_j, m_i, r_j, r_i, hm_j, hm_i, False)
            next_inputs = (
                _next_conditioning(cfg, x_i_black, m_i, r_i, hm_i) if is_svg else None
            )

            out, model_carry, bn = _model_step(
                cfg, params, carry["bn"], carry["model"], carry["skip"],
                use_curr_skip=(i <= 1) if not cfg.last_frame_skip else None,
                x_j=x_j_black, m_in=m_in, r_in=r_in, hm_in=hm_in, a_j=inp["a_j"],
                rng=rng_model, next_inputs=next_inputs, train=True,
                context_image=x[cfg.n_past - 1],
            )

            x_pred = model_composite(cfg, out["x_pred"], x_j).astype(jnp.float32)

            # freeze skip after the conditioning frames (trainer.py:409-410)
            new_skip = jax.tree_util.tree_map(
                lambda c, s: jnp.where(i <= cfg.n_past, c, s),
                out["curr_skip"], carry["skip"],
            )

            recon = _recon_loss(cfg, x_pred, x_i, m_i, batch_weight)
            step_losses = {
                "recon_loss": recon,
                "robot_loss": L.robot_mse_criterion(x_pred, x_i, m_i),
                "world_loss": L.world_mse_criterion(x_pred, x_i, m_i),
            }
            if is_svg:
                kld = L.kl_criterion(
                    out["mu"], out["logvar"], out["mu_p"], out["logvar_p"], B
                )
                step_losses["kld"] = kld

            new_carry = {
                "model": model_carry,
                "skip": new_skip,
                "x_prev": x_pred,
                "bn": bn,
                "rng": rng,
            }
            return new_carry, step_losses

        # rematerialize per-step activations in the backward pass instead of
        # storing the whole unrolled window (HBM pressure at large batch).
        # "conv" policy keeps every conv/dot output resident and re-runs
        # only the elementwise chains between them — backward then reads
        # saved MXU outputs instead of re-paying the MXU FLOPs.
        if cfg.remat and cfg.remat_policy == "conv":
            def _mxu_saveable(prim, *_, **__):
                return prim in (jax.lax.conv_general_dilated_p,
                                jax.lax.dot_general_p)

            step_fn = jax.checkpoint(
                scan_step, prevent_cse=False, policy=_mxu_saveable
            )
        elif cfg.remat:
            step_fn = jax.checkpoint(scan_step, prevent_cse=False)
        else:
            step_fn = scan_step
        final, step_losses = jax.lax.scan(step_fn, carry0, xs)
        totals = jax.tree_util.tree_map(jnp.sum, step_losses)
        loss = totals["recon_loss"]
        if is_svg:
            loss = loss + cfg.beta * totals["kld"]
        metrics = {k: v / cfg.n_future for k, v in totals.items()}
        metrics["loss"] = loss
        return loss, (final["bn"], metrics)

    def train_step(params, bn_state, opt_state, batch, rng, sched_prob):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bn, metrics)), grads = grad_fn(
            params, bn_state, batch, rng, sched_prob
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bn, new_opt_state, metrics

    return jax.jit(train_step, donate_argnums=(0, 1, 2)), tx


def make_copy_eval_step(cfg: Config, autoregressive: bool = True):
    """Jitted eval window for the parameter-free CopyModel, producing the
    SAME per-step metric keys as `make_eval_step` so the copy baseline's
    epoch metrics are key-compatible with learned-model eval (reference:
    trainer.py:606-607 routes `cf.model == "copy"` through the shared
    `_eval_step` metric block at :677-697; baseline scope at :794-827).

    Signature matches make_eval_step's product: (params, bn, batch, rng) ->
    (per_step_metrics, preds); params/bn/rng are ignored (no parameters,
    deterministic)."""

    def eval_step(params, bn_state, batch, rng):
        del params, bn_state, rng
        x = jnp.asarray(batch["images"], jnp.float32)
        tm = jnp.asarray(batch["masks"], jnp.float32)

        def scan_step(x_prev, inp):
            x_i, tm_i = inp
            # copy world pixels of the previous frame through the next
            # true mask (dynamics.py:341-360: forward(image, mask,
            # next_image, next_mask); AR feeds the previous prediction)
            x_pred = copy_model.step(x_prev, x_i, tm_i)
            recon = _recon_loss(cfg, x_pred, x_i, tm_i)
            x_pred_black = L.zero_robot_region(tm_i, x_pred)
            x_i_black = L.zero_robot_region(tm_i, x_i)
            p = M.psnr(
                jnp.clip(x_i_black, 0, 1), jnp.clip(x_pred_black, 0, 1)
            ).mean()
            s = M.ssim(x_i_black, x_pred_black).mean()
            step_metrics = {
                "recon_loss": recon,
                "robot_loss": L.robot_mse_criterion(x_pred, x_i, tm_i),
                "world_loss": L.world_mse_criterion(x_pred, x_i, tm_i),
                "psnr": p,
                "ssim": s,
            }
            next_prev = x_pred if autoregressive else x_i
            return next_prev, (step_metrics, x_pred)

        _, (per_step, preds) = jax.lax.scan(scan_step, x[0], (x[1:], tm[1:]))
        return per_step, preds

    return jax.jit(eval_step)


def make_eval_step(cfg: Config, autoregressive: bool = True):
    """Builds the jitted eval step over an n_eval window
    (reference: trainer.py:566-734).

    batch additionally carries "pred_masks" — the model-input masks (true
    masks, or robot-model predictions on the finetune path; trainer.py:549-550).
    Metrics (psnr/ssim/robot/world) always use the *true* masks.

    Returns per-step stacked metrics (n_eval-1, ...); callers average and
    implement best-of-N sample selection (trainer.py:552-563).
    """
    dtype = _compute_dtype(cfg)
    is_svg = is_stochastic(cfg)

    def eval_step(params, bn_state, batch, rng):
        x = batch["images"]
        true_masks = batch["masks"]
        masks = batch.get("pred_masks", batch["masks"])
        states = batch["states"]
        actions = batch["actions"]
        heatmaps = batch.get("heatmaps")
        B = x.shape[1]
        n = cfg.n_eval

        carry0 = {
            "model": get_model(cfg).init_carry(cfg, B, dtype),
            "skip": skip_zeros(cfg, B, dtype),
            "x_prev": x[0],
            "rng": rng,
        }
        xs = {
            "x_j": x[:-1], "x_i": x[1:],
            "m_j": masks[:-1], "m_i": masks[1:],
            "tm_i": true_masks[1:],
            "r_j": states[:-1], "r_i": states[1:],
            "a_j": actions,
            "idx": jnp.arange(1, n),
        }
        if heatmaps is not None:
            xs["hm_j"], xs["hm_i"] = heatmaps[:-1], heatmaps[1:]

        def scan_step(carry, inp):
            i = inp["idx"]
            rng, rng_model = jax.random.split(carry["rng"])
            if autoregressive:
                x_j = jnp.where(i <= 1, inp["x_j"], carry["x_prev"])
            else:
                x_j = inp["x_j"]
            m_j, m_i, tm_i = inp["m_j"], inp["m_i"], inp["tm_i"]
            r_j, r_i = inp["r_j"], inp["r_i"]
            hm_j, hm_i = inp.get("hm_j"), inp.get("hm_i")
            x_i = inp["x_i"]

            x_j_black, x_i_black = x_j, x_i
            if cfg.dontcare:
                x_j_black = L.zero_robot_region(m_j, x_j)
                x_i_black = L.zero_robot_region(m_i, x_i)

            m_in, r_in, hm_in = _conditioning(cfg, m_j, m_i, r_j, r_i, hm_j, hm_i, False)
            next_inputs = (
                _next_conditioning(cfg, x_i_black, m_i, r_i, hm_i) if is_svg else None
            )
            out, model_carry, _ = _model_step(
                cfg, params, bn_state, carry["model"], carry["skip"],
                use_curr_skip=(i <= 1) if not cfg.last_frame_skip else None,
                x_j=x_j_black, m_in=m_in, r_in=r_in, hm_in=hm_in, a_j=inp["a_j"],
                rng=rng_model, next_inputs=next_inputs, train=False,
                force_use_prior=True, sample_mean=cfg.sample_mean,
                context_image=x[cfg.n_past - 1],
            )
            x_pred = model_composite(cfg, out["x_pred"], x_j).astype(jnp.float32)
            new_skip = jax.tree_util.tree_map(
                lambda c, s: jnp.where(i <= cfg.n_past, c, s),
                out["curr_skip"], carry["skip"],
            )

            # metrics vs true masks (trainer.py:677-697)
            recon = _recon_loss(cfg, x_pred, x_i, tm_i)
            x_pred_black = L.zero_robot_region(tm_i, x_pred)
            x_i_blackt = L.zero_robot_region(tm_i, x_i)
            p = M.psnr(
                jnp.clip(x_i_blackt, 0, 1), jnp.clip(x_pred_black, 0, 1)
            ).mean()
            s = M.ssim(x_i_blackt, x_pred_black).mean()
            step_metrics = {
                "recon_loss": recon,
                "robot_loss": L.robot_mse_criterion(x_pred, x_i, tm_i),
                "world_loss": L.world_mse_criterion(x_pred, x_i, tm_i),
                "psnr": p,
                "ssim": s,
            }
            if is_svg:
                step_metrics["kld"] = L.kl_criterion(
                    out["mu"], out["logvar"], out["mu_p"], out["logvar_p"], B
                )

            new_carry = {
                "model": model_carry,
                "skip": new_skip,
                "x_prev": x_pred,
                "rng": rng,
            }
            return new_carry, (step_metrics, x_pred)

        _, (per_step, preds) = jax.lax.scan(scan_step, carry0, xs)
        return per_step, preds

    return jax.jit(eval_step)
