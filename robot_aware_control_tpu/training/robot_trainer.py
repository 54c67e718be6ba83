"""Learned robot-model training (JointPosPredictor + GripperStatePredictor).

Reference parity: `RobotPredictionTrainer` (reference:
src/prediction/joint_pos_trainer.py:36-633): trains the two delta-MLPs on
(qpos, eef, action) sequences with MSE on the deltas, evaluates by
autoregressive state rollout, and scores predicted masks against true masks
with IoU (the reference renders predicted qpos through MuJoCo mask envs,
joint_pos_trainer.py:245-326,561; here the capsule renderer runs the IoU
batch on device).

The whole train step (scan over the sequence, both MLPs, one Adam update)
is a single jitted program.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.models import robot_mlp
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.logger import RunLogger, make_log_folder


class JointPosDataset:
    """(qpos, eef-state, action) sequence dataset (reference:
    src/dataset/joint_pos_dataset.py:20-218). Synthetic fallback generates
    planar-push trajectories through the analytic kinematics so the trainer
    is hermetic."""

    def __init__(self, cfg: Config, num: int = 256, T: int = 8, seed: int = 0):
        from robot_aware_control_tpu.robot import locobot_kinematics as lk

        rng = np.random.RandomState(seed)
        starts = np.stack([
            rng.uniform(0.1, 0.4, num), rng.uniform(-0.2, 0.2, num),
            np.full(num, lk.PUSH_HEIGHT),
        ], -1).astype(np.float32)
        actions = rng.uniform(-0.04, 0.04, (T - 1, num, 2)).astype(np.float32)
        q0 = np.zeros((num, 5), np.float32)
        states, qpos = lk.integrate_planar_actions(
            jnp.asarray(starts), jnp.asarray(q0), jnp.asarray(actions)
        )
        self.states = np.asarray(states)[:, :, : cfg.robot_dim]
        self.qpos = np.asarray(qpos)[:, :, : cfg.robot_joint_dim]
        pad = cfg.action_dim - 2
        self.actions = np.pad(actions, [(0, 0), (0, 0), (0, pad)])
        self.num = num

    def batches(self, batch_size: int, seed: int = 0):
        rng = np.random.RandomState(seed)
        idx = rng.permutation(self.num)
        for i in range(0, self.num - batch_size + 1, batch_size):
            j = idx[i:i + batch_size]
            yield {
                "states": self.states[:, j],
                "qpos": self.qpos[:, j],
                "actions": self.actions[:, j],
            }


class RobotPredictionTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.log_dir = make_log_folder(cfg)
        self.logger = RunLogger(cfg, self.log_dir)
        keys = jax.random.split(jax.random.PRNGKey(cfg.seed), 2)
        self.joint_params = robot_mlp.joint_pos_predictor_init(keys[0], cfg)
        self.grip_params = robot_mlp.gripper_state_predictor_init(keys[1], cfg)
        self.tx = optax.adam(cfg.lr, b1=cfg.beta1)
        self.opt_state = self.tx.init((self.joint_params, self.grip_params))
        self._step = 0
        self.renderer = CapsuleMaskRenderer(
            (cfg.image_height, cfg.image_width), modified=cfg.modified
        )
        self._train_step = jax.jit(self._make_train_step())
        self._eval_rollout = jax.jit(self._make_eval_rollout())

    # ------------------------------------------------------------------
    def _make_train_step(self):
        tx = self.tx

        def loss_fn(params, batch):
            jp, gp = params
            q, s, a = batch["qpos"], batch["states"], batch["actions"]
            dq_pred = robot_mlp.joint_pos_predictor(jp, q[:-1], a)
            ds_pred = robot_mlp.gripper_state_predictor(gp, s[:-1], a)
            dq = q[1:] - q[:-1]
            ds = s[1:] - s[:-1]
            jl = jnp.mean((dq_pred - dq) ** 2)
            gl = jnp.mean((ds_pred - ds) ** 2)
            return jl + gl, {"joint_loss": jl, "gripper_loss": gl}

        def step(params, opt_state, batch):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return step

    def _make_eval_rollout(self):
        renderer = self.renderer

        def rollout(params, batch):
            """Autoregressive rollout + mask IoU vs true qpos
            (reference: joint_pos_trainer.py:245-326)."""
            jp, gp = params
            q, s, a = batch["qpos"], batch["states"], batch["actions"]

            def body(carry, at):
                qc, sc = carry
                q2 = qc + robot_mlp.joint_pos_predictor(jp, qc, at)
                s2 = sc + robot_mlp.gripper_state_predictor(gp, sc, at)
                return (q2, s2), (q2, s2)

            (_, _), (qq, ss) = jax.lax.scan(body, (q[0], s[0]), a)
            q_err = jnp.mean((qq - q[1:]) ** 2)
            s_err = jnp.mean((ss - s[1:]) ** 2)
            pred_masks = renderer.render(qq) > 0.5
            true_masks = renderer.render(q[1:]) > 0.5
            inter = jnp.sum(pred_masks & true_masks, (-3, -2, -1))
            union = jnp.sum(pred_masks | true_masks, (-3, -2, -1))
            iou = jnp.mean(inter / jnp.maximum(union, 1))
            return {"qpos_rollout_mse": q_err, "state_rollout_mse": s_err,
                    "mask_iou": iou}

        return rollout

    # ------------------------------------------------------------------
    def train(self, train_data: Optional[JointPosDataset] = None,
              test_data: Optional[JointPosDataset] = None):
        cfg = self.cfg
        train_data = train_data or JointPosDataset(cfg, seed=cfg.seed)
        test_data = test_data or JointPosDataset(cfg, num=64, seed=cfg.seed + 1)
        params = (self.joint_params, self.grip_params)
        for epoch in range(cfg.niter):
            agg = defaultdict(float)
            n = 0
            for batch in train_data.batches(cfg.batch_size, seed=epoch):
                dev = {k: jnp.asarray(v) for k, v in batch.items()}
                params, self.opt_state, metrics = self._train_step(
                    params, self.opt_state, dev
                )
                self._step += 1
                for k, v in metrics.items():
                    agg[k] += float(v)
                n += 1
            self.logger.scalars(
                {k: v / max(n, 1) for k, v in agg.items()}, self._step,
                prefix="robot/",
            )
            if (epoch + 1) % cfg.eval_interval == 0:
                ev = self.evaluate(params, test_data)
                self.logger.scalars(ev, self._step, prefix="robot_eval/")
                self.logger.info(
                    f"robot epoch {epoch}: "
                    + " ".join(f"{k}={v:.5f}" for k, v in ev.items())
                )
        self.joint_params, self.grip_params = params
        self.save()
        return params

    def evaluate(self, params, test_data: JointPosDataset):
        agg = defaultdict(float)
        n = 0
        for batch in test_data.batches(min(self.cfg.test_batch_size, 64)):
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            m = self._eval_rollout(params, dev)
            for k, v in m.items():
                agg[k] += float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in agg.items()}

    def save(self):
        """{joint_model, gripper_model} checkpoint (reference contract:
        trainer.py:839-844)."""
        path = ckpt.save_checkpoint(
            self.log_dir, self._step,
            {"joint_model": self.joint_params, "gripper_model": self.grip_params},
        )
        self.logger.info(f"saved robot model {path}")
        return path


def main(argv=None):
    from robot_aware_control_tpu.config import argparser

    cfg, _ = argparser(argv)
    RobotPredictionTrainer(cfg).train()


if __name__ == "__main__":
    main()
