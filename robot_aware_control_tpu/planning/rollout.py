"""Batched model-rollout engine for CEM planning.

Redesign of the reference `TrajectorySampler.generate_model_rollouts`
(reference: src/cem/trajectory_sampler.py:36-199), which per CEM iteration
runs scalar IK + serial MuJoCo mask renders on the host
(trajectory_sampler.py:86-107) and then chunks the N candidates into
`candidates_batch_size` GPU micro-batches with a Python loop over the
horizon (:123-174). Here the ENTIRE rollout — eef integration, batched
analytic IK, capsule mask rendering, T model steps, compositing and cost —
is a single traced program:

  * candidates are the batch axis (no chunking; shard over the mesh's
    "data" axis for very large N),
  * the horizon is a `lax.scan`,
  * masks/states come from the pure-JAX robot model fused into the same
    graph (no host round-trip),
  * costs accumulate on device; one scalar array (N,) comes back.

Semantics preserved (trajectory_sampler.py:123-174):
  * thick masks for model input and cost (predict_batch(..., thick=True)),
  * robot-pixel blackout of the model input and the composited output when
    a dontcare loss / black_robot_input is active (:141-152),
  * goal indexing goal_idx = min(t, G-1) (:154-156),
  * sparse_cost only scores the final step (:166-169),
  * prior sampling with optional sample_mean (:148).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.norm import (
    LOCO_FRANKA_DIFF,
    LOCO_WX250S_DIFF,
    LOCOBOT_HIGH,
    LOCOBOT_LOW,
    denormalize,
    normalize,
)
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.models.common import composite as model_composite
from robot_aware_control_tpu.ops import losses as L
from robot_aware_control_tpu.planning.cost import RobotWorldCost
from robot_aware_control_tpu.robot import locobot_kinematics as lk
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer
from robot_aware_control_tpu.training.step import _conditioning, _model_step
from robot_aware_control_tpu.utils.state import DemoGoalState, State


def _needs_robot_model(cfg: Config) -> bool:
    """(reference: trajectory_sampler.py:28, 90)"""
    return (
        cfg.model_use_robot_state
        or cfg.model_use_mask
        or cfg.model_use_heatmap
        or cfg.black_robot_input
        or "dontcare" in cfg.reward_type
    )


class RolloutEngine:
    """Traceable rollout+cost core. Instantiate once per config; call inside
    jit (the CEM loop) or through `TrajectorySampler` for the host API."""

    def __init__(self, cfg: Config, camera_key: str = "locobot_c0",
                 push_height: float = lk.PUSH_HEIGHT,
                 default_pitch: float = lk.DEFAULT_PITCH,
                 default_roll: float = lk.DEFAULT_ROLL,
                 pick: bool = False):
        self.cfg = cfg
        # pick rollouts integrate full 3-D eef motion (reference steps
        # MuJoCo per candidate per step for this —
        # src/cem/pick/trajectory_sampler.py:253-266)
        self.pick = pick
        self.cost = RobotWorldCost(cfg)
        self.push_height = push_height
        self.default_pitch = default_pitch
        self.default_roll = default_roll
        self.low = jnp.asarray(LOCOBOT_LOW)
        self.high = jnp.asarray(LOCOBOT_HIGH)
        size = (cfg.image_height, cfg.image_width)
        # --cem_prediction_use_thick_mask (default True == the reference's
        # hardcoded thick=True, trajectory_sampler.py:107; see config.py)
        self._thick = bool(cfg.cem_prediction_use_thick_mask)
        self.renderer_thick = CapsuleMaskRenderer(
            size, camera_key, thick=self._thick, modified=cfg.modified
        )
        self.use_robot = _needs_robot_model(cfg)
        # control_franka / control_wx250s plan with the robot's OWN measured
        # chain + mask env instead of the locobot renderer (reference:
        # trajectory_sampler.py:27-33 picks FrankaAnalyticalModel /
        # WX250sAnalyticalModel, whose mask envs load the franka/wx250s
        # MJCFs — src/dataset/franka/franka_model.py:23,
        # src/dataset/wx250s/wx250s_model.py:23). States stay in the
        # locobot frame for normalization (trajectory_sampler.py:94-98).
        self.qpos_dim = 5
        self.chain_robot = {
            "control_franka": "franka", "control_wx250s": "wx250s"
        }.get(cfg.experiment)
        if self.chain_robot is not None and not pick:
            from robot_aware_control_tpu.robot.kinematic_chain import (
                ChainMaskEnv,
            )

            shift = (LOCO_FRANKA_DIFF if self.chain_robot == "franka"
                     else LOCO_WX250S_DIFF)
            self.chain_env = ChainMaskEnv(
                self.chain_robot, image_size=size, thick=self._thick
            )
            self.chain = self.chain_env.chain
            self.chain_shift = jnp.asarray(shift, jnp.float32)
            self.qpos_dim = self.chain.dof
        else:
            self.chain_robot = None
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # the pallas mask kernel is ~2x the fused-jnp path on TPU
        # (ops/pallas_kernels.py); fall back to jnp elsewhere
        from robot_aware_control_tpu.ops.pallas_kernels import on_tpu

        self._use_pallas = on_tpu()

    # ------------------------------------------------------------------
    def robot_trajectory(self, start_state_norm, start_qpos, actions_tna):
        """IK + mask render for all candidates/steps in one fused block
        (replaces reference trajectory_sampler.py:86-107).

        start_state_norm (5,), start_qpos (>=qpos_dim,), actions_tna
        (T, N, >=2). Returns (states_norm (T+1,N,rd),
        states_raw (T+1,N,5), masks (T+1,N,h,w,1))."""
        N = actions_tna.shape[1]
        start_raw = denormalize(start_state_norm, self.low, self.high)
        if self.chain_robot is not None:
            return self._chain_trajectory(start_raw, start_qpos, actions_tna)
        start_raw_n = jnp.broadcast_to(start_raw, (N,) + start_raw.shape)
        qpos_n = jnp.broadcast_to(
            start_qpos[:5], (N, 5)
        ).astype(jnp.float32)
        if self.pick:
            # pick actions are already env-unit eef deltas (x0.05 inside)
            states_raw, qpos = lk.integrate_pick_actions(
                start_raw_n, qpos_n, actions_tna,
                pitch=self.default_pitch, roll=self.default_roll,
            )
        else:
            # env-unit actions -> metric eef displacements (config.py docs)
            planar = actions_tna[..., :2] * self.cfg.eef_action_scale
            states_raw, qpos = lk.integrate_planar_actions(
                start_raw_n, qpos_n, planar,
                push_height=self.push_height, pitch=self.default_pitch,
                roll=self.default_roll,
            )
        if self._use_pallas:
            masks = self.renderer_thick.render_pallas(qpos)
        else:
            masks = self.renderer_thick.render(qpos)
        states_norm = self._norm_to_robot_dim(states_raw)
        return states_norm, states_raw, masks

    def _norm_to_robot_dim(self, states_raw):
        states_norm = normalize(states_raw, self.low[None], self.high[None])
        # pad/truncate to the model's robot_dim, mirroring the data layer
        # (reference: robonet_dataset.py:209-223 pads states to robot_dim)
        rd = self.cfg.robot_dim
        if states_norm.shape[-1] < rd:
            pad = jnp.zeros(states_norm.shape[:-1] + (rd - states_norm.shape[-1],),
                            states_norm.dtype)
            states_norm = jnp.concatenate([states_norm, pad], -1)
        elif states_norm.shape[-1] > rd:
            states_norm = states_norm[..., :rd]
        return states_norm

    def _chain_trajectory(self, start_raw, start_qpos, actions_tna):
        """franka/wx250s rollout block: planar eef integration in the
        locobot frame (model/normalization frame, reference:
        trajectory_sampler.py:94-98), warm-started chain DLS IK and the
        measured chain mask env in the robot's NATIVE frame (reference
        analog: franka_model.py/wx250s_model.py predict_batch driving
        their MJCF mask envs). The frame shift is xy-only
        (LOCO_*_DIFF, src/utils/camera_calibration.py)."""
        N = actions_tna.shape[1]
        planar = actions_tna[..., :2] * self.cfg.eef_action_scale
        xy0 = jnp.broadcast_to(start_raw[:2], (N, 2))
        xy = jnp.concatenate(
            [xy0[None], xy0[None] + jnp.cumsum(planar, 0)], 0
        )  # (T+1, N, 2) locobot frame
        native_xy = xy - self.chain_shift
        targets = jnp.concatenate(
            [native_xy,
             jnp.full(native_xy.shape[:-1] + (1,), self.push_height,
                      jnp.float32)], -1,
        )
        q0 = jnp.broadcast_to(
            start_qpos[: self.chain.dof], (N, self.chain.dof)
        ).astype(jnp.float32)

        def step(q_prev, tgt):
            q, _ = self.chain.ik(tgt, q_prev, iters=20)
            return q, q

        _, qs = jax.lax.scan(step, q0, targets)  # (T+1, N, dof)
        masks = self.chain_env._render_impl(qs)
        z = jnp.full(xy.shape[:-1] + (1,), self.push_height, jnp.float32)
        pad = jnp.zeros(xy.shape[:-1] + (2,), jnp.float32)
        states_raw = jnp.concatenate([xy, z, pad], -1)  # locobot frame
        return self._norm_to_robot_dim(states_raw), states_raw, masks

    # ------------------------------------------------------------------
    def __call__(self, params, bn, start_img, start_state_norm, start_qpos,
                 actions, goal_imgs, goal_masks, rng, goal_states=None,
                 ret_obs: bool = False):
        """actions (N, T, A>=2); start_img (H,W,C) float [0,1];
        goal_imgs (T, H, W, C) pre-indexed per step (goal_idx = min(t, G-1));
        goal_masks (T, H, W, 1) or None; goal_states (T, 5) raw demo eef
        states or None — when given and robot_cost_weight != 0, a per-step
        robot-state cost is added exactly as the reference pick sampler does
        (src/cem/pick/trajectory_sampler.py:267-285).

        Returns sum_cost (N,) [and obs (T,N,H,W,C) when ret_obs]."""
        cfg = self.cfg
        N, T = actions.shape[0], actions.shape[1]
        actions_tna = jnp.moveaxis(actions, 0, 1)  # (T, N, A)

        if self.use_robot:
            states, states_raw, masks = self.robot_trajectory(
                start_state_norm, start_qpos, actions_tna
            )
        else:
            states = jnp.zeros((T + 1, N, cfg.robot_dim), jnp.float32)
            states_raw = jnp.zeros((T + 1, N, 5), jnp.float32)
            masks = jnp.zeros(
                (T + 1, N, cfg.image_height, cfg.image_width, 1), jnp.float32
            )
        use_robot_cost = cfg.robot_cost_weight != 0 and goal_states is not None
        # heatmap conditioning from PREDICTED states (beyond the reference,
        # which plans with heatmap=None — trajectory_sampler.py:135)
        heatmaps = None
        if cfg.model_use_heatmap:
            heatmaps = self.renderer_thick.render_heatmaps(
                states_raw[..., :3]
            )  # (T+1, N, h, w, 1)

        # rollout images ride in the compute dtype; costs cast to f32
        curr_img = jnp.broadcast_to(
            start_img, (N,) + start_img.shape
        ).astype(self.dtype)

        model = get_model(cfg)
        carry0 = {
            "model": model.init_carry(cfg, N, self.dtype),
            "img": curr_img,
            "rng": rng,
        }
        xs = {
            "m_t": masks[:-1],
            "m_t1": masks[1:],
            "s_t": states[:-1],
            "s_t1": states[1:],
            "s_raw_t1": states_raw[1:],
            "a": actions_tna,
            "goal_img": goal_imgs,
            "goal_mask": (
                goal_masks
                if goal_masks is not None
                else jnp.zeros((T,) + start_img.shape[:-1] + (1,), jnp.float32)
            ),
            "goal_state": (
                jnp.asarray(goal_states, jnp.float32)
                if use_robot_cost
                else jnp.zeros((T, 5), jnp.float32)
            ),
        }
        if heatmaps is not None:
            xs["hm_t"] = heatmaps[:-1]
            xs["hm_t1"] = heatmaps[1:]
        if cfg.reward_type == "inpaint-blur":
            # --unblur_timestep: the last `unblur_timestep` rollout steps
            # score UNBLURRED (scaled by unblur_cost_scale) — the switch
            # the reference documents at config/__init__.py:66 but never
            # wires (see planning/cost.py InpaintBlurCost)
            n_steps = xs["a"].shape[0]
            xs["blur_flag"] = (
                jnp.arange(n_steps) < n_steps - cfg.unblur_timestep
            )

        blackout = cfg.dontcare  # dontcare recon loss or black_robot_input

        def scan_step(carry, inp):
            rng, rng_model = jax.random.split(carry["rng"])
            curr = carry["img"]
            model_in = (
                L.zero_robot_region(inp["m_t"], curr) if blackout else curr
            )
            m_in, r_in, hm_in = _conditioning(
                cfg, inp["m_t"], inp["m_t1"], inp["s_t"], inp["s_t1"],
                inp.get("hm_t"), inp.get("hm_t1"), False,
            )
            out, model_carry, _ = _model_step(
                cfg, params, bn, carry["model"], None,
                use_curr_skip=None, x_j=model_in, m_in=m_in, r_in=r_in,
                hm_in=hm_in, a_j=inp["a"], rng=rng_model, next_inputs=None,
                train=False, sample_mean=cfg.sample_mean,
            )
            # Deviation from the reference sampler (trajectory_sampler.py:
            # 149-152), which composites with the BLACKED-OUT current image
            # and re-blacks the output — baking black arm shadows into the
            # rollout as fake world pixels. Training composites with the
            # un-blacked frame (trainer.py:406-407), so we do the same here;
            # the don't-care cost already excludes the robot region.
            next_img = model_composite(cfg, out["x_pred"], curr).astype(self.dtype)
            reward = self.cost(
                next_img, inp["goal_img"],
                curr_mask=inp["m_t1"], goal_mask=inp["goal_mask"],
                curr_state=inp["s_raw_t1"] if use_robot_cost else None,
                goal_state=inp["goal_state"] if use_robot_cost else None,
                blur=inp.get("blur_flag", True),
            )
            new_carry = {"model": model_carry, "img": next_img, "rng": rng}
            emit = (reward, next_img) if ret_obs else reward
            return new_carry, emit

        _, emitted = jax.lax.scan(scan_step, carry0, xs)
        if ret_obs:
            rewards, obs = emitted
        else:
            rewards = emitted
        sum_cost = rewards[-1] if cfg.sparse_cost else jnp.sum(rewards, axis=0)
        if ret_obs:
            return sum_cost, obs
        return sum_cost


class TrajectorySampler:
    """Host-facing API with the reference's contract
    (reference: src/cem/trajectory_sampler.py:15-199).

    generate_model_rollouts(action_sequences, start, goal) -> dict with
    "sum_cost" (N,), and "topk_idx"/"obs" when ret_obs.
    """

    def __init__(self, cfg: Config, params, bn, **engine_kw):
        self.cfg = cfg
        # --plan_quantize int8 (ops/quant.py; idempotent if the caller —
        # e.g. CEMPolicy — already transformed the tree)
        from robot_aware_control_tpu.ops import quant
        self.params = quant.maybe_quantize_plan_params(cfg, params)
        self.bn = bn
        self.engine = RolloutEngine(cfg, **engine_kw)
        self._jit_cost = jax.jit(
            functools.partial(self.engine.__call__, ret_obs=False)
        )
        self._jit_obs = jax.jit(
            functools.partial(self.engine.__call__, ret_obs=True)
        )

    def _frame_shift(self, state):
        """franka/wx250s eef states shift into the locobot frame
        (reference: trajectory_sampler.py:95-99)."""
        state = np.asarray(state, np.float32).copy()
        if self.cfg.experiment == "control_franka":
            state[:2] += LOCO_FRANKA_DIFF
        elif self.cfg.experiment == "control_wx250s":
            state[:2] += LOCO_WX250S_DIFF
        return state

    def prepare_goals(self, goal: DemoGoalState, T: int):
        """Per-step goal arrays with goal_idx = min(t, G-1)
        (reference: trajectory_sampler.py:154-158; pick adds per-step goal
        robot states, pick/trajectory_sampler.py:280-282)."""
        imgs = [np.asarray(g, np.float32) for g in goal.imgs]
        imgs = [g / 255.0 if g.max() > 1.5 else g for g in imgs]
        idx = np.minimum(np.arange(T), len(imgs) - 1)
        goal_imgs = np.stack([imgs[i] for i in idx])
        goal_masks = None
        if goal.masks is not None:
            ms = [np.asarray(m, np.float32).reshape(imgs[0].shape[:2] + (1,))
                  for m in goal.masks]
            goal_masks = np.stack([ms[i] for i in idx])
        goal_states = None
        if goal.states is not None:
            sts = []
            for s in goal.states:
                s = np.asarray(s, np.float32).ravel()[:5]
                sts.append(np.pad(s, (0, 5 - len(s))))
            goal_states = np.stack([sts[i] for i in idx])
        return goal_imgs, goal_masks, goal_states

    def generate_model_rollouts(self, action_sequences, start: State,
                                goal: DemoGoalState, opt_traj=None,
                                ret_obs: bool = False,
                                suppress_print: bool = True, rng=None):
        cfg = self.cfg
        acts = np.asarray(action_sequences, np.float32)
        if opt_traj is not None:
            opt = np.asarray(opt_traj, np.float32)
            if opt.shape[-1] < acts.shape[-1]:
                opt = np.pad(opt, ((0, 0), (0, acts.shape[-1] - opt.shape[-1])))
            acts = np.concatenate([acts, opt[None]], 0)
        N, T = acts.shape[0], acts.shape[1]

        img = np.asarray(start.img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        state_raw = self._frame_shift(start.state)
        state_norm = normalize(state_raw, LOCOBOT_LOW[: len(state_raw)],
                               LOCOBOT_HIGH[: len(state_raw)])
        qd = self.engine.qpos_dim
        qpos = np.zeros(qd, np.float32)
        if start.qpos is not None:
            q = np.asarray(start.qpos, np.float32).ravel()
            qpos[: min(qd, len(q))] = q[:qd]
        goal_imgs, goal_masks, goal_states = self.prepare_goals(goal, T)
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed)

        fn = self._jit_obs if ret_obs else self._jit_cost
        result = fn(self.params, self.bn, jnp.asarray(img),
                    jnp.asarray(state_norm), jnp.asarray(qpos),
                    jnp.asarray(acts), jnp.asarray(goal_imgs),
                    None if goal_masks is None else jnp.asarray(goal_masks),
                    rng,
                    None if goal_states is None else jnp.asarray(goal_states))

        rollouts = {}
        if ret_obs:
            sum_cost, obs = result
            obs = np.moveaxis(np.asarray(obs), 0, 1)  # (N, T, H, W, C)
        else:
            sum_cost = result
        sum_cost = np.asarray(sum_cost)
        if opt_traj is not None:
            rollouts["optimal_sum_cost"] = sum_cost[-1]
            if ret_obs:
                rollouts["optimal_obs"] = obs[-1]
            sum_cost = sum_cost[:-1]
        rollouts["sum_cost"] = sum_cost
        if ret_obs:
            topk_idx = np.argsort(sum_cost)[-cfg.topk:]
            rollouts["topk_idx"] = topk_idx
            rollouts["obs"] = obs[topk_idx]
        return rollouts
