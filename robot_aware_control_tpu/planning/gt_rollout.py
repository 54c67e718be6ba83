"""Ground-truth-physics CEM rollouts, batched on device.

The reference rolls candidate action sequences through the real simulator
serially (set_flattened_state + env.step per candidate,
reference: src/cem/pick/trajectory_sampler.py:61-167,
src/cem/mujoco/trajectory_sampler.py:132-316 — including a multiprocessing
pool noted as "not faster"). TPU-native redesign: the environment physics
is a pure function (envs/base.py:physics_step), so N candidates x T steps
run as `vmap(scan(physics_step))` in ONE device program, with scene
rendering and robot-aware costs fused in. DemoCEMPolicy's env-vs-model
`compare_optimal_actions` debugging (reference: src/cem/mujoco/demo_cem.py:
46-99) is reproduced on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.envs.base import SimState, physics_step
from robot_aware_control_tpu.planning.cem import CEMPolicy, PickCEMPolicy, PushCEMPolicy
from robot_aware_control_tpu.planning.cost import RobotWorldCost
from robot_aware_control_tpu.training.plot import save_gif
from robot_aware_control_tpu.utils.state import DemoGoalState, State


class GTRolloutEngine:
    """Traceable gt-physics rollout+cost core for an env class."""

    def __init__(self, cfg: Config, env):
        self.cfg = cfg
        self.env = env
        self.cost = RobotWorldCost(cfg)
        self._obj_half = np.full(env.num_objects, env.obj_half, np.float32)
        self._colors = env._colors
        self._pick = env.pick

    def _render(self, state: SimState):
        return self.env.renderer.render_scene(
            state.qpos, state.obj_pos, self._obj_half, self._colors
        )

    def __call__(self, state0: SimState, actions, goal_imgs, goal_masks,
                 goal_states=None, ret_obs: bool = False):
        """state0: SimState pytree (unbatched); actions (N, T, A);
        goal_imgs (T, H, W, 3); goal_masks (T, H, W, 1) or None;
        goal_states (T, 5) raw demo eef states or None — with
        robot_cost_weight != 0 a per-step eef cost is added exactly as the
        reference pick sampler does (pick/trajectory_sampler.py:104-126).
        Returns sum_cost (N,) [and obs (T, N, H, W, 3)]."""
        cfg = self.cfg
        N, T = actions.shape[0], actions.shape[1]
        step = functools.partial(
            physics_step, pick=self._pick, obj_half=self.env.obj_half
        )

        def one_candidate(acts):
            def body(s, a):
                s2 = step(s, a)
                return s2, s2
            _, traj = jax.lax.scan(body, state0, acts)
            return traj  # SimState with leading T dim

        trajs = jax.vmap(one_candidate)(actions)  # (N, T, ...)
        # render all N*T frames in one batched call
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((N * T,) + x.shape[2:]), trajs
        )
        imgs, masks = self._render(flat)
        imgs = imgs.reshape((N, T) + imgs.shape[1:])
        masks = masks.reshape((N, T) + masks.shape[1:])

        goal_imgs_b = goal_imgs[None]  # broadcast over N
        gm = goal_masks if goal_masks is not None else jnp.zeros_like(masks[:1, 0])
        use_robot_cost = cfg.robot_cost_weight != 0 and goal_states is not None
        if use_robot_cost:
            eef = trajs.eef  # (N, T, 3) raw world positions
            pad = jnp.zeros(eef.shape[:-1] + (2,), eef.dtype)
            states_raw = jnp.concatenate([eef, pad], -1)
        rewards = []
        # vectorized over N per step; T is small (<=horizon)
        for t in range(T):
            rewards.append(self.cost(
                imgs[:, t], goal_imgs[t],
                curr_mask=masks[:, t],
                goal_mask=goal_masks[t] if goal_masks is not None else gm[0],
                curr_state=states_raw[:, t] if use_robot_cost else None,
                goal_state=goal_states[t] if use_robot_cost else None,
                # --unblur_timestep: last steps score unblurred (static
                # here — the loop is python-unrolled over T)
                blur=bool(t < T - cfg.unblur_timestep),
            ))
        rewards = jnp.stack(rewards)  # (T, N)
        sum_cost = rewards[-1] if cfg.sparse_cost else jnp.sum(rewards, 0)
        if ret_obs:
            return sum_cost, jnp.moveaxis(imgs, 0, 1)
        return sum_cost


class _GTMixin:
    """Replaces the learned-model engine with gt physics inside the CEM
    fori_loop. The jitted plan takes the current flattened env state."""

    def _init_gt(self, cfg, env):
        self.env = env
        self.gt_engine = GTRolloutEngine(cfg, env)
        self._plan_gt = jax.jit(self._build_gt_plan())

    def _build_gt_plan(self):
        N, K = self.num_candidates, self.topk

        def plan(state0, goal_imgs, goal_masks, goal_states, rng, mean0,
                 std0):
            def body(i, carry):
                rng, mean, std = carry
                rng, k_s = jax.random.split(rng)
                acts = mean[None] + std[None] * jax.random.normal(
                    k_s, (N,) + mean.shape, jnp.float32
                )
                if self.zero_candidate:
                    zeroed = acts.at[-1].set(0.0)
                    acts = jnp.where(i == 0, zeroed, acts)
                acts = self.clamp(acts)
                padded = self.pad(acts)
                sum_cost = self.gt_engine(state0, padded, goal_imgs,
                                          goal_masks, goal_states=goal_states)
                _, top_idx = jax.lax.top_k(sum_cost, K)
                top_act = acts[top_idx]
                return (rng, jnp.mean(top_act, 0),
                        jnp.maximum(jnp.std(top_act, 0, ddof=1), 1e-3))

            _, mean, _ = jax.lax.fori_loop(0, self.opt_iter, body,
                                           (rng, mean0, std0))
            return mean

        return plan

    def get_action(self, start: State, goal: DemoGoalState, ep_num=0, step=0,
                   opt_traj=None, rng=None):
        T = self.horizon
        goal_imgs, goal_masks, goal_states = self.traj_sampler.prepare_goals(
            goal, T - 1
        )
        if rng is None:
            rng = jax.random.PRNGKey(self.cfg.seed + 7919 * ep_num + step)
        mean0, std0 = self.init_mean_std(T, opt_traj)
        mean = self._plan_gt(
            self.env.state, jnp.asarray(goal_imgs),
            None if goal_masks is None else jnp.asarray(goal_masks),
            None if goal_states is None else jnp.asarray(goal_states),
            rng, mean0, std0,
        )
        return np.asarray(mean)


class GTCEMPolicy(_GTMixin, CEMPolicy):
    def __init__(self, cfg, env, params=None, bn=None, **kw):
        super().__init__(cfg, params, bn, **kw)
        self._init_gt(cfg, env)


class GTPushCEMPolicy(_GTMixin, PushCEMPolicy):
    def __init__(self, cfg, env, params=None, bn=None, **kw):
        super().__init__(cfg, params, bn, **kw)
        self._init_gt(cfg, env)


class GTPickCEMPolicy(_GTMixin, PickCEMPolicy):
    def __init__(self, cfg, env, params=None, bn=None, **kw):
        super().__init__(cfg, params, bn, **kw)
        self._init_gt(cfg, env)


class DemoCEMPolicy:
    """Env-or-model physics dispatch + env-vs-model debugging
    (reference: src/cem/mujoco/demo_cem.py:16-139)."""

    def __init__(self, cfg: Config, env, params=None, bn=None,
                 policy_cls=CEMPolicy, gt_policy_cls=GTCEMPolicy):
        self.cfg = cfg
        self.env = env
        self.use_env = cfg.use_env_dynamics
        if self.use_env:
            self.policy = gt_policy_cls(cfg, env, params, bn)
        else:
            assert params is not None, "learned physics needs model params"
            self.policy = policy_cls(cfg, params, bn)

    def get_action(self, start, goal, ep_num=0, step=0, opt_traj=None):
        return self.policy.get_action(start, goal, ep_num, step, opt_traj)

    def compare_optimal_actions(self, actions, start: State,
                                goal: DemoGoalState, gif_path: str):
        """Roll the SAME actions through the real env and (if available)
        the learned model; save side-by-side gif
        (reference: demo_cem.py:46-99)."""
        env = self.env
        saved = env.get_flattened_state()
        env_frames = []
        acts = np.asarray(actions, np.float32)
        for a in acts:
            obs, _, _, _ = env.step(a)
            env_frames.append(obs["observation"])
        env.set_flattened_state(saved)

        rows = [np.concatenate(env_frames, 1)]
        if getattr(self.policy, "params", None) is not None and not self.use_env:
            out = self.policy.traj_sampler.generate_model_rollouts(
                acts[None], start, goal, ret_obs=True
            )
            model_frames = list(out["obs"][0])
            rows.append(np.concatenate(model_frames, 1))
        goal_img = np.asarray(goal.imgs[-1], np.float32)
        if goal_img.max() > 1.5:
            goal_img = goal_img / 255.0
        rows.append(np.concatenate([goal_img] * len(env_frames), 1))
        save_gif(gif_path, [np.concatenate(rows, 0)], fps=1)
        return env_frames
