"""CEM action optimization, fully on device.

The reference CEM (reference: src/cem/cem.py:56-111, pick variant
src/cem/pick/cem.py:50-112, push variant src/cem/push/cem.py:50-104) runs
`opt_iter` Python iterations, each of which samples actions on the host,
ships them to the GPU in `candidates_batch_size` chunks, syncs costs back
to numpy, and refits on the CPU. TPU-native redesign: the ENTIRE optimizer
— sampling, clamping, rollout (incl. robot IK + mask rendering), top-k and
refit — is one `lax.fori_loop` inside one jitted program. One dispatch per
`get_action`, zero host/device round-trips.

Preserved semantics:
  * mean/std over (horizon-1, A); init std = cem_init_std (cem.py:74-75),
  * a "do nothing" candidate injected at iteration 0 (cem.py:82-83;
    locobot variant only),
  * per-variant clamps: locobot +-0.05 then zero-pad to 5-D (cem.py:85-86);
    push +-1, pad (push/cem.py:80-81); pick +-1 with gripper in [-0.01, 0],
    mean[-1]=-0.005, std[0]=0.2, std[-1]=0.005 (pick/cem.py:66-89),
  * refit: mean/std of the top-K rewards, std floored at 1e-3 with
    torch-matching unbiased std (cem.py:96-104),
  * returns the final mean plan (cem.py:111).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data.norm import LOCOBOT_HIGH, LOCOBOT_LOW, normalize
from robot_aware_control_tpu.ops import quant
from robot_aware_control_tpu.planning.rollout import RolloutEngine, TrajectorySampler
from robot_aware_control_tpu.utils.state import DemoGoalState, State


class CEMPolicy:
    """Locobot/real-robot planar CEM (reference: src/cem/cem.py:14-111)."""

    action_dim = 2
    zero_candidate = True
    engine_pick = False

    def __init__(self, cfg: Config, params, bn, horizon=None, opt_iter=None,
                 action_candidates=None, topk=None, init_std=None, mesh=None,
                 **engine_kw):
        self.cfg = cfg
        # sampled planar actions are zero-padded to the model's action space
        # (reference: cem.py:86 pads 2-D planar actions to 5-D robonet actions)
        self.pad_to = cfg.action_dim
        # --plan_quantize int8: rollout convs run on the int8 MXU path
        # (ops/quant.py; planning is forward-only)
        self.params = quant.maybe_quantize_plan_params(cfg, params)
        self.bn = bn
        self.horizon = horizon or cfg.horizon
        self.opt_iter = opt_iter or cfg.opt_iter
        self.num_candidates = action_candidates or cfg.action_candidates
        self.topk = topk or cfg.topk
        self.init_std = init_std if init_std is not None else cfg.cem_init_std
        # optional device mesh: candidates shard over the "data" axis so very
        # large K spreads across chips — the TPU answer to the reference's
        # candidates_batch_size GPU chunking (trajectory_sampler.py:72,123-127)
        self.mesh = mesh
        if mesh is not None:
            n_dev = mesh.devices.size
            if self.num_candidates % n_dev:
                self.num_candidates = -(-self.num_candidates // n_dev) * n_dev
        engine_kw.setdefault("pick", self.engine_pick)
        self.engine = RolloutEngine(cfg, **engine_kw)
        self._engine_kw = dict(engine_kw)
        self.traj_sampler = TrajectorySampler(cfg, params, bn, **engine_kw)
        self._plan = jax.jit(self._build_plan())
        # per-(goal-structure) vmapped plan programs (get_action_batched)
        self._plan_batched: dict = {}

    # --- variant hooks -------------------------------------------------
    def init_mean_std(self, T: int, opt_traj=None):
        """(reference: cem.py:74-75). With --demo_cost and a demo action
        prefix available, the mean is seeded from the demo (the reference
        contemplates exactly this: pick/cem.py:68-69 commented seeding) —
        crucial for long-horizon manipulation like pick-and-place."""
        mean = jnp.zeros((T - 1, self.action_dim), jnp.float32)
        std = jnp.full((T - 1, self.action_dim), self.init_std, jnp.float32)
        if opt_traj is not None and self.cfg.demo_cost:
            opt = jnp.asarray(opt_traj, jnp.float32)[: T - 1, : self.action_dim]
            mean = mean.at[: opt.shape[0]].set(opt)
        return mean, std

    def clamp(self, acts):
        """(reference: cem.py:85)"""
        return jnp.clip(acts, -0.05, 0.05)

    def pad(self, acts):
        """Zero-pad sampled planar actions to the model's 5-D action space
        (reference: cem.py:86)."""
        N, Tm1, A = acts.shape
        if A >= self.pad_to:
            return acts
        return jnp.concatenate(
            [acts, jnp.zeros((N, Tm1, self.pad_to - A), acts.dtype)], -1
        )

    # --- the on-device optimizer ---------------------------------------
    def _build_plan(self, engine=None):
        cfg = self.cfg
        engine = engine if engine is not None else self.engine
        N, K = self.num_candidates, self.topk
        T = self.horizon

        def plan(params, bn, start_img, start_state_norm, start_qpos,
                 goal_imgs, goal_masks, goal_states, rng, mean0, std0):
            def body(i, carry):
                rng, mean, std = carry
                rng, k_s, k_r = jax.random.split(rng, 3)
                acts = mean[None] + std[None] * jax.random.normal(
                    k_s, (N,) + mean.shape, jnp.float32
                )
                if self.zero_candidate:
                    # "do nothing" candidate at iteration 0 (cem.py:82-83)
                    zeroed = acts.at[-1].set(0.0)
                    acts = jnp.where(i == 0, zeroed, acts)
                acts = self.clamp(acts)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    acts = jax.lax.with_sharding_constraint(
                        acts, NamedSharding(self.mesh, P("data"))
                    )
                padded = self.pad(acts)

                def eval_all(p, key):
                    return engine(
                        params, bn, start_img, start_state_norm, start_qpos,
                        p, goal_imgs, goal_masks, key,
                        goal_states=goal_states,
                    )

                # --candidates_batch_size: evaluate candidates in bounded
                # chunks (lax.map is sequential, so peak memory is one
                # chunk's rollout). The reference chunks for the same reason
                # (trajectory_sampler.py:72,123-127); on a device mesh the
                # candidates shard over chips instead, so chunking only
                # applies single-device.
                cbs = int(cfg.candidates_batch_size or N)
                chunk = min(cbs, N)
                while N % chunk:
                    chunk -= 1
                if chunk < N and self.mesh is None:
                    padded_c = padded.reshape((N // chunk, chunk)
                                              + padded.shape[1:])
                    keys = jax.vmap(
                        lambda ci: jax.random.fold_in(k_r, ci)
                    )(jnp.arange(N // chunk))
                    sum_cost = jax.lax.map(
                        lambda pc: eval_all(pc[0], pc[1]), (padded_c, keys)
                    ).reshape(N)
                else:
                    sum_cost = eval_all(padded, k_r)
                _, top_idx = jax.lax.top_k(sum_cost, K)
                top_act = acts[top_idx]
                new_mean = jnp.mean(top_act, axis=0)
                new_std = jnp.maximum(jnp.std(top_act, axis=0, ddof=1), 1e-3)
                return (rng, new_mean, new_std)

            _, mean, _ = jax.lax.fori_loop(
                0, self.opt_iter, body, (rng, mean0, std0)
            )
            return mean

        return plan

    # --- host API -------------------------------------------------------
    def _host_prep(self, start: State, goal: DemoGoalState, ep_num=0,
                   step=0, opt_traj=None, rng=None):
        """Host-side request preparation shared by the single and batched
        entry points: normalization, frame shift, goal padding, seeding."""
        cfg = self.cfg
        T = self.horizon
        img = np.asarray(start.img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        state_raw = self.traj_sampler._frame_shift(start.state)
        state_norm = normalize(
            state_raw, LOCOBOT_LOW[: len(state_raw)], LOCOBOT_HIGH[: len(state_raw)]
        )
        # qpos dimensionality follows the experiment's robot model
        # (locobot 5; franka 7 / wx250s 6 via their measured chains —
        # reference analog: trajectory_sampler.py:27-33)
        qd = self.engine.qpos_dim
        qpos = np.zeros(qd, np.float32)
        if start.qpos is not None:
            q = np.asarray(start.qpos, np.float32).ravel()
            qpos[: min(qd, len(q))] = q[:qd]
        goal_imgs, goal_masks, goal_states = self.traj_sampler.prepare_goals(
            goal, T - 1
        )
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed + 7919 * ep_num + step)
        mean0, std0 = self.init_mean_std(T, opt_traj)
        return (jnp.asarray(img), jnp.asarray(state_norm), jnp.asarray(qpos),
                jnp.asarray(goal_imgs),
                None if goal_masks is None else jnp.asarray(goal_masks),
                None if goal_states is None else jnp.asarray(goal_states),
                rng, mean0, std0)

    def get_action(self, start: State, goal: DemoGoalState, ep_num=0, step=0,
                   opt_traj=None, rng=None):
        """Returns the mean plan (horizon-1, action_dim) as numpy
        (reference: cem.py:56-111)."""
        prep = self._host_prep(start, goal, ep_num, step, opt_traj, rng)
        mean = np.asarray(self._plan(self.params, self.bn, *prep))
        if self.cfg.debug_cem:
            self._plot_rollouts(mean, start, goal, ep_num, step)
        return mean

    def get_action_batched(self, starts, goals, ep_nums=None, steps=None,
                           opt_trajs=None):
        """Plan R independent requests in ONE vmapped device program —
        the serving idiom for multiple robots sharing one planner
        (control/plan_server.py). Returns (R, horizon-1, action_dim).

        Each request gets exactly the seeding/normalization of
        get_action, so result[i] is bit-identical to
        get_action(starts[i], goals[i], ep_nums[i], steps[i]) when both
        trace the same cells (tests/test_plan_server.py::
        test_batched_matches_single). With --fused_lstm the single path
        uses the Pallas cell while the batched program must fall back to
        the XLA cells (see below) — so a consistency-critical serving
        deployment either disables batching or plans with the XLA cells
        on both paths; PlanServer enforces the latter by default
        (control/plan_server.py). No reference analogue (the reference
        plans one request per GPU process, src/cem/cem.py:56)."""
        R = len(starts)
        ep_nums = ep_nums if ep_nums is not None else [0] * R
        steps = steps if steps is not None else [0] * R
        opt_trajs = opt_trajs if opt_trajs is not None else [None] * R
        preps = [self._host_prep(s, g, e, t, o) for s, g, e, t, o
                 in zip(starts, goals, ep_nums, steps, opt_trajs)]
        has = [p is not None for p in preps[0]]
        if not all([pp is not None for pp in p] == has for p in preps):
            raise ValueError("batched requests must agree on goal masks/"
                             "states presence")
        # candidate sharding constraints inside the plan body don't
        # compose with an added vmap axis — mesh-sharded planners run
        # requests back to back instead
        if self.mesh is not None or R == 1:
            return np.stack([
                np.asarray(self._plan(self.params, self.bn, *p))
                for p in preps
            ])
        key = tuple(has)
        fn = self._plan_batched.get(key)
        if fn is None:
            engine = self.engine
            if self.cfg.fused_lstm:
                # the fused Pallas cell's scoped-VMEM footprint doesn't
                # admit the extra vmap axis (kernel stack OOM at R>=2 on
                # v5e); trace the batched program with the XLA cells
                engine = RolloutEngine(
                    self.cfg.replace(fused_lstm=False), **self._engine_kw)
            in_axes = (None, None) + tuple(0 if h else None for h in has)
            fn = jax.jit(jax.vmap(self._build_plan(engine), in_axes=in_axes))
            self._plan_batched[key] = fn
        # bucket the batch axis: pad to the next power of two by repeating
        # the last request, so sustained serving (arbitrary drained batch
        # sizes, control/plan_server.py:_plan_batch) compiles at most
        # log2(R_max) programs instead of one per distinct batch size
        r_pad = 1 << (R - 1).bit_length()
        if r_pad != R:
            preps = preps + [preps[-1]] * (r_pad - R)
        args = tuple(
            jnp.stack([p[i] for p in preps]) if has[i] else None
            for i in range(len(has))
        )
        return np.asarray(fn(self.params, self.bn, *args))[:R]

    def _plot_rollouts(self, plan, start, goal, ep_num, step):
        """Save a top-K rollout strip gif for the final plan
        (reference: cem.py:113-179 debug_cem plotting)."""
        import os

        from robot_aware_control_tpu.training.plot import save_gif

        acts = self.pad(jnp.asarray(plan, jnp.float32)[None])
        out = self.traj_sampler.generate_model_rollouts(
            np.asarray(acts), start, goal, ret_obs=True
        )
        obs = out["obs"][0]  # (T, H, W, C)
        goal_img = np.asarray(goal.imgs[-1], np.float32)
        if goal_img.max() > 1.5:
            goal_img = goal_img / 255.0
        frames = [np.concatenate([f, goal_img], axis=1) for f in obs]
        os.makedirs(self.cfg.log_dir, exist_ok=True)
        save_gif(
            os.path.join(self.cfg.log_dir,
                         f"debug_cem_ep{ep_num}_step{step}.gif"),
            frames, fps=2,
        )


class PushCEMPolicy(CEMPolicy):
    """LocobotPushEnv planar variant (reference: src/cem/push/cem.py:50-104):
    clamp +-1, no do-nothing candidate."""

    zero_candidate = False

    def clamp(self, acts):
        return jnp.clip(acts, -1.0, 1.0)


class PickCEMPolicy(CEMPolicy):
    """LocobotPickEnv 4-D (xyz + gripper) variant
    (reference: src/cem/pick/cem.py:50-112)."""

    action_dim = 4
    zero_candidate = False
    engine_pick = True

    def init_mean_std(self, T: int, opt_traj=None):
        """(reference: pick/cem.py:66-74: std=init_std with x-std 0.2,
        gripper mean -0.005 / std 0.005). When the mean is demo-seeded
        (--demo_cost + demo actions) exploration stays LOCAL around the
        seed — the reference's wide x-std is for unseeded search and
        knocks a seeded grasp plan off the demo choreography."""
        mean = jnp.zeros((T - 1, 4), jnp.float32)
        mean = mean.at[:, -1].set(-0.005)
        std = jnp.full((T - 1, 4), self.init_std, jnp.float32)
        seeded = opt_traj is not None and self.cfg.demo_cost
        # pick_wide_x_std ablates the std scheme only — the mean stays
        # demo-seeded either way (benchmarks/pick_std_ablation.py)
        local = seeded and not self.cfg.pick_wide_x_std
        if not local:
            std = std.at[:, 0].set(0.2)
        std = std.at[:, -1].set(0.005 if not local else self.init_std / 3)
        if seeded:
            opt = jnp.asarray(opt_traj, jnp.float32)[: T - 1, :4]
            mean = mean.at[: opt.shape[0]].set(opt)
        return mean, std

    def clamp(self, acts):
        acts = jnp.clip(acts, -1.0, 1.0)
        return acts.at[..., -1].set(jnp.clip(acts[..., -1], -0.01, 0.0))
