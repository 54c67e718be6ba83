"""Demo-following visual-MPC episode runners.

Reference parity: `EpisodeRunner` (reference: src/mbrl/episode_runner.py:
25-296) and the push/pick variants (push_episode_runner.py:20-458,
pick_episode_runner.py:20-446): load a demonstration, then loop
  CEM plan -> execute `replan_every` actions -> cost-thresholded subgoal
  advance -> episode stats (goal_progress, push_progress, final_obj_dist)
until the demo is consumed or max_episode_length is hit.

The planning itself runs fully on device (planning/cem.py /
planning/gt_rollout.py); the runner is the thin host orchestration shell.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import List, Optional

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.envs import (
    ClutterPushEnv,
    LocobotPickEnv,
    LocobotPushEnv,
)
from robot_aware_control_tpu.planning.cem import (
    CEMPolicy,
    PickCEMPolicy,
    PushCEMPolicy,
)
from robot_aware_control_tpu.planning.cost import (
    RobotWorldCost,
    robot_l2_cost,
)
from robot_aware_control_tpu.planning.gt_rollout import (
    DemoCEMPolicy,
    GTCEMPolicy,
    GTPickCEMPolicy,
    GTPushCEMPolicy,
)
from robot_aware_control_tpu.training.logger import RunLogger, make_log_folder
from robot_aware_control_tpu.training.plot import save_gif
from robot_aware_control_tpu.utils.state import DemoGoalState, State


class EpisodeRunner:
    """Clutter-push runner (reference: episode_runner.py:25-296)."""

    env_cls = ClutterPushEnv
    policy_cls = CEMPolicy
    gt_policy_cls = GTCEMPolicy

    def __init__(self, cfg: Config, params=None, bn=None, translator=None):
        self.cfg = cfg
        self.log_dir = make_log_folder(cfg)
        self.logger = RunLogger(cfg, self.log_dir)
        self.env = self.env_cls(cfg, seed=cfg.seed)
        self.policy = DemoCEMPolicy(
            cfg, self.env, params, bn,
            policy_cls=self.policy_cls, gt_policy_cls=self.gt_policy_cls,
        )
        self.cost = RobotWorldCost(cfg)
        self._stats = defaultdict(list)
        # CycleGAN observation translation for cross-domain transfer
        # (reference: push_episode_runner.py:264-283, --cyclegan flag)
        self.translator = translator
        if translator is None and cfg.cyclegan:
            import jax as _jax

            from robot_aware_control_tpu.baselines.cyclegan import (
                CycleGAN,
                CycleGANTranslator,
            )

            gan = CycleGAN(_jax.random.PRNGKey(cfg.seed))
            params_gan = gan.params
            if cfg.cyclegan_ckpt:
                from robot_aware_control_tpu.training import checkpoint as _ckpt

                trees, _ = _ckpt.load_checkpoint(
                    cfg.cyclegan_ckpt, {"cyclegan": gan.params}
                )
                params_gan = trees["cyclegan"]
            self.translator = CycleGANTranslator(params_gan, "ab")

    # ------------------------------------------------------------------
    def _world_cost_scalar(self, curr_img, goal_img, curr_mask, goal_mask):
        c = np.asarray(curr_img, np.float32)[None]
        g = np.asarray(goal_img, np.float32)
        if g.dtype == np.uint8 or g.max() > 1.5:
            g = g / 255.0
        cm = None if curr_mask is None else np.asarray(curr_mask)[None]
        v = self.cost.world_cost(c, g, cm, goal_mask)
        return float(np.asarray(v)[0])

    def _pick_next_goal(self, curr: State, goal: State) -> bool:
        """Advance the subgoal when robot+world costs pass their success
        thresholds (reference: episode_runner.py:46-82). Costs are negated
        distances; thresholds are on distances.

        skip-subgoal mode (sequential_subgoal=False): jump to the goal after
        the most-future remaining goal whose world cost is already under the
        success threshold — the reference declares this path
        NotImplementedError but documents the intended semantics in the
        adjacent commented legacy code (episode_runner.py:67-82); we
        implement those semantics with the configured world cost instead of
        the legacy raw-L2."""
        cfg = self.cfg
        if not cfg.sequential_subgoal:
            prev = self._g_i
            min_idx, new_goal = 0, False
            for j in range(len(self._goal_imgs) - self._g_i):
                g_idx = self._g_i + j
                d = -self._world_cost_scalar(
                    curr.img, self._goal_imgs[g_idx], curr.mask,
                    self._goal_masks[g_idx],
                )
                if d <= cfg.world_cost_success:
                    new_goal = True
                    min_idx = j + 1
            self._g_i += min_idx
            if new_goal:
                self._g_i += 1
            return self._g_i != prev
        robot_ok = True
        if cfg.robot_cost_weight != 0 and curr.state is not None:
            d = -float(np.asarray(
                robot_l2_cost(np.asarray(curr.state)[None], goal.state)
            )[0])
            robot_ok = d < cfg.robot_cost_success
        world_ok = True
        if cfg.world_cost_weight != 0:
            d = -self._world_cost_scalar(curr.img, goal.img, curr.mask, goal.mask)
            world_ok = d < cfg.world_cost_success
        if robot_ok and world_ok:
            self._g_i += 1
            return True
        return False

    # ------------------------------------------------------------------
    def run_episode(self, ep_num: int, demo_path: str):
        cfg = self.cfg
        env = self.env
        demo = demo_io.load_demo(demo_path)
        ts = cfg.demo_timescale
        goal_key = (
            cfg.demo_type if cfg.demo_type in demo else "observations"
        )
        # --goal_image_type object_only: goals come from the robot-free
        # demo stream with blank goal masks (reference:
        # push_episode_runner.py:114-119, pick_episode_runner.py:109-114)
        if cfg.goal_image_type == "object_only":
            for k in ("obj_observations", "object_only_demo"):
                if k in demo:
                    goal_key = k
                    break
        goal_imgs = demo[goal_key][::ts]
        goal_masks = demo["masks"][::ts]
        if cfg.goal_image_type == "object_only":
            goal_masks = np.zeros_like(goal_masks)
        goal_robots = demo["robot_state"][::ts]
        goal_obj_poses = demo.get("obj_poses")
        if goal_obj_poses is not None:
            goal_obj_poses = goal_obj_poses[::ts]
        pushed_obj = int(demo.get("pushed_obj", 0))
        num_goals = len(goal_imgs)
        self._goal_imgs, self._goal_masks = goal_imgs, goal_masks
        self._g_i = max(cfg.subgoal_start, 1)
        self._step = 0
        self._since_subgoal = 0

        obs = env.reset()
        if "sim_start" in demo:
            # replay from the demo's initial conditions
            # (reference: episode_runner.py:121-139)
            env.set_flattened_state(demo["sim_start"])
            obs = env._get_obs()
        gif = []
        # --record_trajectory: obs/action/state pickle per episode
        # (reference: episode_runner.py:131-134, 188-205)
        trajectory = defaultdict(list)
        episode_reward = 0.0
        if cfg.record_trajectory:
            trajectory["obs"].append(obs)
            trajectory["state"].append(env.get_flattened_state())
        opt_actions = demo.get("actions")
        push_length = 0.2
        if goal_obj_poses is not None:
            push_length = max(
                float(np.linalg.norm(
                    goal_obj_poses[-1][pushed_obj][:2]
                    - goal_obj_poses[0][pushed_obj][:2]
                )), 1e-3,
            )

        finish_demo = False
        while True:
            goals = DemoGoalState(
                imgs=list(goal_imgs[self._g_i:]),
                states=list(goal_robots[self._g_i:]),
                masks=list(goal_masks[self._g_i:]),
            )
            curr_img = obs["observation"]
            if self.translator is not None:
                curr_img = self.translator(curr_img)
            curr = State(
                img=curr_img, state=obs["states"],
                mask=obs["masks"], qpos=obs["qpos"],
            )
            opt = None
            if cfg.demo_cost and opt_actions is not None:
                # demo actions are at full rate; subgoals every ts frames.
                # Advance the seed window by steps executed SINCE the last
                # subgoal advance — re-seeding the same demo window while a
                # subgoal is pending would re-execute the same open-loop
                # deltas from an already-moved state (reference indexes by
                # goal_timestep, pick_episode_runner.py:117; execution and
                # subgoal cadence decouple here because replanning is
                # threshold-gated)
                start_idx = min(
                    (self._g_i - 1) * ts + self._since_subgoal,
                    max(len(opt_actions) - 1, 0),
                )
                opt = opt_actions[start_idx:]
            actions = self.policy.get_action(curr, goals, ep_num, self._step,
                                             opt_traj=opt)
            terminate = False
            for action in actions[: cfg.replan_every]:
                obs, _, _, _ = env.step(action)
                if cfg.record_trajectory:
                    trajectory["obs"].append(obs)
                    trajectory["ac"].append(np.asarray(action))
                    trajectory["state"].append(env.get_flattened_state())
                curr = State(
                    img=obs["observation"], state=obs["states"],
                    mask=obs["masks"], qpos=obs["qpos"],
                )
                g_idx = min(self._g_i, num_goals - 1)
                g_state = State(
                    img=goal_imgs[g_idx], state=goal_robots[g_idx],
                    mask=goal_masks[g_idx],
                )
                self._step += 1
                gif.append(np.concatenate(
                    [obs["observation"],
                     np.asarray(goal_imgs[g_idx], np.float32)
                     / (255.0 if goal_imgs.dtype == np.uint8 else 1.0)], axis=1,
                ))
                g_before = self._g_i
                self._pick_next_goal(curr, g_state)
                if self._g_i != g_before:
                    # --subgoal_completion_bonus: shaping reward on subgoal
                    # advance (reference: locobot_pick_env_gym.py:245)
                    episode_reward += cfg.subgoal_completion_bonus
                episode_reward += self._world_cost_scalar(
                    curr.img, goal_imgs[min(self._g_i, num_goals - 1)],
                    curr.mask, goal_masks[min(self._g_i, num_goals - 1)],
                )
                if (
                    self._g_i == g_before
                    and cfg.subgoal_step_limit
                    and self._since_subgoal + 1 >= cfg.subgoal_step_limit
                    and self._g_i < num_goals
                ):
                    # timeout advance: hold the demo cadence when a cost
                    # threshold stalls (cfg.subgoal_step_limit)
                    self._g_i += 1
                self._since_subgoal = (
                    0 if self._g_i != g_before else self._since_subgoal + 1
                )
                finish_demo = self._g_i >= num_goals
                if finish_demo or self._step >= cfg.max_episode_length - 1:
                    terminate = True
                    break
            if terminate:
                break

        # stats (reference: episode_runner.py:196-219)
        final_obj_dist = 0.0
        if goal_obj_poses is not None:
            curr_obj = np.asarray(env.state.obj_pos)[pushed_obj][:2]
            final_obj_dist = float(np.linalg.norm(
                curr_obj - goal_obj_poses[-1][pushed_obj][:2]
            ))
        goal_progress = (self._g_i - cfg.subgoal_start) / max(
            num_goals - cfg.subgoal_start, 1
        )
        self._stats["goal_progress"].append(goal_progress)
        self._stats["push_progress"].append(
            (push_length - final_obj_dist) / push_length
        )
        self._stats["final_obj_dist"].append(final_obj_dist)
        self._stats["success"].append(float(finish_demo))
        # threshold successes (reference: fetch/pick env success checks,
        # --object_dist_threshold / --gripper_dist_threshold)
        self._stats["object_success"].append(
            float(goal_obj_poses is not None
                  and final_obj_dist < cfg.object_dist_threshold)
        )
        grip_dist = float(np.linalg.norm(
            np.asarray(env.state.eef)[:2]
            - np.asarray(goal_robots[-1][:2], np.float32)
        ))
        self._stats["gripper_success"].append(
            float(grip_dist < cfg.gripper_dist_threshold)
        )
        self._stats["episode_reward"].append(episode_reward)
        if cfg.record_trajectory and (
            ep_num % max(cfg.record_trajectory_interval, 1) == 0
        ):
            import pickle

            traj_dir = os.path.join(self.log_dir, "trajectory")
            os.makedirs(traj_dir, exist_ok=True)
            with open(os.path.join(
                traj_dir, f"ep_s{self._g_i}_{ep_num}.pkl"
            ), "wb") as f:
                pickle.dump(dict(trajectory), f)
        if cfg.record_video_interval and ep_num % cfg.record_video_interval == 0:
            save_gif(os.path.join(
                self.log_dir, f"ep_{ep_num}_{'s' if finish_demo else 'f'}.gif"
            ), gif)
        return {k: v[-1] for k, v in self._stats.items()}

    def run(self, demo_paths: Optional[List[str]] = None):
        """(reference: episode_runner.py:226-296)"""
        cfg = self.cfg
        if demo_paths is None:
            demo_dir = cfg.object_demo_dir or cfg.demo_dir
            demo_paths = demo_io.list_demos(demo_dir)
        if not demo_paths:
            raise FileNotFoundError("no demos found; run demo collection")
        n = min(cfg.num_episodes, len(demo_paths))
        for i in range(n):
            stats = self.run_episode(i, demo_paths[i % len(demo_paths)])
            self.logger.scalars(stats, i, prefix="episode/")
            self.logger.info(
                f"episode {i}: " + " ".join(f"{k}={v:.3f}" for k, v in stats.items())
            )
        summary = {k: float(np.mean(v)) for k, v in self._stats.items()
                   if k != "demo_name"}
        self.logger.scalars(summary, n, prefix="summary/")
        self.logger.info(
            "summary: " + " ".join(f"{k}={v:.3f}" for k, v in summary.items())
        )
        return summary


class PushEpisodeRunner(EpisodeRunner):
    """(reference: src/mbrl/push_episode_runner.py:20-458)"""

    env_cls = LocobotPushEnv
    policy_cls = PushCEMPolicy
    gt_policy_cls = GTPushCEMPolicy


class PickEpisodeRunner(EpisodeRunner):
    """(reference: src/mbrl/pick_episode_runner.py:20-446)"""

    env_cls = LocobotPickEnv
    policy_cls = PickCEMPolicy
    gt_policy_cls = GTPickCEMPolicy


def main(argv=None):
    from robot_aware_control_tpu.config import argparser

    cfg, _ = argparser(argv)
    if cfg.mbrl_algo != "cem":
        # the reference registers exactly one algorithm
        # (src/config/__init__.py mbrl_algo choices)
        raise ValueError(f"unknown --mbrl_algo {cfg.mbrl_algo!r}; only 'cem'")
    runner_cls = {
        "FetchPush": EpisodeRunner,
        "LocobotTable": PushEpisodeRunner,
        "LocobotPush": PushEpisodeRunner,
        "LocobotPick": PickEpisodeRunner,
    }.get(cfg.env, EpisodeRunner)
    params = bn = None
    if cfg.dynamics_model_ckpt and not cfg.use_env_dynamics:
        import jax as _jax

        from robot_aware_control_tpu.models.registry import get_model
        from robot_aware_control_tpu.training import checkpoint as _ckpt

        params, bn = get_model(cfg).init(_jax.random.PRNGKey(cfg.seed), cfg)
        trees, _ = _ckpt.load_checkpoint(
            cfg.dynamics_model_ckpt, {"params": params, "bn": bn}
        )
        params, bn = trees["params"], trees["bn"]
    runner = runner_cls(cfg, params, bn)
    runner.run()


if __name__ == "__main__":
    main()
