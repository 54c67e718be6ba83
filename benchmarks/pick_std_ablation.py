"""Ablate the demo-seeded pick-CEM std scheme (VERDICT r2 weak #7).

When the CEM mean is demo-seeded (--demo_cost + demo actions),
PickCEMPolicy keeps exploration LOCAL around the seed instead of applying
the reference's unseeded wide-x scheme (x-std 0.2, gripper std 0.005 —
reference: src/cem/pick/cem.py:66-74). This harness measures the two
schemes head-to-head: the same held-out pick-place demos are followed with
ground-truth dynamics (use_env_dynamics, isolating the CEM question from
model quality) under cfg.pick_wide_x_std = False (seeded-local, ours) and
True (reference wide-x), reporting per-episode final_obj_dist and
push_progress.

Usage:
  python benchmarks/pick_std_ablation.py [--episodes 4] [--out PATH]
Runs on CPU (forced) — gt-physics pick planning needs no TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/pick_std_ablation.json")
    ap.add_argument("--log_dir", default="/tmp/pick_std_ablation")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import numpy as np

    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.control.episode_runner import (
        PickEpisodeRunner,
    )
    from robot_aware_control_tpu.data import demo_io
    from robot_aware_control_tpu.envs.locobot_pick import LocobotPickEnv

    base = Config(
        env="LocobotPick", jobname="std_ablation",
        log_dir=args.log_dir,
        use_env_dynamics=True, demo_cost=True, demo_timescale=2,
        horizon=8, opt_iter=10, action_candidates=300, topk=10,
        replan_every=2, reward_type="dontcare",
        robot_cost_weight=50000.0, robot_cost_success=0.02,
        world_cost_weight=1.0,
        sequential_subgoal=True, subgoal_start=1, subgoal_step_limit=4,
        max_episode_length=48, record_video_interval=10 ** 6,
        num_episodes=args.episodes, action_dim=5, robot_dim=5,
        robot_joint_dim=5,
    )

    demo_dir = os.path.join(args.log_dir, "demos")
    if len(demo_io.list_demos(demo_dir)) < args.episodes:
        env = LocobotPickEnv(base, seed=321)
        demo_io.collect_demos(env, "pick_place", args.episodes, demo_dir)
    base = base.replace(demo_dir=demo_dir)

    results = {}
    for wide in (False, True):
        name = "reference_wide_x" if wide else "seeded_local"
        cfg = base.replace(pick_wide_x_std=wide,
                           jobname=f"std_ablation_{name}")
        runner = PickEpisodeRunner(cfg, None, None)
        summary = runner.run()
        results[name] = {
            "final_obj_dist": [float(x)
                               for x in runner._stats["final_obj_dist"]],
            "push_progress": [float(x)
                              for x in runner._stats["push_progress"]],
            "mean_final_obj_dist": float(
                np.mean(runner._stats["final_obj_dist"])
            ),
            "mean_push_progress": float(
                np.mean(runner._stats["push_progress"])
            ),
            "summary": {k: float(v) for k, v in summary.items()},
        }
        print(name, json.dumps(results[name]["summary"]))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v["mean_final_obj_dist"] for k, v in
                      results.items()}, indent=2))


if __name__ == "__main__":
    main()
