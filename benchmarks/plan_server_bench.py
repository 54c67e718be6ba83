"""Serving throughput: concurrent robot clients against one PlanServer.

Measures end-to-end served plans/s (socket framing + leader-follower
micro-batching + the jitted CEM program) for 1..R concurrent clients.
The reference has no serving story — each robot runs its own GPU planner
process (locobot_rospkg/nodes/visual_MPC_controller.py); here R robots
share one TPU planner and requests that queue behind an in-flight plan
are planned together in one vmapped device program
(control/plan_server.py, planning/cem.py:get_action_batched).

Run on the TPU host:  python benchmarks/plan_server_bench.py [--smoke]
Writes benchmarks/plan_server_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model on CPU (CI-runnable)")
    ap.add_argument("--plans_per_client", type=int, default=6)
    ap.add_argument("--clients", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    if args.smoke:
        # the axon plugin ignores the JAX_PLATFORMS env var; force CPU
        # programmatically (CLAUDE.md environment notes)
        jax.config.update("jax_platforms", "cpu")

    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.control.plan_server import (PlanClient,
                                                             PlanServer)
    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.utils.state import DemoGoalState, State

    smoke = args.smoke
    cfg = Config(
        model="svg", g_dim=64 if smoke else 256, z_dim=16 if smoke else 64,
        image_height=48, image_width=64, action_dim=5, robot_dim=5,
        robot_joint_dim=5, model_use_mask=True, model_use_future_mask=True,
        model_use_robot_state=True, reconstruction_loss="dontcare_l1",
        reward_type="dontcare",
        compute_dtype="float32" if smoke else "bfloat16",
        horizon=3 if smoke else 5, opt_iter=2 if smoke else 10,
        action_candidates=8 if smoke else 100, topk=3 if smoke else 5,
        cem_init_std=0.015,
    )
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    server = PlanServer(cfg, params, bn)
    server.start()

    rng = np.random.RandomState(0)
    h, w = cfg.image_height, cfg.image_width
    start = State(img=rng.rand(h, w, 3).astype(np.float32),
                  state=np.array([0.3, 0.0, 0.15, 0.0, 0.0], np.float32),
                  qpos=np.zeros(5, np.float32))
    goal = DemoGoalState(
        imgs=[rng.rand(h, w, 3).astype(np.float32) for _ in range(4)],
        masks=[np.zeros((h, w), np.float32) for _ in range(4)])

    def client_loop(n_plans, out, idx):
        c = PlanClient(*server.address)
        batched = []
        try:
            for i in range(n_plans):
                c.plan(start, goal, ep_num=idx, step=i)
                batched.append(c.last_batched)
        finally:
            c.close()
        out[idx] = batched

    results = {}
    for R in args.clients:
        # warm every program this R will need (compile excluded from timing:
        # single-plan + batched shapes up to R)
        warm = {}
        client_loop(1, warm, 0)
        starts = [start] * R
        goals = [goal] * R
        if R > 1 and hasattr(server.policy, "get_action_batched"):
            for r in (R, max(2, R // 2)):
                server.policy.get_action_batched(starts[:r], goals[:r])

        out = {}
        threads = [threading.Thread(target=client_loop,
                                    args=(args.plans_per_client, out, i))
                   for i in range(R)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = R * args.plans_per_client
        sizes = [b for bs in out.values() for b in bs]
        results[R] = {
            "clients": R,
            "plans": total,
            "plans_per_sec": round(total / dt, 2),
            "mean_batch": round(float(np.mean(sizes)), 2),
            "max_batch": int(np.max(sizes)),
        }
        print(json.dumps(results[R]))

    server._shutdown = True
    server.close()
    path = os.path.join(os.path.dirname(__file__), "plan_server_bench.json")
    with open(path, "w") as f:
        json.dump({"config": {"smoke": smoke,
                              "action_candidates": cfg.action_candidates,
                              "opt_iter": cfg.opt_iter,
                              "horizon": cfg.horizon},
                   "results": results}, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
