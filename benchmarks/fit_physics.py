"""Fit the analytic contact constants against saved MuJoCo curves.

Loads the per-scenario MuJoCo displacement curves recorded by
benchmarks/physics_fidelity.py (no MuJoCo needed here), re-runs the
analytic rollouts for candidate (PUSH_EFFICIENCY, PUSH_LOAD, COAST_INIT,
COAST_DECAY) values, and coordinate-descends on the mean of per-scenario
max step errors. Prints the best constants for envs/base.py.

Usage: python benchmarks/fit_physics.py [--json benchmarks/physics_fidelity.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(eb, scenarios, mj, params):
    from benchmarks.physics_fidelity import analytic_rollout

    for k, v in params.items():
        setattr(eb, k, v)
    errs = {}
    for name, sc in scenarios.items():
        if name not in mj:
            continue
        objs = np.atleast_2d(np.asarray(sc["obj"], float))
        an = analytic_rollout(sc["eef"], objs, sc["actions"]) - objs[None]
        m = np.asarray(mj[name])
        t = min(len(an), len(m))
        # same error metric as physics_fidelity.py (per-axis max)
        errs[name] = float(np.abs(an[:t] - m[:t]).max())
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/physics_fidelity.json")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from benchmarks.physics_fidelity import SCENARIOS
    from robot_aware_control_tpu.envs import base as eb

    data = json.load(open(args.json))
    mj = {k: v["mj_disp"] for k, v in data.items()
          if isinstance(v, dict) and "mj_disp" in v}

    params = {
        "PUSH_EFFICIENCY": eb.PUSH_EFFICIENCY,
        "PUSH_LOAD": eb.PUSH_LOAD,
        "COAST_INIT": eb.COAST_INIT,
        "COAST_DECAY": eb.COAST_DECAY,
    }
    grid = {
        "PUSH_EFFICIENCY": [0.36, 0.40, 0.44, 0.48, 0.52],
        "PUSH_LOAD": [0.4, 0.6, 0.76, 1.0, 1.4],
        "COAST_INIT": [0.2, 0.35, 0.5, 0.65, 0.8],
        "COAST_DECAY": [0.1, 0.2, 0.3, 0.45],
    }

    def score(p):
        errs = evaluate(eb, SCENARIOS, mj, p)
        return float(np.mean(list(errs.values()))), errs

    best, errs = score(params)
    print("start", best, params)
    for _ in range(3):
        improved = False
        for key, values in grid.items():
            for v in values:
                if v == params[key]:
                    continue
                cand = dict(params, **{key: v})
                s, e = score(cand)
                if s < best - 1e-5:
                    best, params, errs, improved = s, cand, e, True
                    print("  ->", key, v, round(best, 5))
        if not improved:
            break

    print("\nbest mean max-step err:", round(best, 5))
    print("constants:", json.dumps(params))
    for k, v in sorted(errs.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v:.4f}")


if __name__ == "__main__":
    main()
