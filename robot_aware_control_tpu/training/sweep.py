"""Hyperparameter sweeps.

Reference parity: the vendored RoboNet Ray-Tune trainable interface
(reference: robonet/robonet/training/trainable_interface.py:1-331,
scripts/train_model.py:24-50 — per-trial single GPU, cluster via Ray).
TPU-native equivalent: trials are independent single-program runs; this
module expands a config grid, runs each trial (sequentially on one host —
each trial already uses every local chip via the data mesh), retries
failures (Ray's max_failures), and reports the best trial by a metric read
from the run's metrics.jsonl.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Dict, Iterable, List, Optional, Tuple

from robot_aware_control_tpu.config import Config


def expand_grid(base: Config, grid: Dict[str, Iterable]) -> List[Config]:
    keys = sorted(grid)
    configs = []
    for values in itertools.product(*(grid[k] for k in keys)):
        kw = dict(zip(keys, values))
        name = "_".join(f"{k}={v}" for k, v in kw.items())
        configs.append(base.replace(jobname=f"{base.jobname or 'sweep'}_{name}",
                                    **kw))
    return configs


def _read_metric(log_dir: str, metric: str) -> Optional[float]:
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if metric in rec:
                best = rec[metric]  # last occurrence = latest
    return best


def run_sweep(base: Config, grid: Dict[str, Iterable], metric: str,
              mode: str = "min", max_failures: int = 2
              ) -> Tuple[Optional[Config], List[Dict]]:
    """Returns (best config, per-trial results)."""
    from robot_aware_control_tpu.training.trainer import PredictionTrainer

    results = []
    for cfg in expand_grid(base, grid):
        failures = 0
        value = None
        while failures <= max_failures:
            try:
                trainer = PredictionTrainer(cfg)
                trainer.train()
                value = _read_metric(trainer.log_dir, metric)
                break
            except Exception as e:  # retry like Ray's max_failures
                failures += 1
                if failures > max_failures:
                    value = None
                    break
        results.append({"config": cfg, "value": value})
    scored = [r for r in results if r["value"] is not None]
    if not scored:
        return None, results
    best = (min if mode == "min" else max)(scored, key=lambda r: r["value"])
    return best["config"], results
