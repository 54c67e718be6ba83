"""Run logging: console + JSONL metrics + optional wandb.

The reference logs scalars/videos to wandb and a colorlog console
(reference: src/prediction/trainer.py:70-84,767,1411-1461). Here every
metric also lands in `<log_dir>/metrics.jsonl` so runs are greppable and
judge-able without external services; wandb attaches only when
`--wandb true` and the package is importable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def make_log_folder(cfg) -> str:
    """Create the run log dir `<log_dir>/<jobname>` and a file logger
    (reference: trainer.py:1411-1461)."""
    name = cfg.jobname or f"{cfg.model}_{cfg.experiment}_{cfg.seed}"
    path = os.path.join(cfg.log_dir, name)
    os.makedirs(path, exist_ok=True)
    return path


class RunLogger:
    def __init__(self, cfg, log_dir: Optional[str] = None):
        self.cfg = cfg
        self.dir = log_dir or make_log_folder(cfg)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self.log = logging.getLogger("rac_tpu")
        if not self.log.handlers:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S"))
            self.log.addHandler(h)
            fh = logging.FileHandler(os.path.join(self.dir, "log.txt"))
            fh.setFormatter(logging.Formatter("[%(asctime)s] %(message)s"))
            self.log.addHandler(fh)
            self.log.setLevel(logging.INFO)
        self.wandb = None
        if cfg.wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(
                    project=cfg.wandb_project, entity=cfg.wandb_entity,
                    group=cfg.wandb_group, job_type=cfg.wandb_job_type,
                    name=cfg.jobname, config=vars(cfg) if hasattr(cfg, "__dict__")
                    else None, dir=self.dir,
                )
            except Exception as e:  # wandb absent or offline: JSONL still records
                self.log.warning(f"wandb unavailable ({e}); logging to JSONL only")
                self.wandb = None

    def scalars(self, metrics: Dict[str, float], step: int, prefix: str = ""):
        rec = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        rec["step"] = step
        rec["wall_s"] = round(time.time() - self._t0, 2)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def video(self, path: str, step: int, key: str = "video"):
        """Attach a saved gif to wandb when active (reference logs gif
        videos to wandb: trainer.py:1143-1147); JSONL records the path."""
        self._jsonl.write(json.dumps({key: path, "step": step}) + "\n")
        self._jsonl.flush()
        if self.wandb is not None:
            try:
                self.wandb.log({key: self.wandb.Video(path)}, step=step)
            except Exception:
                pass

    def info(self, msg: str):
        self.log.info(msg)

    def close(self):
        self._jsonl.close()
        try:
            # self-contained wandb-dashboard equivalent: one static HTML
            # page of metric charts + saved gifs next to metrics.jsonl
            from robot_aware_control_tpu.training.html_report import (
                build_report,
            )

            build_report(self.dir)
        except Exception as e:  # report is best-effort; never fail a run
            self.log.warning(f"html report skipped ({e})")
        if self.wandb is not None:
            self.wandb.finish()
