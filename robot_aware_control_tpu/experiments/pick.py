"""Learned-model pick-and-place experiment, end to end on device.

Reference parity target: the pick episode runner driving CEM through the
learned SVG model (reference: src/mbrl/pick_episode_runner.py:20-446 with
src/cem/pick/cem.py + pick/trajectory_sampler.py). Pipeline:

  1. collect scripted pick-place training episodes
     (envs/locobot_pick.py generate_demo; reference:
     src/env/robotics/locobot_pick_env.py:346-555),
  2. train a robot-aware SVG model on them (dontcare_l1 + mask/state
     conditioning),
  3. collect held-out demos and run PickEpisodeRunner with the LEARNED
     model: demo-seeded CEM mean (--demo_cost), per-step robot-state cost
     (robot_cost_weight, matching pick/trajectory_sampler.py:267-285), and
     on-device 3-D eef/mask rollouts (planning/rollout.py pick mode).

Usage (TPU, ~30-40 min at defaults):
  python -m robot_aware_control_tpu.experiments.pick \
      --log_dir /tmp/pick_exp --num_episodes 300 --niter 30

Writes <log_dir>/pick_results.json with per-episode and summary stats.
"""

from __future__ import annotations

import glob
import json
import os

import jax
import numpy as np

from robot_aware_control_tpu.config import Config, argparser
from robot_aware_control_tpu.control.episode_runner import PickEpisodeRunner
from robot_aware_control_tpu.data import demo_io
from robot_aware_control_tpu.data.collect import collect_training_data
from robot_aware_control_tpu.envs.locobot_pick import LocobotPickEnv
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.trainer import PredictionTrainer


def train_cfg(cfg: Config, data_root: str) -> Config:
    return cfg.replace(
        model="svg", experiment="train_locobot_pick", jobname="pick_model",
        data_root=data_root,
        action_dim=5, robot_dim=5, robot_joint_dim=5,
        model_use_mask=True, model_use_future_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        impute_autograsp_action=False,
        scheduled_sampling=True, remat=True,
        n_past=1, n_future=5,
        checkpoint_interval=max(cfg.niter // 2, 1),
        eval_interval=10 ** 6,
    )


def plan_cfg(cfg: Config, tcfg: Config, demo_dir: str) -> Config:
    return tcfg.replace(
        jobname="pick_eval", env="LocobotPick",
        use_env_dynamics=False, demo_dir=demo_dir,
        demo_cost=True, demo_timescale=cfg.demo_timescale,
        horizon=cfg.horizon, replan_every=cfg.replan_every,
        opt_iter=cfg.opt_iter, action_candidates=cfg.action_candidates,
        topk=cfg.topk,
        reward_type="dontcare",
        robot_cost_weight=(cfg.robot_cost_weight or 1.0),
        world_cost_weight=cfg.world_cost_weight,
        sequential_subgoal=True,
        max_episode_length=cfg.max_episode_length,
        record_video_interval=1,
        num_episodes=min(cfg.num_episodes, 6),
    )


def _collect_on_cpu(argv, n_episodes, data_root, demo_dir, seed):
    """Scripted collection is a host-env loop; through the tunneled TPU
    every env step pays ~0.1-0.2 s of device round-trips, so collection
    runs in a forced-CPU subprocess (the jax platform is process-global)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\n"
        "from robot_aware_control_tpu.config import argparser\n"
        "from robot_aware_control_tpu.data.collect import collect_training_data\n"
        "from robot_aware_control_tpu.data import demo_io\n"
        "from robot_aware_control_tpu.envs.locobot_pick import LocobotPickEnv\n"
        f"cfg, _ = argparser({argv!r})\n"
        f"collect_training_data('LocobotPick', {n_episodes}, {data_root!r}, cfg, seed={seed})\n"
        f"env = LocobotPickEnv(cfg, seed={seed} + 123)\n"
        f"demo_io.collect_demos(env, 'pick_place', 6, {demo_dir!r})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def main(argv=None):
    cfg, _ = argparser(argv)
    os.makedirs(cfg.log_dir, exist_ok=True)

    data_root = os.path.join(cfg.log_dir, "data_pick")
    demo_dir = os.path.join(cfg.log_dir, "demos_eval")
    files = glob.glob(os.path.join(data_root, "**", "*.hdf5"), recursive=True)
    if not files:
        import jax as _j

        if _j.default_backend() != "cpu":
            import sys as _sys

            flags = list(argv) if argv is not None else _sys.argv[1:]
            _collect_on_cpu(flags, cfg.num_episodes,
                            data_root, demo_dir, cfg.seed)
        else:
            collect_training_data("LocobotPick", cfg.num_episodes, data_root,
                                  cfg, seed=cfg.seed)
        files = glob.glob(os.path.join(data_root, "**", "*.hdf5"),
                          recursive=True)

    # clamp the training video length to the shortest collected episode
    import h5py

    ep_len = min(
        h5py.File(f, "r")["observations"].shape[0] for f in files
    )
    tcfg = train_cfg(cfg, data_root).replace(
        video_length=min(cfg.video_length, ep_len)
    )
    trainer = PredictionTrainer(tcfg)
    trainer.train()
    ckpt_path = ckpt.latest_checkpoint(trainer.log_dir)
    print(f"[pick] trained; ckpt={ckpt_path}", flush=True)

    n_eval = min(cfg.num_episodes, 6)
    if len(demo_io.list_demos(demo_dir)) < n_eval:
        env = LocobotPickEnv(cfg, seed=cfg.seed + 123)
        demo_io.collect_demos(env, "pick_place", n_eval, demo_dir)
    print(f"[pick] eval demos ready in {demo_dir}", flush=True)

    pcfg = plan_cfg(cfg, tcfg, demo_dir)
    params, bn = get_model(pcfg).init(jax.random.PRNGKey(0), pcfg)
    trees, _ = ckpt.load_checkpoint(ckpt_path, {"params": params, "bn": bn})
    runner = PickEpisodeRunner(pcfg, trees["params"], trees["bn"])
    summary = runner.run()

    result = {
        "ckpt": ckpt_path,
        "episodes": {k: [float(x) for x in v]
                     for k, v in runner._stats.items() if k != "demo_name"},
        "summary": {k: float(v) for k, v in summary.items()},
    }
    out = os.path.join(cfg.log_dir, "pick_results.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["summary"], indent=2))


if __name__ == "__main__":
    main()
