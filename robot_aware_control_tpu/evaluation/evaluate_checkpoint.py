"""Checkpoint evaluation drivers.

Reference parity: `evaluate_checkpoint` (reference:
src/prediction/evaluation/evaluate_checkpoint.py:16-80 — PSNR/SSIM/world
loss on the transfer set) and `evaluate_fvd` (evaluation/evaluate_fvd.py:14
— FVD over autoregressively predicted videos)."""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from robot_aware_control_tpu.config import Config, argparser
from robot_aware_control_tpu.evaluation.fvd import fvd
from robot_aware_control_tpu.training.trainer import PredictionTrainer


def evaluate_checkpoint(cfg: Config, ckpt_path: str, loader=None):
    """Returns dict of PSNR/SSIM/world-loss metrics on the transfer (or
    test) set (reference: evaluate_checkpoint.py:16-34)."""
    trainer = PredictionTrainer(cfg)
    trainer.load_checkpoint(ckpt_path, finetune=False)
    if loader is None:
        if cfg.experiment == "eval_franka":
            # zero-shot franka eval loads the franka_views/c0 transfer set
            # directly (reference: evaluate_checkpoint.py:8,44-58 imports
            # franka_dataloader.create_transfer_loader)
            from robot_aware_control_tpu.data.loader import (
                create_franka_transfer_loader,
            )

            loader = create_franka_transfer_loader(cfg)
        else:
            _, loader = trainer._setup_data()
            if trainer.transfer_loader is not None:
                loader = trainer.transfer_loader
    metrics, _ = trainer._eval_epoch(iter(loader))  # full set (reference: trainer.py:467-489)
    # world-PSNR derived from the world MSE (reference :24-29)
    wl = metrics.get("autoreg_world_loss")
    if wl and wl > 0:
        metrics["autoreg_world_psnr"] = float(10 * np.log10(1.0 / wl))
    return metrics


def evaluate_obj_movement(cfg: Config, ckpt_path: str):
    """PSNR/SSIM restricted to high-movement videos (reference:
    evaluation/evaluate_obj_movement.py:13-24 via the movement-filtered
    loader, robonet_dataloaders.py:295)."""
    from robot_aware_control_tpu.data.loader import create_movement_loaders

    trainer = PredictionTrainer(cfg)
    trainer.load_checkpoint(ckpt_path, finetune=False)
    _, test_loader = create_movement_loaders(cfg)
    metrics, _ = trainer._eval_epoch(iter(test_loader))
    return metrics


def predict_videos(trainer: PredictionTrainer, loader, num_batches=2):
    """Autoregressive predicted videos + ground truth (B, T, H, W, 3)
    (reference: trainer.predict_video, trainer.py:1149-1224)."""
    real, fake = [], []
    n = 0
    for batch in loader:
        w = trainer._window(batch, 0, trainer.cfg.n_eval)
        w.pop("qpos", None)
        dev = trainer._device_batch(w)
        _, preds = trainer.eval_step_ar(
            trainer.params, trainer.bn, dev, trainer._next_key()
        )
        real.append(np.moveaxis(np.asarray(w["images"][1:]), 0, 1))
        fake.append(np.moveaxis(np.asarray(preds), 0, 1))
        n += 1
        if n >= num_batches:
            break
    return np.concatenate(real), np.concatenate(fake)


def evaluate_fvd(cfg: Config, ckpt_path: str, loader=None, embed_fn=None):
    """(reference: evaluation/evaluate_fvd.py:14). The returned artifact
    carries the embedder honesty caveat alongside the number whenever the
    value is not reference-comparable (no converted I3D weights)."""
    from robot_aware_control_tpu.evaluation.fvd import embedder_caveat

    trainer = PredictionTrainer(cfg)
    trainer.load_checkpoint(ckpt_path, finetune=False)
    if loader is None:
        _, loader = trainer._setup_data()
    real, fake = predict_videos(trainer, iter(loader))
    out = {"fvd": fvd(real, fake, embed_fn)}
    caveat = embedder_caveat(embed_fn)
    if caveat:
        out["fvd_caveat"] = caveat
    return out


def main(argv=None):
    cfg, unparsed = argparser(argv)
    ckpt = cfg.dynamics_model_ckpt
    if ckpt is None:
        raise ValueError("--dynamics_model_ckpt required")
    metrics = evaluate_checkpoint(cfg, ckpt)
    print(json.dumps({k: round(float(v), 5) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
