"""Training runtime: the `PredictionTrainer` loop and CLI.

TPU-native rebuild of the reference trainer (reference:
src/prediction/trainer.py:53-1471, invoked as
`python -um src.prediction.multirobot_trainer`). The reference steps the
model frame-by-frame in Python, mutating module hidden state and calling
`.backward()` per window; here the whole window is one jitted
scan-train-step (training/step.py) and the host loop only does data
slicing, scheduling, checkpointing, eval and plotting.

Loop structure preserved:
  * niter epochs x epoch_size batches (trainer.py:753-768), each batch a
    T=video_length video sliced into floor(T/window) train windows with
    optional random snippets (trainer.py:259-283),
  * scheduled-sampling prob k/(k+e^(step/k)) per optimizer step
    (trainer.py:132-147) — evaluated host-side, passed as a scalar,
  * finetune experiments run the robot model (analytical or learned) to
    replace masks/states before the step (trainer.py:294-319),
  * checkpoint every checkpoint_interval epochs with auto-resume from the
    newest ckpt (trainer.py:770-772,829-897),
  * eval every eval_interval epochs: 1-step + autoregressive, best-of-3
    prior samples by PSNR for svg finetune (trainer.py:491-563), transfer
    set for zero-shot robots (trainer.py:786-790), eval gifs.

Parallelism: batches shard over the mesh's "data" axis and XLA inserts the
gradient all-reduce over ICI. Params/optimizer state are replicated by
default; `--param_sharding data` stores them FSDP-style (1/n HBM, gathered
at use) and `--model_axis_size M --param_sharding model` channel-shards
them over a 2-D (data, model) mesh (tensor parallelism). See
parallel/mesh.py:leaf_sharding for the one-rule sharding layout.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from robot_aware_control_tpu.config import Config, argparser
from robot_aware_control_tpu.data import loader as data_loader
from robot_aware_control_tpu.data.synthetic import SyntheticDataset
from robot_aware_control_tpu.models import copy_model
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.models import robot_mlp
from robot_aware_control_tpu.parallel import mesh as pmesh
from robot_aware_control_tpu.robot.analytical import get_robot_model
from robot_aware_control_tpu.robot.mask_renderer import CapsuleMaskRenderer
from robot_aware_control_tpu.training import checkpoint as ckpt
from robot_aware_control_tpu.training.logger import RunLogger, make_log_folder
from robot_aware_control_tpu.training.plot import eval_gif
from robot_aware_control_tpu.training.step import (
    make_copy_eval_step,
    make_eval_step,
    make_train_step,
)

_WINDOW_KEYS = ("images", "masks", "states", "qpos", "heatmaps")


class PredictionTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.log_dir = make_log_folder(cfg)
        self.logger = RunLogger(cfg, self.log_dir)
        self._step = 0
        self._start_epoch = 0
        self._video_rng = np.random.RandomState(cfg.seed)
        self._key = jax.random.PRNGKey(cfg.seed)

        self.model = get_model(cfg) if cfg.model != "copy" else copy_model
        if cfg.model != "copy":
            self.params, self.bn = self.model.init(
                jax.random.PRNGKey(cfg.seed), cfg
            )
            self.train_step, self.tx = make_train_step(cfg)
            self.opt_state = self.tx.init(self.params)
            self.eval_step_ar = make_eval_step(cfg, autoregressive=True)
            self.eval_step_1 = make_eval_step(cfg, autoregressive=False)
        else:
            self.params = self.bn = self.opt_state = None
            # parameter-free eval steps with the same metric keys, so the
            # copy baseline reuses the full _eval_epoch machinery
            # (reference routes "copy" through the shared eval step,
            # trainer.py:606-607)
            self.eval_step_ar = make_copy_eval_step(cfg, autoregressive=True)
            self.eval_step_1 = make_copy_eval_step(cfg, autoregressive=False)

        # device mesh (single device degrades gracefully). With
        # model_axis_size > 1 the mesh is 2-D (data, model): batch shards
        # over "data", params channel-shard over "model" (tensor
        # parallelism). The DATA axis size must divide the batch, so clamp
        # to the largest divisor.
        tp = max(1, cfg.model_axis_size)
        ndev = cfg.num_devices or len(jax.devices())
        ndev -= ndev % tp
        while ndev > tp and (
            cfg.batch_size % (ndev // tp) or cfg.test_batch_size % (ndev // tp)
        ):
            ndev -= tp
        # --mesh_axes names the mesh dimensions (data axis first; a second
        # name is used for the tensor-parallel axis when model_axis_size>1)
        axes = tuple(cfg.mesh_axes) or ("data",)
        data_ax = axes[0]
        model_ax = axes[1] if len(axes) > 1 else "model"
        self._mesh_axis_names = (data_ax, model_ax)
        if tp > 1 and ndev >= tp:
            self.mesh = pmesh.get_mesh_2d(tp, ndev, axes=(data_ax, model_ax))
        elif ndev > 1:
            self.mesh = pmesh.get_mesh(ndev, axis=data_ax)
        else:
            self.mesh = None
        if self.mesh is not None and self.params is not None:
            if cfg.param_sharding == "model" and tp > 1:
                put = lambda t: pmesh.shard_params(self.mesh, t, model_ax)
            elif cfg.param_sharding == "data":
                put = lambda t: pmesh.shard_params(self.mesh, t, data_ax)
            else:
                put = lambda t: pmesh.replicate(self.mesh, t)
            self.params = put(self.params)
            self.bn = put(self.bn)
            self.opt_state = put(self.opt_state)

        # robot model for finetune experiments (trainer.py:123-130): the
        # analytical model is locobot-only; sawyer/widowx finetunes use
        # ground-truth dataset masks unless --learned_robot_model
        self.robot_model = None
        self.learned_robot = None
        if "finetune" in cfg.experiment and (
            cfg.model_use_mask or cfg.model_use_robot_state
        ):
            if cfg.learned_robot_model:
                self.learned_robot = self._load_learned_robot_model()
            elif cfg.experiment == "finetune_locobot":
                self.robot_model = get_robot_model(cfg)

    # ------------------------------------------------------------------
    def _load_learned_robot_model(self):
        """Load {joint_model, gripper_model} params (reference:
        trainer.py:205-231, ckpt contract trainer.py:839-844)."""
        cfg = self.cfg
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        joint = robot_mlp.joint_pos_predictor_init(keys[0], cfg)
        grip = robot_mlp.gripper_state_predictor_init(keys[1], cfg)
        if cfg.robot_model_ckpt:
            trees, _ = ckpt.load_checkpoint(
                cfg.robot_model_ckpt,
                {"joint_model": joint, "gripper_model": grip},
            )
            joint, grip = trees["joint_model"], trees["gripper_model"]
        renderer = CapsuleMaskRenderer(
            (cfg.image_height, cfg.image_width), thick=False,
            modified=cfg.modified,
        )

        @jax.jit
        def predict(joint_p, grip_p, states0, qpos0, actions):
            """states0/qpos0 (B, D); actions (T-1, B, A). Autoregressive
            delta rollout + capsule mask render."""
            def step(carry, a):
                s, q = carry
                s2 = s + robot_mlp.gripper_state_predictor(grip_p, s, a)
                q2 = q + robot_mlp.joint_pos_predictor(joint_p, q, a)
                return (s2, q2), (s2, q2)

            (_, _), (ss, qq) = jax.lax.scan(step, (states0, qpos0), actions)
            ss = jnp.concatenate([states0[None], ss], 0)
            qq = jnp.concatenate([qpos0[None], qq], 0)
            masks = renderer.render(qq)
            return ss, masks

        return {"joint": joint, "grip": grip, "fn": predict}

    # ------------------------------------------------------------------
    def _setup_data(self):
        """Experiment-dispatched loader factory (trainer.py:899-947)."""
        cfg = self.cfg
        self.transfer_loader = None
        if cfg.experiment == "synthetic" or cfg.dataset == "synthetic":
            # batch sizes are GLOBAL: each host generates its share and
            # shard_batch assembles the global array (multi-host feed)
            pidx = jax.process_index()
            train = SyntheticDataset(
                cfg, data_loader._host_batch(cfg.batch_size),
                seed=cfg.seed + 1000 * pidx,
                num_batches=max(cfg.epoch_size, 1))
            test = SyntheticDataset(
                cfg, data_loader._host_batch(cfg.test_batch_size),
                seed=cfg.seed + 1 + 1000 * pidx, num_batches=2)
            return train, test
        exp = cfg.experiment
        if exp == "train_robonet":
            # zero-shot transfer measured on locobot — a robot absent from
            # the robonet training mix (trainer.py:903-913)
            self.transfer_loader = self._try_transfer(
                data_loader.create_locobot_transfer_loader
            )
            return data_loader.create_robonet_loaders(cfg)
        if exp == "train_sawyer_multiview":
            # zero-shot transfer on the held-out sudri2_c1 viewpoint
            # (trainer.py:915-925)
            self.transfer_loader = self._try_transfer(
                data_loader.create_sawyer_transfer_loader
            )
            return data_loader.create_sawyer_loaders(cfg)
        if exp == "finetune_sawyer_view":
            return data_loader.create_sawyer_finetune_loaders(cfg)
        if exp == "finetune_widowx":
            return data_loader.create_widowx_finetune_loaders(cfg)
        if exp == "train_locobot_singleview":
            return data_loader.create_locobot_loaders(cfg)
        if exp == "finetune_locobot":
            return data_loader.create_locobot_finetune_loaders(cfg)
        if exp == "train_locobot_table":
            return data_loader.create_locobot_table_loaders(cfg)
        if exp == "train_locobot_pick":
            return data_loader.create_locobot_pick_loaders(cfg)
        if "finetune" in exp:
            return data_loader.create_finetune_loaders(cfg)
        train, test = data_loader.create_loaders(cfg)
        self.transfer_loader = self._try_transfer(
            data_loader.create_transfer_loader
        )
        return train, test

    def _try_transfer(self, factory):
        try:
            return factory(self.cfg)
        except FileNotFoundError:
            self.logger.info(
                f"no transfer data for {factory.__name__}; skipping "
                "transfer eval"
            )
            return None

    # ------------------------------------------------------------------
    def _sched_prob(self) -> float:
        """Probability of feeding ground truth (trainer.py:132-139)."""
        if not self.cfg.scheduled_sampling:
            return 1.0
        k = float(self.cfg.scheduled_sampling_k)
        return k / (k + float(np.exp(min(self._step / k, 50.0))))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _window(self, batch: Dict, s: int, e: int) -> Dict:
        out = {}
        for k in _WINDOW_KEYS:
            if k in batch:
                out[k] = batch[k][s:e]
        out["actions"] = batch["actions"][s:e - 1]
        if "high_movement" in batch:
            out["batch_weight"] = np.where(
                np.asarray(batch["high_movement"]), self.cfg.movement_weight, 1.0
            ).astype(np.float32)
        return out

    def _apply_robot_model(self, window: Dict, batch: Dict) -> Dict:
        """Replace masks/states with robot-model predictions on the finetune
        path (trainer.py:294-319). Keeps true masks for eval metrics."""
        cfg = self.cfg
        data = {
            "states": jnp.asarray(window["states"]),
            "qpos": jnp.asarray(window["qpos"]),
            "actions": jnp.asarray(window["actions"]),
            "low": jnp.asarray(batch["low"]),
            "high": jnp.asarray(batch["high"]),
        }
        if self.learned_robot is not None:
            states, masks = self.learned_robot["fn"](
                self.learned_robot["joint"], self.learned_robot["grip"],
                data["states"][0], data["qpos"][0], data["actions"],
            )
        else:
            states, masks = self.robot_model.predict_batch(data)
        out = dict(window)
        out["pred_masks"] = masks
        out["states"] = states
        out["masks_model_input"] = masks
        if cfg.model_use_heatmap:
            # heatmaps re-derived from the predicted states
            # (reference: trainer.py:205-231 heatmap branch)
            from robot_aware_control_tpu.data.heatmaps import create_heatmaps

            s = np.asarray(states)
            low = np.asarray(batch["low"])
            high = np.asarray(batch["high"])
            robots = batch.get("robot", ["locobot"] * s.shape[1])
            folders = batch.get("folder", ["c0"] * s.shape[1])
            hms = np.stack([
                create_heatmaps(
                    s[:, b], low[b], high[b], robots[b], folders[b],
                    (cfg.image_width, cfg.image_height),
                )
                for b in range(s.shape[1])
            ], axis=1)
            out["heatmaps"] = hms
        return out

    def _device_batch(self, window: Dict) -> Dict:
        # jax.Arrays (from device_prefetch) pass through untouched — an
        # np.asarray here would download every video to host and re-upload
        # it (~50-170 ms per sync through the TPU tunnel)
        arrs = {k: (v if isinstance(v, jax.Array) else np.asarray(v))
                for k, v in window.items() if not isinstance(v, (list, str))}
        if self.mesh is not None:
            return pmesh.shard_batch(self.mesh, arrs, batch_axis_index=1,
                                     axis=self._mesh_axis_names[0])
        return {k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
                for k, v in arrs.items()}

    # ------------------------------------------------------------------
    def _train_video(self, batch: Dict) -> Dict[str, float]:
        """Slice a video batch into train windows (trainer.py:259-324).

        The whole video uploads to the device ONCE and the windows are
        sliced on device: per-window uploads pay the tunnel/PCIe transfer
        latency `num` times for the same bytes (measured 48 -> ~180 f/s
        through the axon tunnel). The robot-model finetune path keeps
        per-window host slicing (masks are produced host-side there)."""
        cfg = self.cfg
        T = len(batch["images"])
        window = cfg.n_past + cfg.n_future
        num = max(T // window, 1)
        agg = defaultdict(float)
        host_path = (
            self.robot_model is not None or self.learned_robot is not None
        )
        dev_video = None
        if not host_path:
            full = {k: batch[k] for k in _WINDOW_KEYS
                    if k in batch and k != "qpos"}
            full["actions"] = batch["actions"]
            if "high_movement" in batch:
                # jnp.where keeps prefetched device arrays on device (and
                # inherits their sharding); host np inputs stay host-side
                # numpy until _device_batch uploads them
                hm = batch["high_movement"]
                if isinstance(hm, jax.Array):
                    full["batch_weight"] = jnp.where(
                        hm, self.cfg.movement_weight, 1.0
                    ).astype(jnp.float32)
                else:
                    full["batch_weight"] = np.where(
                        np.asarray(hm), self.cfg.movement_weight, 1.0
                    ).astype(np.float32)
            dev_video = self._device_batch(full)
        for i in range(num):
            if cfg.random_snippet and T > window:
                s = self._video_rng.randint(0, T - window + 1)
            else:
                s = i * window
            if dev_video is not None:
                dev = {
                    k: (v[s:s + window] if k in _WINDOW_KEYS
                        else v[s:s + window - 1] if k == "actions" else v)
                    for k, v in dev_video.items()
                }
            else:
                w = self._window(batch, s, s + window)
                w = self._apply_robot_model(w, batch)
                w["masks"] = w.pop("masks_model_input")
                w.pop("pred_masks", None)
                w.pop("qpos", None)
                dev = self._device_batch(w)
            self.params, self.bn, self.opt_state, metrics = self.train_step(
                self.params, self.bn, self.opt_state, dev,
                self._next_key(), jnp.float32(self._sched_prob()),
            )
            self._step += 1
            # accumulate ON DEVICE — a float() here would force a host
            # round-trip per window (very expensive through the TPU tunnel);
            # the epoch loop syncs once per epoch
            for k, v in metrics.items():
                agg[k] = agg[k] + v / num if k in agg else v / num
        return dict(agg)

    # ------------------------------------------------------------------
    def _eval_video(self, batch: Dict, autoregressive=True) -> Dict[str, float]:
        """Eval over n_eval windows, best-of-3 prior samples for svg
        finetune (trainer.py:491-563)."""
        cfg = self.cfg
        T = len(batch["images"])
        window = cfg.n_eval
        num = max(T // window, 1)
        num_samples = (
            3 if autoregressive and cfg.model == "svg"
            and "finetune" in cfg.experiment else 1
        )
        samples = [defaultdict(float) for _ in range(num_samples)]
        step_fn = self.eval_step_ar if autoregressive else self.eval_step_1
        for i in range(num):
            s = i * window
            if s + window > T:
                break
            w = self._window(batch, s, s + window)
            if self.robot_model is not None or self.learned_robot is not None:
                w = self._apply_robot_model(w, batch)
                w.pop("masks_model_input", None)
            w.pop("qpos", None)
            dev = self._device_batch(w)
            for n in range(num_samples):
                per_step, _ = step_fn(self.params, self.bn, dev, self._next_key())
                # accumulate on device; sync once per video below
                for k, v in per_step.items():
                    samples[n][k] = samples[n].get(k, 0.0) + jnp.mean(v) / num
        synced = [
            {k: float(v) for k, v in s.items()} for s in samples
        ]
        synced.sort(key=lambda d: d.get("psnr", 0.0), reverse=True)
        return synced[0]

    def _eval_epoch(self, test_iter, num_batches: int = 0,
                    prefix: str = "eval/"):
        """Epoch metrics over the eval iterator. `num_batches` caps the
        batches (0 = cfg.eval_batches; cfg 0 = the FULL set, matching the
        reference's whole-set eval, trainer.py:467-489; -1 = force the
        full set regardless of cfg — the copy baseline's scope)."""
        cap = self.cfg.eval_batches if num_batches == 0 else max(num_batches, 0)
        agg = defaultdict(float)
        n = 0
        for batch in test_iter:
            for mode, tag in ((False, "1step_"), (True, "autoreg_")):
                m = self._eval_video(batch, autoregressive=mode)
                for k, v in m.items():
                    agg[f"{tag}{k}"] += v
            n += 1
            if cap and n >= cap:
                break
        return {k: v / max(n, 1) for k, v in agg.items()}, n

    def _plot_eval(self, batch: Dict, epoch: int, tag: str = "eval"):
        cfg = self.cfg
        T = len(batch["images"])
        if T < cfg.n_eval:
            return
        w = self._window(batch, 0, cfg.n_eval)
        w.pop("qpos", None)
        dev = self._device_batch(w)
        _, preds = self.eval_step_ar(self.params, self.bn, dev, self._next_key())
        path = eval_gif(
            os.path.join(self.log_dir, f"{tag}_{epoch}.gif"),
            np.asarray(w["images"][1:]), np.asarray(preds),
            masks=np.asarray(w["masks"][1:]),
        )
        if path:
            self.logger.video(path, self._step, key=f"{tag}/rollout")

    # ------------------------------------------------------------------
    def _save(self, epoch: int):
        trees = {"params": self.params, "bn": self.bn, "opt": self.opt_state}
        # multi-host runs need the coordinated orbax writer (each host
        # persists its own shards); single-host keeps the flat .npz
        if self.cfg.sharded_checkpoint or jax.process_count() > 1:
            path = ckpt.save_checkpoint_sharded(self.log_dir, self._step, trees)
        else:
            path = ckpt.save_checkpoint(
                self.log_dir, self._step, trees,
                background=self.cfg.async_checkpoint,
            )
        self.logger.info(f"saved checkpoint {path} (epoch {epoch})")

    def _resume(self):
        path = ckpt.latest_checkpoint(self.log_dir)
        if path is None:
            return
        templates = {"params": self.params, "bn": self.bn, "opt": self.opt_state}
        trees, step = ckpt.load_checkpoint(path, templates)
        self.params, self.bn, self.opt_state = (
            trees["params"], trees["bn"], trees["opt"],
        )
        self._step = step
        spv = max(
            (self.cfg.video_length // (self.cfg.n_past + self.cfg.n_future)), 1
        )
        self._start_epoch = step // max(self.cfg.epoch_size * spv, 1)
        self.logger.info(f"auto-resumed from {path} at step {step}")

    def load_checkpoint(self, path: str, finetune: bool = False):
        """Explicit load; finetune skips optimizer and resets step
        (trainer.py:892-896)."""
        templates = {"params": self.params, "bn": self.bn}
        if not finetune:
            templates["opt"] = self.opt_state
        trees, step = ckpt.load_checkpoint(path, templates)
        self.params, self.bn = trees["params"], trees["bn"]
        if not finetune:
            self.opt_state = trees["opt"]
            self._step = step

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        if cfg.model == "copy":
            return self.copy_baseline()
        train_loader, test_loader = self._setup_data()
        if cfg.dynamics_model_ckpt:
            self.load_checkpoint(
                cfg.dynamics_model_ckpt, finetune="finetune" in cfg.experiment
            )
        self._resume()
        train_iter = (
            train_loader.infinite() if hasattr(train_loader, "infinite")
            else iter(train_loader)
        )
        # overlap host decode + device upload with compute (double
        # buffering); the finetune robot-model path keeps host batches
        # since it renders masks host-side per window
        if self.robot_model is None and self.learned_robot is None:
            from robot_aware_control_tpu.data.loader import device_prefetch

            # mesh-aware: under multi-process JAX shard_batch assembles the
            # host-local batches into global arrays (make_global_batch)
            train_iter = device_prefetch(train_iter, mesh=self.mesh)
        import time as _time

        window = cfg.n_past + cfg.n_future
        for epoch in range(self._start_epoch, cfg.niter):
            epoch_metrics = {}
            device_agg = {}
            t_epoch = _time.perf_counter()
            for b in range(cfg.epoch_size):
                batch = next(train_iter)
                metrics = self._train_video(batch)
                for k, v in metrics.items():
                    device_agg[k] = (
                        device_agg[k] + v if k in device_agg else v
                    )
            # ONE host sync per epoch (forces all queued device work)
            for k, v in device_agg.items():
                epoch_metrics[k] = float(v) / cfg.epoch_size
            dt = _time.perf_counter() - t_epoch
            B = batch["images"].shape[1]
            spv = max(len(batch["images"]) // window, 1)
            epoch_metrics["frames_per_sec"] = (
                cfg.epoch_size * B * window * spv / dt
                / max(len(jax.devices()), 1)
            )
            self.logger.scalars(epoch_metrics, self._step, prefix="train/")
            self.logger.info(
                f"epoch {epoch} step {self._step} "
                + " ".join(f"{k}={v:.4f}" for k, v in epoch_metrics.items())
            )
            if (epoch + 1) % cfg.checkpoint_interval == 0:
                self._save(epoch)
            if (epoch + 1) % cfg.eval_interval == 0:
                ev, _ = self._eval_epoch(iter(test_loader))
                self.logger.scalars(ev, self._step, prefix="eval/")
                self.logger.info(
                    "eval " + " ".join(f"{k}={v:.4f}" for k, v in ev.items())
                )
                if self.transfer_loader is not None:
                    tv, _ = self._eval_epoch(iter(self.transfer_loader))
                    self.logger.scalars(tv, self._step, prefix="transfer/")
                try:
                    self._plot_eval(next(iter(test_loader)), epoch)
                except StopIteration:
                    pass
        self._save(cfg.niter - 1)
        ckpt.wait_for_checkpoints()  # join background npz writers
        return self.params

    # ------------------------------------------------------------------
    def copy_baseline(self):
        """CopyModel world-error floor at full reference scope
        (trainer.py:794-827): FULL-epoch metrics over train + test (+
        transfer for the multiview/robonet experiments), the same
        1step_/autoreg_ recon/robot/world/psnr/ssim keys as learned-model
        eval, one rollout gif per split, and each split's metrics logged at
        step 0 AND a large step so dashboards draw the horizontal
        floor line the reference draws (trainer.py:815-827)."""
        cfg = self.cfg
        train_loader, test_loader = self._setup_data()
        results = {}
        splits = [("train", train_loader), ("test", test_loader)]
        if self.transfer_loader is not None:
            splits.append(("transfer", self.transfer_loader))
        for name, loader in splits:
            metrics, n = self._eval_epoch(iter(loader), num_batches=-1)
            self.logger.scalars(metrics, 0, prefix=f"{name}/")
            self.logger.scalars(metrics, 500000, prefix=f"{name}/")
            self.logger.info(
                f"copy baseline [{name}] ({n} batches) "
                + " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
            )
            try:
                self._plot_eval(next(iter(loader)), 0, tag=name)
            except StopIteration:
                pass
            results[name] = metrics
        return results


def main(argv=None):
    cfg, unparsed = argparser(argv)
    if unparsed:
        raise ValueError(f"unknown flags: {unparsed}")
    trainer = PredictionTrainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
