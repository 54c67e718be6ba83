"""Configuration system for the TPU-native Robot-Aware Control framework.

Mirrors the reference flag surface (reference: src/config/__init__.py:23-365)
so users of the original argparse CLI find every flag name unchanged, but the
canonical representation is an immutable dataclass that can be closed over by
jitted step functions (static configuration -> zero recompiles at runtime).

Flag groups (reference: src/config/__init__.py):
  - job/logging flags          (:32-38)
  - method flags               (:45-104)
  - env-specific groups        (:108-148)
  - prediction (SVG) flags     (:151-249)
  - dataset flags              (:252-309)
  - CEM flags                  (:315-340)
  - cost flags                 (:346-357)
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


def str2intlist(value):
    if not value:
        return ()
    if isinstance(value, (list, tuple)):
        return tuple(int(v) for v in value)
    return tuple(int(num) for num in value.split(","))


@dataclass(frozen=True)
class Config:
    """Immutable run configuration.

    Field names deliberately match the reference CLI flags
    (reference: src/config/__init__.py) so configs serialize 1:1.
    """

    # --- job / logging (reference :32-38) ---
    jobname: Optional[str] = None
    log_dir: str = "logs"
    wandb: bool = False
    wandb_entity: str = "pal"
    wandb_project: str = "roboaware"
    wandb_group: Optional[str] = None
    wandb_job_type: Optional[str] = None

    # --- method (reference :45-86) ---
    reward_type: str = "weighted"  # weighted|dense|inpaint|sparse|blackrobot|inpaint-blur|eef_inpaint|dontcare
    most_recent_background: bool = False
    blur_sigma: float = 10.0
    unblur_cost_scale: float = 3.0
    unblur_timestep: float = 1.0
    mbrl_algo: str = "cem"
    gpu: Optional[int] = None
    seed: int = 0
    num_episodes: int = 100
    record_trajectory: bool = False
    record_trajectory_interval: int = 5
    record_video_interval: int = 1
    env: str = "FetchPush"  # FetchPush|LocobotTable|LocobotPick

    # --- prediction / SVG (reference :151-249) ---
    lr: float = 0.0003
    beta1: float = 0.9
    batch_size: int = 100
    test_batch_size: int = 16
    optimizer: str = "adam"
    niter: int = 300
    epoch_size: int = 600
    image_width: int = 64
    image_height: int = 48
    channels: int = 3
    dataset: str = "smmnist"
    n_past: int = 1
    n_future: int = 9
    n_eval: int = 10
    checkpoint_interval: int = 5
    eval_interval: int = 5
    # eval batches per epoch metric pass; 0 = the full eval set (the
    # reference evaluates the whole set, trainer.py:467-489)
    eval_batches: int = 0
    rnn_size: int = 256
    prior_rnn_layers: int = 2
    posterior_rnn_layers: int = 2
    predictor_rnn_layers: int = 2
    z_dim: int = 10
    g_dim: int = 128
    action_dim: int = 2
    action_enc_dim: int = 2
    robot_dim: int = 6
    robot_enc_dim: int = 6
    robot_joint_dim: int = 7
    beta: float = 0.0001
    last_frame_skip: bool = False
    model: str = "svg"  # svg|det|copy|cdna_det
    model_use_mask: bool = False
    model_use_future_mask: bool = False
    model_use_robot_state: bool = True
    model_use_future_robot_state: bool = False
    model_use_heatmap: bool = False
    model_use_future_heatmap: bool = False
    black_robot_input: bool = False
    reconstruction_loss: str = "mse"  # mse|l1|dontcare_mse|dontcare_l1
    scheduled_sampling: bool = False
    scheduled_sampling_k: int = 4000
    robot_pixel_weight: float = 0.0
    learned_robot_model: bool = False
    robot_model_ckpt: Optional[str] = None
    cdna_kernel_size: int = 5
    lstm_group_norm: bool = False
    # TPU-only: fused Pallas ConvLSTM cells on inference paths (planning /
    # eval). Training keeps the XLA cells (the fused cell has no VJP).
    fused_lstm: bool = True
    # int8 MXU planning path (none|int8): quantize the rollout convs for
    # CEM — forward-only, 2x FLOP ceiling on v5e (ops/quant.py). No
    # reference analogue; OFF by default.
    plan_quantize: str = "none"
    # planning-as-a-service endpoint (control/plan_server.py): one warm
    # compiled CEM program on the TPU host, robot clients over TCP
    plan_server_host: str = "127.0.0.1"
    plan_server_port: int = 0
    # orbax directory checkpoints (auto-enabled under multi-process JAX)
    sharded_checkpoint: bool = False
    sample_mean: bool = False
    multiview: bool = False
    dropout: Optional[float] = None

    # Correctness deviation from the reference: the reference's posterior
    # accidentally encodes the *current* frame instead of the next frame
    # (reference: src/prediction/models/dynamics.py:619 re-encodes `img`).
    # We default to the standard SVG-LP semantics (posterior sees the next
    # frame); set True to emulate the reference's behavior.
    posterior_use_current_frame: bool = False

    # --- dataset (reference :252-309) ---
    data_threads: int = 5
    data_root: str = "data"
    train_val_split: float = 0.8
    temporal_beta: float = 1.0
    demo_length: int = 12
    action_noise: float = 0.0
    video_type: str = "object_inpaint_demo"
    video_length: int = 31
    impute_autograsp_action: bool = True
    preload_ram: bool = False
    experiment: str = "train_robonet"
    preprocess_action: str = "raw"  # raw|camera_raw|state_infer|camera_state_infer
    img_augmentation: bool = False
    color_jitter_range: float = 0.1
    random_crop_size: int = 59
    world_error_dict: Optional[str] = None
    finetune_num_train: int = 400
    finetune_num_test: int = 100
    random_snippet: bool = True
    load_movement_info: bool = False
    movement_weight: float = 1.0

    # --- CEM (reference :315-340) ---
    horizon: int = 5
    opt_iter: int = 10
    action_candidates: int = 30
    topk: int = 5
    replan_every: int = 1
    dynamics_model_ckpt: Optional[str] = None
    candidates_batch_size: int = 200
    use_env_dynamics: bool = False
    debug_trajectory_path: Optional[str] = None
    debug_cem: bool = False
    object_demo_dir: Optional[str] = None
    subgoal_start: int = 0
    sequential_subgoal: bool = True
    # advance a pending subgoal after this many executed steps even if the
    # cost thresholds haven't passed (0 = threshold-only, the reference
    # behavior). Keeps demo-seeded manipulation on the demo's cadence when
    # a threshold stalls (e.g. contact slows the eef mid-grasp).
    subgoal_step_limit: int = 0
    demo_cost: bool = False
    demo_timescale: int = 1
    action_repeat: int = 1
    demo_type: str = "object_only_demo"
    cem_init_std: float = 1.0
    # pick CEM, demo-seeded: False (default) keeps exploration local around
    # the demo seed; True applies the reference's unseeded wide-x scheme
    # (pick/cem.py:66-74 x-std 0.2, gripper std 0.005) even when seeded.
    # benchmarks/pick_std_ablation.py measures the two head-to-head.
    pick_wide_x_std: bool = False
    sparse_cost: bool = False
    cem_open_loop: bool = False
    # NOTE: the reference declares this flag default-False but its sampler
    # hardcodes thick=True (trajectory_sampler.py:107) — the flag is a no-op
    # there. Here it really controls the planner's mask thickness, with the
    # default set to the reference's ACTUAL behavior (thick).
    cem_prediction_use_thick_mask: bool = True

    # --- cost (reference :346-357) ---
    world_cost_success: float = 4000.0
    robot_cost_success: float = 0.01
    robot_cost_weight: float = 0.0
    world_cost_weight: float = 1.0
    img_cost_threshold: Optional[float] = None
    img_cost_world_norm: bool = True
    subgoal_completion_bonus: float = 0.0

    # --- env-specific (reference :108-148) ---
    img_dim: int = 128
    camera_name: str = "external_camera_0"
    camera_ids: Tuple[int, ...] = (0, 4)
    pixels_ob: bool = True
    norobot_pixels_ob: bool = False
    robot_mask_with_obj: bool = False
    inpaint_eef: bool = True
    depth_ob: bool = False
    object_dist_threshold: float = 0.01
    gripper_dist_threshold: float = 0.025
    push_dist: float = 0.2
    max_episode_length: int = 10
    robot_goal_distribution: str = "random"
    large_block: bool = False
    red_robot: bool = False
    invisible_demo: bool = False
    demo_dir: str = "demos/fetch_push"
    modified: bool = False
    cyclegan: bool = False
    cyclegan_ckpt: Optional[str] = None
    goal_image_type: str = "image"

    # --- TPU-native additions (no reference equivalent) ---
    # Compute dtype for conv/matmul activations. Params stay float32.
    compute_dtype: str = "bfloat16"  # float32|bfloat16
    # Data-parallel device count hint; 0 = use all local devices.
    num_devices: int = 0
    # Mesh axis names for (data, model) parallelism.
    mesh_axes: Tuple[str, ...] = ("data",)
    # Tensor-parallel degree: >1 builds a 2-D (data, model) mesh and
    # channel-shards params over the "model" axis (parallel/mesh.py).
    model_axis_size: int = 1
    # Where params + optimizer state live on the mesh:
    #   replicated — every chip holds a full copy (pure DP, default)
    #   model      — trailing/output-channel axis sharded over "model"
    #                (tensor parallelism; requires model_axis_size > 1)
    #   data       — trailing axis sharded over "data" (FSDP-style: 1/n
    #                param+Adam HBM per chip, XLA all-gathers at use)
    param_sharding: str = "replicated"  # replicated|model|data
    # data.collect CLI: what to write — training hdf5s into data_root,
    # episode-runner demos (demo_io format) into demo_dir, or both.
    collect_target: str = "train"  # train|demos|both
    # Write npz checkpoints on a background thread: device->host copies
    # are batch-initiated up front, the trainer only blocks for the
    # materialize, and disk IO overlaps the next training steps.
    async_checkpoint: bool = True
    # Rematerialize encoder/decoder activations inside the time scan.
    remat: bool = False
    # Remat granularity: "full" recomputes the whole per-step forward in
    # the backward pass (min HBM, +~1 fwd of FLOPs); "conv" saves every
    # conv/dot output and recomputes only the cheap elementwise chains
    # between them (near-no-remat FLOPs at a fraction of full-save HBM).
    remat_policy: str = "full"  # full|conv
    # Metres of eef displacement per unit action for the ANALYTIC robot
    # model inside planner rollouts. The reference's robonet actions are
    # metric displacements (scale 1.0); the bundled JAX envs emit [-1,1]
    # actions scaled by 0.05 inside the env (envs/base.py:ACTION_SCALE) —
    # set 0.05 when planning against data collected from them.
    eef_action_scale: float = 1.0

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def feat_height(self) -> int:
        return self.image_height // 8

    @property
    def feat_width(self) -> int:
        return self.image_width // 8

    @property
    def enc_channels(self) -> int:
        """Encoder input channel count (reference: dynamics.py:476-486)."""
        c = self.channels
        if self.model_use_mask:
            c += 1
            if self.model_use_future_mask:
                c += 1
        if self.model_use_heatmap:
            c += 1
            if self.model_use_future_heatmap:
                c += 1
        return c

    @property
    def dontcare(self) -> bool:
        return "dontcare" in self.reconstruction_loss or self.black_robot_input


_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(Config) if f.type in ("bool", bool)
}


def create_parser() -> argparse.ArgumentParser:
    """Builds an argparse parser whose flags mirror the reference CLI
    (reference: src/config/__init__.py:23-365). Every Config field becomes
    `--<name>`; booleans accept true/false strings like the reference's
    str2bool."""
    parser = argparse.ArgumentParser(
        "Robot Aware Cost (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else f.default_factory()  # type: ignore[misc]
        )
        if f.name in _BOOL_FIELDS:
            parser.add_argument(name, type=str2bool, default=default)
        elif f.name == "camera_ids":
            parser.add_argument(name, type=str2intlist, default=default)
        elif f.type in ("int", int):
            parser.add_argument(name, type=int, default=default)
        elif f.type in ("float", float):
            parser.add_argument(name, type=float, default=default)
        elif f.type in ("Optional[float]",):
            parser.add_argument(name, type=float, default=default)
        elif f.type in ("Optional[int]",):
            parser.add_argument(name, type=int, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def argparser(argv=None) -> Tuple[Config, list]:
    """Parse CLI args into a Config (reference: src/config/__init__.py:360-365)."""
    parser = create_parser()
    args, unparsed = parser.parse_known_args(argv)
    cfg = Config(**vars(args))
    return cfg, unparsed


def from_yaml(path: str, **overrides) -> Config:
    """Load a Config from a YAML mapping (reference: the vendored robonet
    YAML/HParams configs, robonet/robonet/yaml_util.py). Unknown keys are
    rejected; kwargs override file values."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    fields = {f.name for f in dataclasses.fields(Config)}
    unknown = set(data) - fields
    if unknown:
        raise KeyError(f"unknown config keys in {path}: {sorted(unknown)}")
    data.update(overrides)
    return Config(**data)


def to_yaml(cfg: Config, path: str):
    """Serialize a Config to YAML (round-trips with from_yaml)."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(
            {k: (list(v) if isinstance(v, tuple) else v)
             for k, v in dataclasses.asdict(cfg).items()},
            f, sort_keys=True,
        )


# ---------------------------------------------------------------------------
# Documented flag descopes. Every Config field must either be consumed
# somewhere outside this module or appear here with a reason — enforced by
# tests/test_config_yaml_vis.py::test_every_flag_consumed_or_descoped, so no
# flag can silently become a no-op (the reference has several such flags;
# see the per-entry notes).
DESCOPED_FLAGS = {
    "gpu": (
        "CUDA device ordinal. Device selection here is JAX-native: backend "
        "via jax_platform / JAX config, chip count via --num_devices and "
        "the mesh flags. Kept for CLI compatibility with the reference "
        "(src/config/__init__.py --gpu); accepted and ignored."
    ),
}
