"""TPU-native Robot-Aware Control (RAC) framework.

A ground-up JAX/XLA/Pallas re-design of the visual model-based RL stack from
`penn-pal-lab/robot_aware_control` (ICLR 2022, "Know Thyself"): SVG-style
stochastic video prediction with robot-aware don't-care losses, modular
robot/world dynamics, and an on-device CEM visual-MPC planner.

Layout:
  config      argparse-compatible immutable configuration
  ops         functional NN layers, losses, metrics (NHWC, pytree params)
  models      video-prediction model families (SVG conv, deterministic, copy,
              vector LSTM, robot MLPs)
  data        RoboNet HDF5 pipeline + synthetic fixtures + device prefetch
  robot       analytic IK / FK / on-device capsule mask renderer
  training    jitted scan train/eval steps, checkpointing, trainer loop
  planning    on-device CEM with robot/world decomposed costs (learned + gt)
  parallel    mesh + sharding rules (data parallel over ICI)
  envs        JAX-native task environments (pure physics + analytic renderer)
  control     episode runners and the real-robot visual-MPC controller
  evaluation  checkpoint eval, FVD, obj-movement metadata, debug tools
  baselines   CycleGAN domain transfer
"""

__version__ = "0.1.0"

from robot_aware_control_tpu.config import Config, argparser  # noqa: F401
