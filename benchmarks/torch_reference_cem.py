"""Measure the PyTorch reference's CEM planning + training throughput.

This is the "first deliverable of the benchmark harness" from BASELINE.md:
the reference publishes no numbers, so the vs_baseline denominator used by
bench.py must be *measured* from the reference implementation itself
(imported from /root/reference — never copied).

What the reference does per CEM plan (canonical config: N=100 candidates,
horizon T=5, opt_iter=10, candidates_batch_size=200 -> one chunk,
src/config/__init__.py:315-340):

  per opt iteration (x10), generate_model_rollouts
  (src/cem/trajectory_sampler.py:36-199):
    host side (src/dataset/locobot/locobot_model.py:104-140):
      serial Python loop over all N candidates:
        T x scalar analytic IK        (locobot_analytical_ik.py)
        (T+1) x MuJoCo mask render    (masks/base_mask_env.py:73-82: set
                                       qpos, mj_forward, segmentation render
                                       at 48x64)
        (T+1) x torchvision ToTensor+Resize on the mask
    device side:
      T x SVGConvModel.forward at batch N (fp32, eval, no_grad)
      (trajectory_sampler.py:123-174)

This script measures each component on THIS host:
  * model forward: the actual reference SVGConvModel on CPU torch
  * IK: the actual reference AnalyticInverseKinematics
  * mask render: MuJoCo 3 (EGL) segmentation render of the reference's own
    locobot.xml at 48x64, replicating base_mask_env.generate_masks (the
    reference used mujoco_py; both are the same C engine + GL render path)
  * transform: float conversion + (no-op) bilinear resize, standing in for
    torchvision ToTensor+Resize (torchvision is not installed here)

and composes two denominators (rollouts/sec, where one rollout = one
candidate propagated over the full horizon, i.e. N*opt_iter per plan):

  reference_cpu_rps    — everything measured on this host's CPU.
  reference_a100_rps   — host-side parts as measured (they are CPU/GL-bound
                         and identical in kind on a GPU workstation); the
                         model-forward term replaced by an OPTIMISTIC A100
                         estimate: model FLOPs / (A100_EFF_TFLOPS effective).
                         A100 TF32 peak is 156 TFLOP/s; eager-mode fp32/TF32
                         torch conv stacks at these small shapes reach a
                         fraction of that — we credit 60 TFLOP/s effective,
                         which is deliberately GENEROUS to the reference (it
                         makes OUR vs_baseline smaller).

Run:  python benchmarks/torch_reference_cem.py [--quick]
Prints a JSON dict of all measured components and composed numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"

# canonical CEM config (reference src/config/__init__.py:315-340 + cem demo
# src/cem/cem.py:184 model config: g_dim 256, z_dim 64)
N_CANDIDATES = 100
HORIZON = 5
OPT_ITER = 10
G_DIM, Z_DIM = 256, 64

A100_EFF_TFLOPS = 60.0  # generous effective throughput for eager torch TF32


class _RefCfg:
    channels = 3
    g_dim = G_DIM
    z_dim = Z_DIM
    action_dim = 5
    robot_dim = 5
    image_height = 48
    image_width = 64
    model_use_mask = True
    model_use_future_mask = True
    model_use_heatmap = False
    model_use_future_heatmap = False
    model_use_robot_state = True
    model_use_future_robot_state = False
    lstm_group_norm = False
    last_frame_skip = True
    batch_size = N_CANDIDATES
    multiview = False


def measure_model_forward(torch, n_timed):
    """Reference SVGConvModel.forward at B=N_CANDIDATES, eval/no_grad fp32."""
    sys.path.insert(0, REF)
    try:
        from src.prediction.models.dynamics import SVGConvModel
    finally:
        sys.path.remove(REF)
    cfg = _RefCfg()
    cfg.device = torch.device("cpu")
    torch.manual_seed(0)
    model = SVGConvModel(cfg).eval()
    B = N_CANDIDATES
    img = torch.rand(B, 3, 48, 64)
    mask = torch.rand(B, 2, 48, 64)
    robot = torch.rand(B, 5)
    action = torch.rand(B, 5)
    with torch.no_grad():
        model.init_hidden(B)
        model.forward(img, mask, robot, None, action, sample_mean=True)  # warm
        t0 = time.perf_counter()
        for _ in range(n_timed):
            model.forward(img, mask, robot, None, action, sample_mean=True)
        dt = (time.perf_counter() - t0) / n_timed
    return dt, model


def model_flops_per_forward():
    """FLOPs of one SVGConvModel.forward at B=100 (planning path: encoder,
    prior stack, frame stack, decoder, input convs; no posterior)."""
    B, H, W = N_CANDIDATES, 48, 64
    fh, fw = H // 8, W // 8
    g = G_DIM

    def conv(h, w, k, cin, cout):
        return 2 * B * h * w * k * k * cin * cout

    enc = (
        conv(H, W, 3, 5, 64) + conv(H, W, 3, 64, 64)
        + conv(H // 2, W // 2, 3, 64, 128) + conv(H // 2, W // 2, 3, 128, 128)
        + conv(H // 4, W // 4, 3, 128, 256) + 2 * conv(H // 4, W // 4, 3, 256, 256)
        + conv(fh, fw, 3, 256, 512) + conv(fh, fw, 3, 512, 512)
        + conv(fh, fw, 3, 512, g)
    )
    dec = (
        conv(fh, fw, 3, g, 512) + conv(fh, fw, 3, 512, 512) + conv(fh, fw, 3, 512, 256)
        + conv(H // 4, W // 4, 3, 512, 256) + conv(H // 4, W // 4, 3, 256, 256)
        + conv(H // 4, W // 4, 3, 256, 128)
        + conv(H // 2, W // 2, 3, 256, 128) + conv(H // 2, W // 2, 3, 128, 64)
        + conv(H, W, 3, 128, 64) + conv(H, W, 3, 64, 4)
    )
    stack = conv(fh, fw, 5, 2 * g, 4 * g) + conv(fh, fw, 3, 2 * g, 4 * g)
    heads = 2 * conv(fh, fw, 3, g, Z_DIM)
    in_convs = conv(fh, fw, 3, g + 5 + 5 + Z_DIM, g) + conv(fh, fw, 3, g + 5 + 5, g)
    return enc + dec + 2 * stack + heads + in_convs


def measure_ik(n=500):
    sys.path.insert(0, REF)
    try:
        from src.env.robotics.masks.locobot_analytical_ik import (
            AnalyticInverseKinematics,
        )
    finally:
        sys.path.remove(REF)
    ik = AnalyticInverseKinematics()
    rng = np.random.RandomState(0)
    pts = rng.uniform([0.2, -0.2, 0.15], [0.4, 0.2, 0.15], size=(n, 3))
    ik.ik(pts[0], alpha=-1.3, cur_arm_config=np.zeros(4))
    t0 = time.perf_counter()
    for p in pts:
        ik.ik(p, alpha=-1.3, cur_arm_config=np.zeros(4))
    return (time.perf_counter() - t0) / n


def measure_mask_render(n=200):
    """Replicates base_mask_env.generate_masks per-frame work with mujoco 3."""
    os.environ.setdefault("MUJOCO_GL", "egl")
    import mujoco

    xml = os.path.join(REF, "src/env/robotics/assets/locobot/locobot.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    r = mujoco.Renderer(m, height=48, width=64)
    r.enable_segmentation_rendering()
    joints = [f"joint_{i}" for i in range(1, 6)]
    adr = [m.joint(j).qposadr[0] for j in joints]
    rng = np.random.RandomState(0)
    qs = rng.uniform(-0.5, 0.5, size=(n, 5))

    def render_one(q):
        d.qpos[adr] = q
        mujoco.mj_forward(m, d)
        r.update_scene(d, camera="main_cam")
        seg = r.render()
        return seg[:, :, 0] != -1

    render_one(qs[0])
    t0 = time.perf_counter()
    for q in qs:
        render_one(q)
    return (time.perf_counter() - t0) / n


def measure_transform(torch, n=1000):
    """ToTensor + Resize((48,64)) stand-in (torchvision absent)."""
    import torch.nn.functional as F

    mask = (np.random.rand(48, 64) > 0.5)
    t0 = time.perf_counter()
    for _ in range(n):
        t = torch.from_numpy(mask.astype(np.float32))[None, None]
        t = F.interpolate(t, size=(48, 64), mode="bilinear", align_corners=False)
        t = t.bool().float()
    return (time.perf_counter() - t0) / n


def measure_train_step(torch, n_timed):
    """Reference train step (fwd+recon/KL loss+bwd) at the canonical train
    config (batch 16, window n_past 1 + n_future 5, g_dim 512 — README:99).
    Returns seconds per window-step and frames/step."""
    sys.path.insert(0, REF)
    try:
        from src.prediction.models.dynamics import SVGConvModel
    finally:
        sys.path.remove(REF)

    class TrainCfg(_RefCfg):
        g_dim = 512
        batch_size = 16

    cfg = TrainCfg()
    cfg.device = torch.device("cpu")
    model = SVGConvModel(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    B, T = 16, 6
    video = torch.rand(T, B, 3, 48, 64)
    masks = torch.rand(T, B, 2, 48, 64)
    robots = torch.rand(T, B, 5)
    actions = torch.rand(T - 1, B, 5)

    def one_step():
        model.init_hidden(B)
        opt.zero_grad()
        loss = 0.0
        x_pred = video[0]
        for t in range(1, T):
            out = model.forward(
                x_pred, masks[t - 1], robots[t - 1], None, actions[t - 1],
                next_image=video[t], next_mask=masks[t][:, :1],
                next_robot=robots[t],
            )
            x_pred, _, mu, logvar, mu_p, logvar_p = out
            x_pred = x_pred[:, :3]
            loss = loss + torch.nn.functional.l1_loss(x_pred, video[t])
            kl = 0.5 * torch.sum(
                logvar_p - logvar
                + (logvar.exp() + (mu - mu_p) ** 2) / logvar_p.exp() - 1
            ) / B
            loss = loss + 1e-4 * kl
        loss.backward()
        opt.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(n_timed):
        one_step()
    dt = (time.perf_counter() - t0) / n_timed
    return dt, B * (T - 1)


def train_flops_per_window():
    """fwd+bwd FLOPs of one canonical train window-step: batch 16, 5
    predictions, g_dim 512, + posterior stack & next-frame encode (~+35%
    over the planning forward), bwd ~ 2x fwd."""
    global G_DIM
    saved = G_DIM
    G_DIM = 512
    try:
        fwd = model_flops_per_forward() / N_CANDIDATES * 16  # rescale batch
    finally:
        G_DIM = saved
    return 3 * 1.35 * fwd * HORIZON


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    n_fwd = 1 if args.quick else 3
    t_fwd, _ = measure_model_forward(torch, n_fwd)
    t_ik = measure_ik(50 if args.quick else 500)
    try:
        t_render = measure_mask_render(20 if args.quick else 200)
        render_measured = True
    except Exception as e:  # headless GL can be flaky
        print(f"# mask render measurement failed ({e}); using 1.5 ms/render",
              file=sys.stderr)
        t_render, render_measured = 1.5e-3, False
    t_tf = measure_transform(torch, 100 if args.quick else 1000)
    t_train, frames = measure_train_step(torch, 1 if args.quick else 2)

    # compose one plan (reference structure, see module docstring)
    host_per_iter = N_CANDIDATES * (
        HORIZON * t_ik + (HORIZON + 1) * (t_render + t_tf)
    )
    model_per_iter_cpu = HORIZON * t_fwd
    plan_cpu = OPT_ITER * (host_per_iter + model_per_iter_cpu)

    flops_fwd = model_flops_per_forward()
    model_per_iter_a100 = HORIZON * flops_fwd / (A100_EFF_TFLOPS * 1e12)
    plan_a100 = OPT_ITER * (host_per_iter + model_per_iter_a100)

    rollouts = N_CANDIDATES * OPT_ITER
    # train: frames/sec; A100 extrapolation with the same generous
    # effective-TFLOPs credit
    t_train_a100 = train_flops_per_window() / (A100_EFF_TFLOPS * 1e12)

    out = {
        "host": {
            "model_forward_cpu_s": t_fwd,
            "ik_s": t_ik,
            "mask_render_s": t_render,
            "mask_render_measured": render_measured,
            "transform_s": t_tf,
            "train_step_cpu_s": t_train,
        },
        "model_flops_per_forward": flops_fwd,
        "reference_cpu_rollouts_per_sec": rollouts / plan_cpu,
        "reference_a100_rollouts_per_sec": rollouts / plan_a100,
        "reference_host_only_rollouts_per_sec": rollouts / (OPT_ITER * host_per_iter),
        "reference_cpu_train_frames_per_sec": frames / t_train,
        "reference_a100_train_frames_per_sec": frames / t_train_a100,
        "config": {
            "candidates": N_CANDIDATES, "horizon": HORIZON,
            "opt_iter": OPT_ITER, "g_dim": G_DIM, "z_dim": Z_DIM,
            "a100_eff_tflops": A100_EFF_TFLOPS,
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
