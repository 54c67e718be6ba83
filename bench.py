"""Benchmark: CEM planning throughput (model rollouts/sec), the north-star
metric from BASELINE.json config #4.

One "rollout" = one candidate action sequence propagated through the SVG
model over the full horizon with robot IK + mask rendering + robot-aware
costs — exactly what the reference's TrajectorySampler produces per
candidate (reference: src/cem/trajectory_sampler.py:36-199). Here the whole
CEM optimization (opt_iter x [sample -> K rollouts -> topk -> refit]) is one
jitted device program (robot_aware_control_tpu/planning/cem.py), so the
measured time includes everything the reference spends host-side (scalar
IK, serial MuJoCo mask renders, candidate micro-batching, numpy syncs).

vs_baseline denominator: the reference publishes no numbers (BASELINE.md),
so it was MEASURED from the reference implementation itself by
benchmarks/torch_reference_cem.py (results: BASELINE_MEASURED.json):
  * host-side per-candidate loop (scalar IK 10.3 us + MuJoCo mask render
    1.27 ms + transform 42 us, all measured with the reference's own code
    and locobot.xml) caps the reference at 126.6 rollouts/s NO MATTER how
    fast its GPU is (trajectory_sampler.py:86-107 runs it serially per CEM
    iteration);
  * crediting the A100 a generous 60 TFLOP/s effective on the measured
    746 GFLOP forward gives 117.4 rollouts/s total.
REFERENCE_ROLLOUTS_PER_SEC uses the composed A100 estimate. Re-run
benchmarks/torch_reference_cem.py to regenerate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BENCH_TRAIN=1 switches to the second north-star metric, SVG train
frames/sec/chip (BASELINE.json config #2): whole-window train steps at the
canonical robot-aware config, denominator = the measured reference trainer
step extrapolated to A100 (BASELINE_MEASURED.json
reference_a100_train_frames_per_sec). The headline runs batch 128 with
BENCH_TRAIN_STEPS steps scanned inside ONE jitted program — one dispatch
and one host sync per measurement window, which is how the production
trainer runs (one metrics sync per epoch, trainer.py) — and reports the
single-dispatch batch-16 number plus the tunnel overhead per dispatch on
stderr (axon device syncs cost ~50-170 ms and are NOT model time).
BENCH_TRAIN_BATCH overrides the batch size.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# measured A100 composition — see module docstring + BASELINE_MEASURED.json
REFERENCE_ROLLOUTS_PER_SEC = 117.4
REFERENCE_TRAIN_FRAMES_PER_SEC = 807.5
# Denominator uncertainty, carried in the bench JSON (VERDICT r3 #9):
# no CUDA host is reachable here, so the A100 figures are FLOPs
# arithmetic on a measured host loop. CEM is tightly bounded — the
# reference's serial host-side mask/IK loop caps it at 126.6 rollouts/s
# regardless of GPU speed (measured with the reference's own code), so
# the true denominator lies in [117.4, 126.6]. The train denominator
# scales 1/1 with the assumed 60 TFLOP/s effective A100 throughput; a
# +-33% band (40-80 TFLOP/s effective on this conv-LSTM stack) is the
# honest spread until benchmarks/torch_reference_cem.py runs on real
# CUDA hardware.
CEM_BASELINE_RANGE = (117.4, 126.6)
TRAIN_BASELINE_RANGE = (807.5 * 40.0 / 60.0, 807.5 * 80.0 / 60.0)


def _ensure_backend() -> str:
    """Return the platform actually benchmarked. The axon tunnel has
    outages (UNAVAILABLE at init, observed 40-min windows) — retry the
    backend init a few times before falling back to CPU, so a transient
    outage doesn't record a fallback number. jax does not cache a failed
    backend discovery, so re-calling jax.devices() re-attempts the
    tunnel. The JSON unit string carries the platform, so a final
    fallback can never be misread as a TPU regression."""
    import sys
    import time

    import jax._src.xla_bridge as xb

    retries = int(os.environ.get("BENCH_TPU_RETRIES", "2"))
    delay_s = float(os.environ.get("BENCH_TPU_RETRY_DELAY_S", "90"))
    # is a non-cpu plugin registered at all? (axon shows up here)
    accel_expected = bool(set(xb._backend_factories) - {"cpu"})
    last: object = None
    for attempt in range(1 + max(retries, 0)):
        if attempt:
            print(f"retrying backend init in {delay_s:.0f}s "
                  f"(attempt {attempt + 1}/{retries + 1})", file=sys.stderr)
            time.sleep(delay_s)
            # a failed discovery can leave the cpu client cached as the
            # default; clear so the plugin is genuinely re-attempted
            # (safe here: no arrays exist before the bench starts)
            try:
                xb._clear_backends()
            except Exception:  # pragma: no cover - private-API drift
                break
        try:
            platform = jax.devices()[0].platform
        except Exception as e:
            last = e
            print(f"backend unavailable ({e})", file=sys.stderr)
            continue
        if platform != "cpu" or not accel_expected or not xb._backend_errors:
            return platform
        # cpu won while the accelerator plugin errored quietly
        last = RuntimeError(str(xb._backend_errors))
        print(f"accelerator init failed quietly ({last})", file=sys.stderr)
    print(f"TPU backend unavailable after retries ({last}); "
          "benchmarking on CPU instead", file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0].platform


def _platform_tag(platform: str) -> str:
    return "" if platform == "tpu" else f", {platform}-fallback"


def bench_train(smoke: bool):
    import sys

    import jax.numpy as jnp

    platform = _ensure_backend()

    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.training.step import make_train_step

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "8" if smoke else "128"))
    S = int(os.environ.get("BENCH_TRAIN_STEPS", "2" if smoke else "6"))
    remat = bool(int(os.environ.get("BENCH_TRAIN_REMAT", "1")))
    # "conv" saves conv/dot outputs and recomputes only elementwise chains
    # in the backward pass — measured 5.39x vs 4.85x for full remat at
    # batch 128 (RESULTS.md); batch 192+ regresses (HBM pressure).
    remat_policy = os.environ.get("BENCH_TRAIN_REMAT_POLICY", "conv")
    cfg = Config(
        model="svg",
        g_dim=64 if smoke else 256,
        z_dim=16 if smoke else 64,
        image_height=48,
        image_width=64,
        action_dim=5,
        robot_dim=5,
        robot_joint_dim=5,
        n_past=1,
        n_future=5,
        batch_size=B,
        model_use_mask=True,
        model_use_future_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        scheduled_sampling=True,
        compute_dtype="bfloat16",
        remat=remat,
        remat_policy=remat_policy,
    )
    model = get_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0), cfg)
    tstep, tx = make_train_step(cfg)
    opt_state = tx.init(params)
    W = cfg.n_past + cfg.n_future
    rng = np.random.RandomState(0)
    h, w = cfg.image_height, cfg.image_width

    def make_batch(s_axis=None):
        lead = () if s_axis is None else (s_axis,)
        return {
            "images": jnp.asarray(
                rng.rand(*lead, W, B, h, w, 3), jnp.float32),
            "masks": jnp.asarray(
                rng.rand(*lead, W, B, h, w, 1) > 0.8, jnp.float32),
            "states": jnp.asarray(rng.rand(*lead, W, B, 5), jnp.float32),
            "actions": jnp.asarray(
                rng.rand(*lead, W - 1, B, 5), jnp.float32),
        }

    key = jax.random.PRNGKey(0)
    prob = jnp.float32(1.0)

    # --- single-dispatch time (includes one tunnel round-trip) -----------
    batch1 = make_batch()
    params, bn, opt_state, metrics = tstep(params, bn, opt_state, batch1,
                                           key, prob)
    float(metrics["loss"])  # force through the tunnel
    t0 = time.perf_counter()
    params, bn, opt_state, metrics = tstep(params, bn, opt_state, batch1,
                                           key, prob)
    float(metrics["loss"])
    t_single = time.perf_counter() - t0

    # --- S steps scanned in ONE program: one dispatch + one sync ---------
    # (production shape: the trainer syncs metrics once per epoch)
    def multi(params, bn, opt_state, batches, key):
        def body(carry, b):
            p, bnn, o, k = carry
            k, k2 = jax.random.split(k)
            p, bnn, o, m = tstep(p, bnn, o, b, k2, prob)
            return (p, bnn, o, k), m["loss"]

        (p, bnn, o, _), losses = jax.lax.scan(
            body, (params, bn, opt_state, key), batches
        )
        return p, bnn, o, losses

    multi = jax.jit(multi, donate_argnums=(0, 1, 2))
    batches = make_batch(s_axis=S)
    params, bn, opt_state, losses = multi(params, bn, opt_state, batches, key)
    float(losses[-1])
    reps = 1 if smoke else 3
    t0 = time.perf_counter()
    for _ in range(reps):
        params, bn, opt_state, losses = multi(params, bn, opt_state,
                                              batches, key)
    float(losses[-1])
    dt_step = (time.perf_counter() - t0) / (reps * S)
    fps = B * W / dt_step
    fps_single = B * W / t_single
    print(json.dumps({
        "tunnel_note": "single dispatch incl. host sync vs in-graph step",
        "batch": B, "steps_per_dispatch": S,
        "single_dispatch_s": round(t_single, 4),
        "in_graph_step_s": round(dt_step, 4),
        "tunnel_overhead_s": round(max(t_single - dt_step, 0.0), 4),
        "frames_per_sec_single_dispatch": round(fps_single, 1),
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "svg_train_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s/chip (whole-window step, batch {B}, "
                f"{S} steps/dispatch, one sync{_platform_tag(platform)})",
        "vs_baseline": round(fps / REFERENCE_TRAIN_FRAMES_PER_SEC, 3),
        "vs_baseline_range": [
            round(fps / TRAIN_BASELINE_RANGE[1], 3),
            round(fps / TRAIN_BASELINE_RANGE[0], 3),
        ],
        "baseline_note": "denominator = measured reference host loop x "
                         "assumed 60 TFLOP/s effective A100; range spans "
                         "40-80 TFLOP/s (never validated on real CUDA "
                         "hardware — BASELINE_MEASURED.json)",
    }))


def main():
    if bool(int(os.environ.get("BENCH_TRAIN", "0"))):
        bench_train(bool(int(os.environ.get("BENCH_SMOKE", "0"))))
        return
    smoke = bool(int(os.environ.get("BENCH_SMOKE", "0")))
    platform = _ensure_backend()
    if platform != "tpu" and not smoke:
        # full shapes take >30 min to compile+run on host CPU; a fallback
        # run should finish, and it is labeled as non-TPU either way
        import sys

        print("non-TPU platform: switching to smoke shapes", file=sys.stderr)
        smoke = True

    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.models.registry import get_model
    from robot_aware_control_tpu.planning.cem import CEMPolicy
    from robot_aware_control_tpu.utils.state import DemoGoalState, State

    # BENCH_QUANT=1: int8 MXU planning path (ops/quant.py) — the v5e int8
    # peak is 2x bf16, and CEM is forward-only; rollout accuracy bounds in
    # tests/test_quant.py
    quantize = bool(int(os.environ.get("BENCH_QUANT", "0")))
    cfg = Config(
        model="svg",
        g_dim=64 if smoke else 256,
        z_dim=16 if smoke else 64,
        image_height=48,
        image_width=64,
        action_dim=5,
        robot_dim=5,
        robot_joint_dim=5,
        model_use_mask=True,
        model_use_future_mask=True,
        model_use_robot_state=True,
        reconstruction_loss="dontcare_l1",
        reward_type="dontcare",
        compute_dtype="bfloat16",
        horizon=5,
        opt_iter=10,
        action_candidates=16 if smoke else 100,
        topk=5,
        cem_init_std=0.015,
        plan_quantize="int8" if quantize else "none",
    )
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    policy = CEMPolicy(cfg, params, bn)

    rng = np.random.RandomState(0)
    h, w = cfg.image_height, cfg.image_width
    start = State(
        img=rng.rand(h, w, 3).astype(np.float32),
        state=np.array([0.3, 0.0, 0.15, 0.0, 0.0], np.float32),
        qpos=np.zeros(5, np.float32),
    )
    goal = DemoGoalState(
        imgs=[rng.rand(h, w, 3).astype(np.float32) for _ in range(4)],
        masks=[np.zeros((h, w), np.float32) for _ in range(4)],
    )

    # warm-up / compile
    policy.get_action(start, goal, ep_num=0, step=0)

    reps = 2 if smoke else 5
    t0 = time.perf_counter()
    for i in range(reps):
        policy.get_action(start, goal, ep_num=1, step=i)
    elapsed = time.perf_counter() - t0

    rollouts = reps * cfg.opt_iter * cfg.action_candidates
    rps = rollouts / elapsed
    # control-loop view: one full CEM plan (the per-control-step latency the
    # robot actually waits for; reference spends seconds here host-side)
    import sys

    # diagnostic: device-only throughput. get_action must sync per plan (the
    # robot needs the action), so the headline above includes one tunnel
    # round-trip per plan; dispatching the same plans back-to-back and
    # syncing once isolates pure device time — the headroom the plan
    # server's co-batching/pipelining recovers under multi-robot load.
    preps = [policy._host_prep(start, goal, ep_num=2, step=i)
             for i in range(reps)]
    outs = [policy._plan(policy.params, policy.bn, *preps[0])]
    np.asarray(outs[-1])  # warm queue
    t0 = time.perf_counter()
    outs = [policy._plan(policy.params, policy.bn, *p) for p in preps]
    np.asarray(outs[-1])  # device executes in order: one sync drains all
    elapsed_pipe = time.perf_counter() - t0

    print(json.dumps({
        "plan_latency_s": round(elapsed / reps, 4),
        "plans_per_sec": round(reps / elapsed, 2),
        "device_only_plan_s": round(elapsed_pipe / reps, 4),
        "tunnel_overhead_per_plan_s": round(
            max(elapsed / reps - elapsed_pipe / reps, 0.0), 4),
        "pipelined_rollouts_per_sec": round(rollouts / elapsed_pipe, 2),
        "note": f"one plan = {cfg.opt_iter} iters x "
                f"{cfg.action_candidates} candidates, horizon {cfg.horizon}; "
                "headline metric keeps the per-plan sync (single-robot "
                "control semantics)",
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "cem_model_rollouts_per_sec",
        "value": round(rps, 2),
        "unit": "rollouts/s (K x H model steps each, full CEM on device"
                f"{', int8' if quantize else ''}{_platform_tag(platform)})",
        "vs_baseline": round(rps / REFERENCE_ROLLOUTS_PER_SEC, 3),
        "vs_baseline_range": [
            round(rps / CEM_BASELINE_RANGE[1], 3),
            round(rps / CEM_BASELINE_RANGE[0], 3),
        ],
        "baseline_note": "denominator bounded by the reference's own "
                         "measured serial host loop (126.6/s cap) and its "
                         "composed A100 estimate (117.4/s) — "
                         "BASELINE_MEASURED.json",
    }))


if __name__ == "__main__":
    main()
