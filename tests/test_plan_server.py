"""Planning-as-a-service tests: a warm PlanServer thread serving a real
CEMPolicy over TCP, exercised by the numpy-only PlanClient / RemotePolicy
(control/plan_server.py; the reference plans in-process in its ROS node,
locobot_rospkg/nodes/visual_MPC_controller.py:319-340)."""

import numpy as np
import pytest

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.plan_server import (
    PlanClient,
    PlanServer,
    RemotePolicy,
)
from robot_aware_control_tpu.models.registry import get_model
from robot_aware_control_tpu.planning.cem import CEMPolicy
from robot_aware_control_tpu.utils.state import DemoGoalState, State

CFG = Config(
    model="svg",
    g_dim=16,
    z_dim=4,
    image_width=64,
    image_height=48,
    action_dim=5,
    robot_dim=5,
    robot_joint_dim=5,
    model_use_mask=True,
    model_use_robot_state=True,
    reconstruction_loss="dontcare_l1",
    reward_type="dontcare",
    compute_dtype="float32",
    horizon=3,
    opt_iter=2,
    action_candidates=8,
    topk=3,
    cem_init_std=0.015,
)


@pytest.fixture(scope="module")
def served():
    import jax

    params, bn = get_model(CFG).init(jax.random.PRNGKey(0), CFG)
    server = PlanServer(CFG, params, bn)
    thread = server.start()
    yield server, params, bn
    server._shutdown = True
    server.close()
    thread.join(timeout=5)


def _start_goal(rng):
    h, w = CFG.image_height, CFG.image_width
    start = State(
        img=rng.rand(h, w, 3).astype(np.float32),
        state=np.array([0.3, 0.0, 0.15, 0.0, 0.0], np.float32),
        qpos=np.zeros(5, np.float32),
    )
    goal = DemoGoalState(
        imgs=[rng.rand(h, w, 3).astype(np.float32) for _ in range(2)],
        masks=[np.zeros((h, w), np.float32) for _ in range(2)],
    )
    return start, goal


def test_plan_matches_local_policy(served, rng):
    """The served plan is bit-identical to in-process CEMPolicy.get_action
    for the same (params, start, goal, ep_num, step)."""
    server, params, bn = served
    start, goal = _start_goal(rng)
    client = PlanClient(*server.address)
    try:
        info = client.info()
        assert info["horizon"] == CFG.horizon
        assert info["action_candidates"] == CFG.action_candidates
        remote = client.plan(start, goal, ep_num=1, step=2)
        assert client.last_plan_s is not None
        local = CEMPolicy(CFG, params, bn).get_action(
            start, goal, ep_num=1, step=2)
        np.testing.assert_array_equal(remote, np.asarray(local, np.float32))
        assert remote.shape == (CFG.horizon - 1, 2)
    finally:
        client.close()


def test_sequential_clients_and_errors(served, rng):
    """The server survives a bad request and serves a SECOND connection
    after the first closes (serve_forever accept loop)."""
    server, _, _ = served
    start, goal = _start_goal(rng)
    c1 = PlanClient(*server.address)
    with pytest.raises(RuntimeError, match="unknown cmd"):
        c1._call("bogus")
    assert c1.ping()["ok"]
    c1.close()

    policy = RemotePolicy(*server.address)
    try:
        plan = policy.get_action(start, goal, ep_num=0, step=0)
        assert plan.shape == (CFG.horizon - 1, 2)
        assert np.isfinite(plan).all()
        # deterministic service: same request -> same plan
        np.testing.assert_array_equal(
            plan, policy.get_action(start, goal, ep_num=0, step=0))
        with pytest.raises(ValueError, match="rng is server-side"):
            policy.get_action(start, goal, rng=np.random.RandomState(0))
    finally:
        policy.close()


def test_concurrent_clients(served, rng):
    """Two simultaneously-connected clients both get served (thread-per-
    connection; plans serialize on the single device program)."""
    import concurrent.futures as cf

    server, _, _ = served
    start, goal = _start_goal(rng)
    c1, c2 = PlanClient(*server.address), PlanClient(*server.address)
    try:
        with cf.ThreadPoolExecutor(2) as pool:
            f1 = pool.submit(c1.plan, start, goal, 5, 0)
            f2 = pool.submit(c2.plan, start, goal, 5, 0)
            p1, p2 = f1.result(timeout=120), f2.result(timeout=120)
        np.testing.assert_array_equal(p1, p2)  # same request -> same plan
    finally:
        c1.close()
        c2.close()


def test_batched_matches_single(served, rng):
    """get_action_batched(R requests) is bit-identical to R independent
    get_action calls when both programs trace the same cells
    (planning/cem.py:get_action_batched; the property PlanServer's
    micro-batching relies on for served-plan consistency)."""
    _, params, bn = served
    policy = CEMPolicy(CFG, params, bn)
    reqs = [_start_goal(rng) for _ in range(3)]
    eps, steps = [0, 4, 9], [0, 2, 5]
    batched = policy.get_action_batched(
        [r[0] for r in reqs], [r[1] for r in reqs],
        ep_nums=eps, steps=steps)
    assert batched.shape == (3, CFG.horizon - 1, 2)
    for i, (s, g) in enumerate(reqs):
        single = policy.get_action(s, g, ep_num=eps[i], step=steps[i])
        np.testing.assert_array_equal(batched[i],
                                      np.asarray(single, np.float32))


def test_server_forces_consistent_cells():
    """A micro-batching server must trace the SAME cells on the single and
    batched paths, or a request's plan would depend on what else happened
    to be queued: with --fused_lstm it plans with the XLA cells on both
    (control/plan_server.py:76-88, advertised via info()); batch_plans=
    False keeps the fused Pallas cell for single-client serving."""
    import jax

    cfg = CFG.replace(fused_lstm=True)
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)

    batching = PlanServer(cfg, params, bn)
    try:
        assert batching._batch_plans
        assert batching.consistent_cells
        assert not batching.policy.cfg.fused_lstm
        client = PlanClient(*batching.address)
        thread = batching.start()
        info = client.info()
        assert info["fused_lstm"] is False
        assert info["batch_plans"] is True
        client.close(shutdown_server=True)
        thread.join(timeout=5)
    finally:
        batching.close()

    single = PlanServer(cfg, params, bn, batch_plans=False)
    try:
        assert not single._batch_plans
        assert not single.consistent_cells
        assert single.policy.cfg.fused_lstm
    finally:
        single.close()


def test_batched_service_matches_local(served, rng):
    """Concurrent DISTINCT requests — whether they drain as one micro-batch
    or plan singly — each come back bit-identical to the in-process plan
    for that request (served-plan consistency, all modes)."""
    import concurrent.futures as cf

    server, params, bn = served
    reqs = [_start_goal(rng) for _ in range(4)]
    clients = [PlanClient(*server.address) for _ in range(4)]
    try:
        with cf.ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(clients[i].plan, reqs[i][0], reqs[i][1],
                                i, 2 * i) for i in range(4)]
            plans = [f.result(timeout=300) for f in futs]
        # the server plans with the XLA cells in batching mode; compare
        # against a local policy tracing the same cells
        local = CEMPolicy(server.policy.cfg, params, bn)
        for i in range(4):
            expect = local.get_action(reqs[i][0], reqs[i][1],
                                      ep_num=i, step=2 * i)
            np.testing.assert_array_equal(
                plans[i], np.asarray(expect, np.float32))
    finally:
        for c in clients:
            c.close()


def test_demo_seeded_plan_roundtrip(rng):
    """opt_traj (demo-seeded CEM mean, planning/cem.py:75-85) crosses the
    wire and changes the plan under --demo_cost."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(CFG, demo_cost=True)
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    server = PlanServer(cfg, params, bn)
    thread = server.start()
    start, goal = _start_goal(rng)
    opt = 0.03 * rng.randn(cfg.horizon - 1, 2).astype(np.float32)
    client = PlanClient(*server.address)
    try:
        base = client.plan(start, goal, ep_num=3, step=0)
        seeded = client.plan(start, goal, ep_num=3, step=0, opt_traj=opt)
        assert np.abs(base - seeded).max() > 0
    finally:
        client.close(shutdown_server=True)
        server.close()
        thread.join(timeout=5)
