"""Visual MPC controller tests through the hardware-agnostic interface
(reference: locobot_rospkg/nodes/visual_MPC_controller.py:60-437)."""

import jax
import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.control.real_robot import (
    SimRobotInterface,
    VisualMPCController,
)
from robot_aware_control_tpu.envs import LocobotPushEnv
from robot_aware_control_tpu.models.registry import get_model


def _cfg():
    return Config(
        model="svg", g_dim=16, z_dim=4, image_height=48, image_width=64,
        action_dim=5, robot_dim=5, robot_joint_dim=5,
        model_use_mask=True, model_use_robot_state=True,
        reconstruction_loss="dontcare_l1", reward_type="dontcare",
        horizon=3, opt_iter=2, action_candidates=6, topk=2,
        cem_init_std=0.015, compute_dtype="float32",
        max_episode_length=2, replan_every=1,
    )


def test_visual_mpc_closed_and_open_loop():
    cfg = _cfg()
    env = LocobotPushEnv(cfg, seed=0)
    env.reset()
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    robot = SimRobotInterface(env)
    ctrl = VisualMPCController(cfg, robot, params, bn)
    ctrl.collect_goal_img()
    ctrl.set_start_pose(np.array([0.25, 0.0, 0.15], np.float32))
    executed = ctrl.run()
    assert executed.shape[0] == cfg.max_episode_length

    cfg2 = cfg.replace(cem_open_loop=True)
    ctrl2 = VisualMPCController(cfg2, robot, params, bn)
    ctrl2.collect_goal_img()
    executed2 = ctrl2.run()
    assert executed2.shape[0] == cfg2.max_episode_length


def test_visual_mpc_over_socket_bridge():
    """The full controller loop across a real process-style boundary: a
    RobotBridgeServer wraps the sim robot in a background thread and the
    controller drives it through SocketRobotInterface — the non-ROS
    analogue of the reference's networked node
    (visual_MPC_controller.py:60-219)."""
    import threading

    from robot_aware_control_tpu.control.real_robot import (
        RobotBridgeServer,
        SocketRobotInterface,
    )

    cfg = _cfg()
    env = LocobotPushEnv(cfg, seed=0)
    env.reset()
    params, bn = get_model(cfg).init(jax.random.PRNGKey(0), cfg)
    server = RobotBridgeServer(SimRobotInterface(env))
    t = threading.Thread(target=server.serve_once, daemon=True)
    t.start()
    host, port = server.address
    robot = SocketRobotInterface(host, port)
    try:
        ctrl = VisualMPCController(cfg, robot, params, bn)
        img = ctrl.collect_goal_img()
        assert img.shape == (cfg.image_height, cfg.image_width, 3)
        ctrl.set_start_pose(np.array([0.25, 0.0, 0.15], np.float32))
        executed = ctrl.run()
        assert executed.shape[0] == cfg.max_episode_length
        # robot faults surface as errors on the controller side
        try:
            robot._call("bogus_command")
            raise AssertionError("expected bridge error")
        except RuntimeError as e:
            assert "bogus_command" in str(e)
    finally:
        robot.close()
        t.join(timeout=10)
        server.close()
