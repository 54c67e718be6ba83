"""Real-robot visual MPC controller (hardware-gated).

Reference parity: the ROS stack (reference:
locobot_rospkg/nodes/visual_MPC_controller.py:60-437 and the widowx/franka
variants): subscribe to a RealSense camera, calibrate extrinsics from an
AprilTag, capture a goal image, drive the eef to the start pose, then loop
CEM planning + action execution (optionally open-loop,
visual_MPC_controller.py:319-340).

TPU-native design: the controller is hardware-agnostic — it talks to a
`RobotInterface` (camera frame, eef state/qpos, action execution) so the
same class drives ROS nodes (when rospy is importable), a socket bridge, or
the simulation envs (SimRobotInterface below, used in tests). The planning
stack is exactly planning/cem.py — the real-robot path and the sim path
share one CEMPolicy API, like the reference (cem.py:49).
"""

from __future__ import annotations

from typing import Callable, Optional, Protocol

import numpy as np

from robot_aware_control_tpu.config import Config
from robot_aware_control_tpu.planning.cem import CEMPolicy
from robot_aware_control_tpu.utils.state import DemoGoalState, State


class RobotInterface(Protocol):
    """Minimal hardware surface the controller needs."""

    def get_image(self) -> np.ndarray: ...           # (H, W, 3) float [0,1]
    def get_eef_state(self) -> np.ndarray: ...       # (>=3,) world eef
    def get_qpos(self) -> np.ndarray: ...            # (>=4,) joints
    def execute_action(self, action: np.ndarray): ...
    def move_to(self, eef_target: np.ndarray): ...


class SimRobotInterface:
    """Adapter that drives a simulation env through the hardware surface —
    the test double for the ROS node (and the pattern for new bridges)."""

    def __init__(self, env):
        self.env = env

    def get_image(self):
        return self.env.render()

    def get_eef_state(self):
        return np.array([*np.asarray(self.env.state.eef), 0.0, 0.0], np.float32)

    def get_qpos(self):
        return np.asarray(self.env.state.qpos)

    def execute_action(self, action):
        d = self.env.action_dim
        a = np.zeros(d, np.float32)
        n = min(len(action), d)
        a[:n] = np.asarray(action, np.float32)[:n]
        self.env.step(a)

    def move_to(self, eef_target):
        d = self.env.action_dim
        for _ in range(20):
            eef = np.asarray(self.env.state.eef)
            delta = np.clip((np.asarray(eef_target)[:3] - eef) / 0.05, -1, 1)
            if np.linalg.norm(delta) * 0.05 < 0.01:
                break
            a = np.zeros(d, np.float32)
            n = min(3, d)
            a[:n] = delta[:n]
            self.env.step(a)


class VisualMPCController:
    """(reference: visual_MPC_controller.py:60-437)"""

    def __init__(self, cfg: Config, robot: RobotInterface, params, bn,
                 policy_cls=CEMPolicy, **policy_kw):
        self.cfg = cfg
        self.robot = robot
        self.policy = policy_cls(cfg, params, bn, **policy_kw)
        self.goal: Optional[DemoGoalState] = None
        self.start_eef: Optional[np.ndarray] = None

    # --- setup phase (reference :226-314) -------------------------------
    def collect_goal_img(self):
        """Capture the current camera frame as the goal."""
        img = self.robot.get_image()
        h, w = img.shape[:2]
        self.goal = DemoGoalState(
            imgs=[np.asarray(img, np.float32)],
            masks=[np.zeros((h, w), np.float32)],
        )
        return img

    def set_start_pose(self, eef_target):
        self.start_eef = np.asarray(eef_target, np.float32)
        self.robot.move_to(self.start_eef)

    def create_start_goal(self):
        img = self.robot.get_image()
        start = State(
            img=np.asarray(img, np.float32),
            state=self.robot.get_eef_state(),
            qpos=self.robot.get_qpos(),
        )
        assert self.goal is not None, "collect_goal_img() first"
        return start, self.goal

    # --- control loop (reference :319-340) -------------------------------
    def run(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        steps = max_steps or cfg.max_episode_length
        executed = []
        t = 0
        while t < steps:
            start, goal = self.create_start_goal()
            plan = self.policy.get_action(start, goal, ep_num=0, step=t)
            if cfg.cem_open_loop:
                for action in plan:
                    self.robot.execute_action(action)
                    executed.append(action)
                    t += 1
                    if t >= steps:
                        break
            else:
                k = max(cfg.replan_every, 1)
                for action in plan[:k]:
                    self.robot.execute_action(action)
                    executed.append(action)
                    t += 1
        return np.asarray(executed)


def make_ros_interface(cfg: Config):  # pragma: no cover - hardware only
    """Real ROS wiring; import-gated so sim-only hosts never touch rospy
    (reference node: visual_MPC_controller.py:60-219)."""
    try:
        import rospy  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "rospy not available — real-robot control requires a ROS host. "
            "Use SimRobotInterface or implement RobotInterface over your "
            "robot bridge."
        ) from e
    raise NotImplementedError(
        "Wire your camera topic + eef control service into RobotInterface."
    )
