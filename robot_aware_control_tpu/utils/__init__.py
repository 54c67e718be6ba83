from robot_aware_control_tpu.utils.state import State, DemoGoalState  # noqa: F401
