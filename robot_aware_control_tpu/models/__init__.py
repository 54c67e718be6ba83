from robot_aware_control_tpu.models import svg, det, copy_model, robot_mlp  # noqa: F401
from robot_aware_control_tpu.models.registry import get_model  # noqa: F401
