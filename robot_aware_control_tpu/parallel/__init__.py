from robot_aware_control_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    shard_batch,
    replicate,
)
