"""Copy baseline: propagate world pixels of the previous frame through the
next mask (reference: src/prediction/models/dynamics.py:341-360).

World pixels of the next frame (next_mask == 0) are replaced by the previous
image's pixels; robot pixels keep the next image's content. Parameter-free —
the floor for world-pixel error, also used to label object movement
(reference: src/prediction/measure_obj_movement.py:79-150).
"""

from __future__ import annotations

import jax.numpy as jnp


def step(image, next_image, next_mask):
    """image/next_image (B,H,W,C), next_mask (B,H,W,1). Returns prediction."""
    robot = (next_mask.astype(jnp.float32) > 0.5).astype(image.dtype)
    return robot * next_image + (1.0 - robot) * image
