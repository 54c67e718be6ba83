"""Device mesh + sharding rules.

The reference is single-GPU PyTorch with no distributed backend
(reference survey: SURVEY.md section 2.11). The TPU-native equivalents:

  * Training: 1-D mesh over all chips, batch axis sharded ("data"); XLA
    inserts the gradient all-reduce over ICI — no NCCL, no explicit
    collectives in user code.
  * Planning: CEM candidates shard over the same axis (the reference's
    `candidates_batch_size` GPU micro-batching loop disappears —
    reference: src/cem/trajectory_sampler.py:123-127).

Parameters/optimizer state are replicated; batches are sharded on their
batch dimension. All functions degrade gracefully to a single device.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D mesh over the first `num_devices` local devices (0 = all)."""
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, batch_axis_index: int, ndim: int, axis: str = "data"):
    spec = [None] * ndim
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: dict, batch_axis_index: int = 1, axis: str = "data"):
    """Shard a dict of time-first arrays (T, B, ...) along B.

    Arrays with fewer dims than batch_axis_index+1 are replicated.
    The batch dim must divide the mesh size; callers pad if needed.
    """

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim > batch_axis_index:
            return jax.device_put(
                x, batch_sharding(mesh, batch_axis_index, x.ndim, axis)
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(x: np.ndarray, axis: int, multiple: int):
    """Pad axis up to a multiple (for uneven final batches). Returns
    (padded, original_size)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return np.pad(x, pad, mode="edge"), size
