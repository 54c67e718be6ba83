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
    """1-D mesh over the first `num_devices` devices (0 = all).

    `jax.devices()` is GLOBAL under multi-process JAX, so on a multi-host
    slice this mesh spans every chip of every host; gradient all-reduce
    rides ICI within a slice and DCN across slices, both inserted by XLA."""
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def get_mesh_2d(model_axis_size: int, num_devices: int = 0,
                axes=("data", "model")) -> Mesh:
    """2-D (data, model) mesh: batch shards over "data", channel-sharded
    params shard over "model" (tensor parallelism). The model axis is the
    FAST (innermost) device dimension so TP collectives ride the
    shortest ICI hops; data-parallel gradient all-reduce spans the outer
    dimension."""
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_axis_size:
        raise ValueError(
            f"{n} devices not divisible by model_axis_size={model_axis_size}"
        )
    return Mesh(np.array(devs).reshape(n // model_axis_size, model_axis_size),
                axes)


def leaf_sharding(mesh: Mesh, x, axis: str) -> NamedSharding:
    """Sharding rule for one parameter/optimizer-state leaf: shard the
    TRAILING axis over the named mesh axis when it divides evenly,
    replicate otherwise.

    The trailing axis is the output-channel axis for every layer in this
    codebase — conv kernels are HWIO, dense weights are (din, dout), and
    biases/BN vectors are (cout,) — so one rule shards a conv, its bias,
    and its following BatchNorm consistently along the same channel
    partition. Adam's mu/nu mirror param shapes and land on the same
    sharding; scalar leaves (e.g. optax step counts) replicate.

    axis="model": tensor parallelism — XLA partitions each conv/matmul
    over output channels and inserts the (all-gather) collectives where a
    replicated-input op consumes a channel-sharded tensor.
    axis="data": FSDP-style sharding — params/optimizer state are stored
    sharded over the data axis and all-gathered by XLA at use, trading an
    ICI gather per layer for 1/n_devices of the param+Adam HBM footprint.
    """
    shape = getattr(x, "shape", ())
    size = mesh.shape[axis]
    if len(shape) >= 1 and shape[-1] % size == 0 and shape[-1] >= size:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + [axis])))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, tree, axis: str = "model"):
    """device_put a param-shaped pytree (params / optimizer state / BN
    state) with per-leaf trailing-axis shardings (leaf_sharding)."""
    shardings = jax.tree_util.tree_map(
        lambda x: leaf_sharding(mesh, x, axis), tree
    )
    return jax.device_put(tree, shardings)


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def host_shard_files(items, process_index: int = None,
                     process_count: int = None):
    """Disjoint per-host slice of a work list (files, episodes). The
    multi-host data feed: each host reads only its own shard (SURVEY
    section 2.11 — DCN appears only for input pipelines / checkpoint IO)."""
    if process_index is None or process_count is None:
        process_index, process_count = process_info()
    if process_count <= 1:
        return list(items)
    return list(items)[process_index::process_count]


# Batch-dict keys whose arrays are per-element (B, ...) rather than
# time-first (T, B, ...): their batch dim is axis 0, not the default.
PER_ELEMENT_KEYS = (
    "batch_weight", "low", "high", "raw_low", "raw_high", "high_movement",
)


def batch_axis_for(key, default: int = 1) -> int:
    return 0 if key in PER_ELEMENT_KEYS else default


def make_global_batch(mesh: Mesh, local_batch: dict, batch_axis_index: int = 1,
                      axis: str = "data"):
    """Assemble per-host local arrays into globally-sharded jax.Arrays
    (multi-host `jax.make_array_from_process_local_data`). Each host passes
    its LOCAL batch slice; the result behaves as the concatenated global
    batch sharded over the mesh. Per-element keys (PER_ELEMENT_KEYS) are
    assembled along their axis-0 batch dim so e.g. a host-local (B_local,)
    batch_weight becomes the global (B,) array."""

    def put(k, x):
        ax = batch_axis_for(k, batch_axis_index)
        if isinstance(x, jax.Array):
            return x  # already assembled/sharded (e.g. by device_prefetch)
        x = np.asarray(x)
        if x.ndim > ax:
            sharding = batch_sharding(mesh, ax, x.ndim, axis)
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return {k: put(k, v) for k, v in local_batch.items()}


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, batch_axis_index: int, ndim: int, axis: str = "data"):
    spec = [None] * ndim
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: dict, batch_axis_index: int = 1, axis: str = "data"):
    """Shard a dict of time-first arrays (T, B, ...) along B; per-element
    keys (PER_ELEMENT_KEYS, shape (B, ...)) shard along axis 0.

    Arrays with fewer dims than their batch axis+1 are replicated.
    The batch dim must divide the mesh size; callers pad if needed.
    Under multi-process JAX the batch is treated as host-LOCAL and
    assembled into a global array (make_global_batch); single-process it
    is a plain device_put. Values that are already jax.Arrays pass through
    untouched (e.g. sliced from a prefetched device video).
    """
    if jax.process_count() > 1:
        return make_global_batch(mesh, batch, batch_axis_index, axis)

    def put(k, x):
        if isinstance(x, jax.Array):
            return x
        x = np.asarray(x)
        ax = batch_axis_for(k, batch_axis_index)
        if x.ndim > ax:
            return jax.device_put(x, batch_sharding(mesh, ax, x.ndim, axis))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return {k: put(k, v) for k, v in batch.items()}


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
