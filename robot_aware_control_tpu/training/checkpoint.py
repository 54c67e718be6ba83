"""Checkpointing with auto-resume.

Preserves the reference's checkpoint contract (reference:
src/prediction/trainer.py:829-897): checkpoints are written as
`ckpt_<step>` under the log dir, training auto-resumes from the newest one,
and a finetune load can skip the optimizer state and reset the step
(trainer.py:892-896).

Implementation is a self-contained flattened-pytree .npz (keyed by treedef
paths) — robust across jax versions, no host-side deps, and trivially
shardable later. Robot-model checkpoints ({joint_model, gripper_model},
reference: trainer.py:839-844) use the same container.
"""

from __future__ import annotations

import os
import re
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: Dict[str, np.ndarray]):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(log_dir: str, step: int, trees: Dict[str, Any],
                    background: bool = False):
    """trees: named pytrees, e.g. {"params":..., "bn":..., "opt":...}.

    Device->host transfers are initiated for ALL leaves up front
    (jax.Array.copy_to_host_async) before any blocking read, so the axon
    tunnel round-trip is paid once for the whole tree instead of per leaf.
    background=True additionally moves the npz write to a writer thread
    and returns as soon as the arrays are materialized — safe against the
    train step's buffer donation (the device buffers are no longer
    referenced). Writes are serialized on one lock; call
    wait_for_checkpoints() before reading the file or exiting. The
    reference blocks training for every torch.save (trainer.py:829-837)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"ckpt_{step}.npz")
    flat = {}
    for name, tree in trees.items():
        for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            flat[f"{name}|{jax.tree_util.keystr(p)}"] = leaf
    flat["__step__"] = np.asarray(step)
    for v in flat.values():
        if isinstance(v, jax.Array):
            v.copy_to_host_async()
    arrs = {k: np.asarray(v) for k, v in flat.items()}
    if background:
        t = threading.Thread(target=_write_npz, args=(path, arrs), daemon=True)
        with _WRITERS_LOCK:
            _WRITERS.append(t)
        t.start()
        return path
    _write_npz(path, arrs)
    return path


_WRITERS: list = []
_WRITERS_LOCK = threading.Lock()
_WRITE_SERIAL = threading.Lock()


def _write_npz(path: str, arrs: Dict[str, np.ndarray]):
    with _WRITE_SERIAL:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)


def wait_for_checkpoints():
    """Join all outstanding background checkpoint writers."""
    with _WRITERS_LOCK:
        pending, _WRITERS[:] = _WRITERS[:], []
    for t in pending:
        t.join()


def latest_checkpoint(log_dir: str) -> Optional[str]:
    """Newest ckpt_<step> by step (reference: trainer.py:846-861). Both
    .npz files and orbax directories are recognized."""
    if not os.path.isdir(log_dir):
        return None
    best, best_step = None, -1
    for fn in os.listdir(log_dir):
        m = re.fullmatch(r"ckpt_(\d+)(\.npz)?", fn)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(log_dir, fn)
    return best


def load_checkpoint(
    path: str, templates: Dict[str, Any]
) -> Tuple[Dict[str, Any], int]:
    """Restore named pytrees into matching templates. Missing template names
    are skipped (e.g. finetune skips the optimizer, trainer.py:892-896).
    Dispatches to the orbax path for directory checkpoints."""
    wait_for_checkpoints()  # a background writer may still hold this file
    if os.path.isdir(path):
        return load_checkpoint_sharded(path, templates)
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    step = int(flat.pop("__step__"))
    out = {}
    for name, template in templates.items():
        prefix = f"{name}|"
        sub = {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}
        if not sub:
            raise KeyError(f"checkpoint has no tree named {name!r}")
        out[name] = _unflatten(template, sub)
    return out, step


# ---------------------------------------------------------------------------
# Sharded (multi-host) checkpoints via orbax.
#
# Multi-host training cannot funnel every shard through one host's .npz:
# orbax coordinates a distributed save where each host writes its own
# shards and restore re-lays arrays out onto the current mesh. Same
# `ckpt_<step>` auto-resume contract; the checkpoint is a DIRECTORY.


def save_checkpoint_sharded(log_dir: str, step: int, trees: Dict[str, Any]):
    import orbax.checkpoint as ocp

    os.makedirs(log_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(log_dir, f"ckpt_{step}"))
    with ocp.PyTreeCheckpointer() as cp:
        cp.save(path, {"trees": trees, "step": step}, force=True)
    return path


def _path_names(path) -> Tuple[str, ...]:
    """Normalize a tree path to a tuple of names so template nodes
    (namedtuples -> GetAttrKey, dicts -> DictKey, tuples -> SequenceKey)
    match the dict/list containers orbax restores them as."""
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:  # pragma: no cover - future key types
            names.append(str(p))
    return tuple(names)


def load_checkpoint_sharded(
    path: str, templates: Dict[str, Any], shardings: Optional[Dict] = None
) -> Tuple[Dict[str, Any], int]:
    """Restore a directory checkpoint. `shardings` (optional) mirrors
    `templates` with jax.sharding.Sharding leaves to restore arrays
    directly into a mesh layout.

    Leaves are matched to the template BY KEY PATH, not flat order: orbax
    serializes namedtuple/custom nodes (e.g. optax optimizer states) as
    dicts whose sorted-key flatten order can differ from the template's
    field order, which would silently transpose same-shape leaves."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as cp:
        restored = cp.restore(os.path.abspath(path))
    step = int(restored["step"])
    out = {}
    for name, template in templates.items():
        if name not in restored["trees"]:
            raise KeyError(f"checkpoint has no tree named {name!r}")
        got = restored["trees"][name]
        got_map = {
            _path_names(p): leaf
            for p, leaf in jax.tree_util.tree_flatten_with_path(got)[0]
        }
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, tleaf in paths_leaves:
            key = _path_names(p)
            if key not in got_map:
                raise KeyError(
                    f"checkpoint tree {name!r} missing leaf {'/'.join(key)}"
                )
            leaves.append(got_map[key])
        if len(got_map) != len(paths_leaves):
            extra = set(got_map) - {_path_names(p) for p, _ in paths_leaves}
            raise ValueError(
                f"tree {name!r} has {len(extra)} unmatched checkpoint leaves: "
                f"{sorted(extra)[:3]}"
            )
        tree = jax.tree_util.tree_unflatten(treedef, leaves)
        if shardings is not None and name in shardings:
            tree = jax.device_put(tree, shardings[name])
        out[name] = tree
    return out, step
