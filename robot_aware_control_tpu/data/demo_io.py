"""Demonstration episode save/load.

The reference stores scripted MuJoCo demos as HDF5 with robot / object-only
/ inpainted image streams, masks, robot states and object poses, consumed by
the episode runners (reference: src/mbrl/episode_runner.py:84-141, demo
collection scripts src/dataset/collect_*.py). Same container here, written
from the JAX envs."""

from __future__ import annotations

import os
from typing import Dict, List

import h5py
import numpy as np


def save_demo(path: str, demo: Dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as hf:
        for k, v in demo.items():
            arr = np.asarray(v)
            if arr.dtype.kind in "fiub":
                hf.create_dataset(k, data=arr)
            else:
                hf.attrs[k] = str(v)
        # the reference's demo vocabulary names the with-robot render
        # stream "robot_demo" (collect_clutter_data.py:94,130; --demo_type
        # choices config/__init__.py:265) — ours is "observations"; alias
        # it as an HDF5 hard link (zero extra storage) so --demo_type
        # robot_demo selects it by name and reference tooling finds it
        if "observations" in hf and "robot_demo" not in hf:
            hf["robot_demo"] = hf["observations"]


def load_demo(path: str) -> Dict:
    out = {}
    with h5py.File(path, "r") as hf:
        for k in hf.keys():
            out[k] = np.asarray(hf[k])
        for k, v in hf.attrs.items():
            out[k] = v
    return out


def list_demos(demo_dir: str) -> List[str]:
    if not os.path.isdir(demo_dir):
        return []
    return sorted(
        os.path.join(demo_dir, f) for f in os.listdir(demo_dir)
        if f.endswith(".hdf5")
    )


def demo_from_history(env, history) -> Dict:
    """Convert a scripted-demo history (envs/*.generate_demo) into the
    runner's demo container: per-step robot images, object-only goal images,
    masks, robot states, object poses, actions, flattened sim states."""
    obs = history["obs"]
    imgs = np.stack([o["observation"] for o in obs])
    masks = np.stack([o["masks"] for o in obs])
    robot_state = np.stack([o["states"] for o in obs])
    qpos = np.stack([o["qpos"] for o in obs])
    acs = np.stack(history["ac"]) if len(history["ac"]) else np.zeros((0,))
    demo = {
        "observations": imgs,
        "masks": masks,
        "robot_state": robot_state,
        "qpos": qpos,
        "actions": acs,
        "pushed_obj": int(history.get("pushed_obj", 0)),
    }
    if "sim_start" in history:
        demo["sim_start"] = np.asarray(history["sim_start"], np.float32)
    if "obj_poses" in obs[0]:
        demo["obj_poses"] = np.stack([o["obj_poses"] for o in obs])
    if "obj_qpos" in obs[0]:
        demo["obj_qpos"] = np.stack([o["obj_qpos"] for o in obs])
    return demo


def collect_demos(env, behavior: str, n: int, out_dir: str,
                  render_object_only: bool = True) -> List[str]:
    """Scripted demo collection -> HDF5 files (reference:
    src/dataset/collect_locobot_table_data.py:15-60 and siblings)."""
    paths = []
    for i in range(n):
        history = env.generate_demo(behavior)
        demo = demo_from_history(env, history)
        if render_object_only:
            # re-render every step robot-less by replaying sim states:
            # our envs are pure, so just strip the arm from the renderer
            objs = demo.get("obj_poses")
            if objs is None and "obj_qpos" in demo:
                objs = demo["obj_qpos"].reshape(len(demo["observations"]), -1, 7)[..., :3]
            if objs is not None:
                import jax.numpy as jnp

                imgs, _ = env.renderer.render_scene(
                    jnp.asarray(demo["qpos"]), jnp.asarray(objs),
                    np.full(env.num_objects, env.obj_half, np.float32),
                    env._colors, include_arm=False,
                )
                demo["object_only_demo"] = np.asarray(imgs)
                demo["object_inpaint_demo"] = np.asarray(imgs)
        path = os.path.join(out_dir, f"demo_{behavior}_{i}.hdf5")
        save_demo(path, demo)
        paths.append(path)
    return paths
