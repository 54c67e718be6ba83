"""Packed record shards: HDF5 trajectories -> fixed-shape npz shards.

Reference parity: the RoboNet hdf5 -> TFRecord converter and RecordDataset
(reference: robonet/robonet/datasets/util/hdf5_2_records.py,
robonet/robonet/datasets/record_dataset.py). TPU-native equivalent: decode
and preprocess each trajectory ONCE (resize, normalize, autograsp — the
exact robonet_hdf5 reader semantics), then pack many episodes into
fixed-shape compressed .npz shards. Training then streams shards with zero
per-item decode cost — the host-side throughput path for large runs.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

from robot_aware_control_tpu.config import Config

_KEYS = ("images", "states", "actions", "masks", "qpos")


def convert_to_records(config: Config, hdf5_files: List[str],
                       robot_viewpoints: List[str], out_dir: str,
                       episodes_per_shard: int = 64) -> List[str]:
    """Preprocess + pack episodes into shards. Episodes are truncated to
    config.video_length frames (fixed shapes => zero recompiles)."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    ds = RoboNetHDF5Dataset(hdf5_files, robot_viewpoints, config)
    os.makedirs(out_dir, exist_ok=True)
    shards = []
    buf: Dict[str, list] = {k: [] for k in _KEYS}
    metas = []
    shard_i = 0

    def flush():
        nonlocal shard_i, buf, metas
        if not metas:
            return
        path = os.path.join(out_dir, f"shard_{shard_i:05d}.npz")
        arrays = {k: np.stack(v) for k, v in buf.items() if v}
        np.savez_compressed(path, **arrays)
        with open(path + ".json", "w") as f:
            json.dump(metas, f)
        shards.append(path)
        shard_i += 1
        buf = {k: [] for k in _KEYS}
        metas = []

    for i in range(len(ds)):
        item = ds[i]
        T = config.video_length
        for k in _KEYS:
            arr = np.asarray(item[k])
            n = T - 1 if k == "actions" else T
            buf[k].append(arr[:n])
        metas.append({"robot": item["robot"], "folder": item["folder"],
                      "file_path": item["file_path"]})
        if len(metas) >= episodes_per_shard:
            flush()
    flush()
    return shards


class RecordDataset:
    """Shard-backed dataset with the loader's __getitem__/__len__ contract
    (reference: record_dataset.py). Shards are mmap-cached per worker."""

    def __init__(self, shard_dir: str, config: Optional[Config] = None):
        self.paths = sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no shards under {shard_dir}")
        self._meta = []
        self._index = []  # (shard_idx, episode_idx)
        self._sizes = []
        for si, p in enumerate(self.paths):
            with open(p + ".json") as f:
                metas = json.load(f)
            self._meta.append(metas)
            self._sizes.append(len(metas))
            self._index.extend((si, ei) for ei in range(len(metas)))
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self):
        return len(self._index)

    def _shard(self, si: int):
        if si not in self._cache:
            with np.load(self.paths[si]) as z:
                self._cache[si] = {k: z[k] for k in z.files}
            if len(self._cache) > 2:  # keep the working set small
                old = next(iter(self._cache))
                if old != si:
                    del self._cache[old]
        return self._cache[si]

    def __getitem__(self, idx: int) -> Dict:
        si, ei = self._index[idx]
        shard = self._shard(si)
        meta = self._meta[si][ei]
        out = {k: shard[k][ei] for k in shard}
        out.update(meta)
        out["idx"] = idx
        return out
