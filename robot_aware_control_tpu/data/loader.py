"""Host data pipeline: threaded decode + time-first batching + device
prefetch.

Replaces the torch DataLoader/`get_batch`/`process_batch` machinery
(reference: src/dataset/robonet/robonet_dataset.py:434-467 and the
per-robot loader factories in src/dataset/*/*_dataloaders.py) with a
double-buffered pipeline: worker threads decode HDF5 into pinned numpy,
batches are stacked time-first (T, B, ...), and the next batch is uploaded
to HBM while the current one computes.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np

from robot_aware_control_tpu.config import Config

_STACK_KEYS = (
    "images", "states", "actions", "masks", "qpos", "heatmaps",
    "raw_actions", "raw_states",
)
_META_KEYS = ("robot", "folder", "file_path", "idx")
_PER_ELEM_KEYS = ("low", "high", "raw_low", "raw_high", "high_movement")


def collate_time_first(items: Sequence[Dict]) -> Dict:
    """Stack per-episode dicts into a time-first batch
    (reference transpose: robonet_dataset.py:434-451)."""
    batch: Dict = {}
    for k in _STACK_KEYS:
        if k in items[0]:
            batch[k] = np.stack([it[k] for it in items], axis=1)
    for k in _META_KEYS:
        if k in items[0]:
            batch[k] = [it[k] for it in items]
    for k in _PER_ELEM_KEYS:
        if k in items[0]:
            batch[k] = np.stack([np.asarray(it[k]) for it in items])
    return batch


class DataLoader:
    """Threaded, seeded, infinite or epoch iteration over a dataset with
    __getitem__/__len__ returning per-episode dicts."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size].tolist()
                for i in range(nb)]

    def _iter_epoch(self, epoch: int) -> Iterator[Dict]:
        batches = self._epoch_indices(epoch)
        q: queue.Queue = queue.Queue(maxsize=2 * self.num_workers)
        stop = threading.Event()

        def worker(worker_id):
            for bi in range(worker_id, len(batches), self.num_workers):
                if stop.is_set():
                    return
                items = [self.dataset[i] for i in batches[bi]]
                q.put((bi, collate_time_first(items)))
            q.put((None, None))

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        finished, buffered, want = 0, {}, 0
        try:
            while finished < self.num_workers or buffered:
                if want in buffered:
                    yield buffered.pop(want)
                    want += 1
                    continue
                bi, batch = q.get()
                if bi is None:
                    finished += 1
                    continue
                buffered[bi] = batch
        finally:
            stop.set()

    def __iter__(self):
        return self._iter_epoch(0)

    def infinite(self) -> Iterator[Dict]:
        epoch = 0
        while True:
            yield from self._iter_epoch(epoch)
            epoch += 1


def device_prefetch(it: Iterator[Dict], mesh=None, size: int = 2,
                    batch_axis_index: int = 1):
    """Upload batches ahead of compute (double buffering HBM transfers).

    With a mesh, arrays go through `parallel.mesh.shard_batch`, which under
    multi-process JAX assembles each host's LOCAL batch into a globally
    sharded jax.Array (`jax.make_array_from_process_local_data`) — a plain
    device_put of local data with a global sharding would fail on the
    divisibility check."""
    buf: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def put(batch):
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        if mesh is not None:
            from robot_aware_control_tpu.parallel import mesh as pmesh

            arrays = pmesh.shard_batch(mesh, arrays, batch_axis_index)
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        meta = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        return {**arrays, **meta}

    stop = threading.Event()

    def feeder():
        for batch in it:
            item = put(batch)
            while not stop.is_set():
                try:
                    buf.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
        buf.put(sentinel)

    threading.Thread(target=feeder, daemon=True).start()
    try:
        while True:
            item = buf.get()
            if item is sentinel:
                return
            yield item
    finally:
        # release the feeder when the consumer abandons the generator
        # (e.g. trainer finished its fixed epoch count over infinite())
        stop.set()


# ---------------------------------------------------------------------------
# loader factories mirroring the reference experiment dispatch
# (reference: src/dataset/robonet/robonet_dataloaders.py:21-80,
#  src/dataset/locobot/locobot_singleview_dataloader.py:12-147)


def discover_hdf5(root: str, subdirs: Optional[List[str]] = None):
    """List (path, robot_viewpoint) pairs under data_root."""
    pairs = []
    roots = [os.path.join(root, s) for s in subdirs] if subdirs else [root]
    for r in roots:
        for path in sorted(glob.glob(os.path.join(r, "**", "*.hdf5"), recursive=True)):
            vp = os.path.basename(os.path.dirname(path))
            pairs.append((path, vp))
    return pairs


def train_test_split(pairs, split: float, seed: int = 0):
    idx = np.arange(len(pairs))
    np.random.RandomState(seed).shuffle(idx)
    cut = int(len(pairs) * split)
    take = lambda ids: [pairs[i] for i in ids]
    return take(idx[:cut]), take(idx[cut:])


def _host_shard(pairs):
    """Per-host disjoint file shard (multi-host data feed; no-op on a
    single host). Every host must keep >=1 file so its loader can fill its
    slice of the global batch."""
    from robot_aware_control_tpu.parallel.mesh import host_shard_files

    shard = host_shard_files(pairs)
    return shard if shard else list(pairs)[:1]


def _host_batch(bs: int) -> int:
    """Per-host batch size: cfg batch sizes are GLOBAL; each host loads
    its share and `parallel.mesh.shard_batch` assembles the global array."""
    import jax

    return max(1, bs // jax.process_count())


def create_loaders(config: Config):
    """Train/test loaders over data_root (reference:
    robonet_dataloaders.py:21-80)."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    pairs = discover_hdf5(config.data_root)
    if not pairs:
        raise FileNotFoundError(f"no hdf5 under {config.data_root}")
    train, test = train_test_split(pairs, config.train_val_split, config.seed)
    train, test = _host_shard(train), _host_shard(test)

    def mk(pairs_, seed, bs):
        files = [p for p, _ in pairs_]
        robots = [r for _, r in pairs_]
        ds = RoboNetHDF5Dataset(files, robots, config, load_snippet=False, seed=seed)
        # never let a small split produce zero batches (drop_last)
        return DataLoader(
            ds, min(bs, max(len(ds), 1)), num_workers=config.data_threads,
            seed=seed,
        )

    return (mk(train, config.seed, _host_batch(config.batch_size)),
            mk(test, config.seed + 1, _host_batch(config.test_batch_size)))


def create_transfer_loader(config: Config):
    """Loader over the held-out transfer robot/viewpoint set (reference:
    locobot_singleview_dataloader.py:97-147)."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    pairs = discover_hdf5(config.data_root)
    files = [p for p, _ in pairs][: config.finetune_num_test]
    robots = [r for _, r in pairs][: config.finetune_num_test]
    ds = RoboNetHDF5Dataset(files, robots, config, seed=config.seed + 2)
    return DataLoader(ds, config.test_batch_size,
                      num_workers=config.data_threads, seed=config.seed + 2,
                      shuffle=False, drop_last=False)


def _robot_subdir_loaders(config: Config, subdirs):
    """Loaders over specific robot/viewpoint subdirectories."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    pairs = discover_hdf5(config.data_root, subdirs)
    if not pairs:
        raise FileNotFoundError(f"no hdf5 under {config.data_root}/{subdirs}")
    train, test = train_test_split(pairs, config.train_val_split, config.seed)
    train, test = _host_shard(train), _host_shard(test)

    def mk(pairs_, seed, bs):
        ds = RoboNetHDF5Dataset(
            [p for p, _ in pairs_], [r for _, r in pairs_], config, seed=seed
        )
        # never let a small split produce zero batches (drop_last)
        return DataLoader(ds, min(bs, max(len(ds), 1)),
                          num_workers=config.data_threads, seed=seed)

    return (
        mk(train, config.seed, _host_batch(config.batch_size)),
        mk(test, config.seed + 1, _host_batch(config.test_batch_size)),
    )


def create_sawyer_loaders(config: Config):
    """(reference: sawyer/sawyer_dataloaders.py:18-126)"""
    return _robot_subdir_loaders(config, ["sawyer_views"])


def create_widowx_loaders(config: Config):
    """(reference: widowx/widowx_dataloaders.py:10-66)"""
    return _robot_subdir_loaders(config, ["widowx_views"])


def create_baxter_loaders(config: Config):
    """(reference: baxter/baxter_dataloaders.py:13-69)"""
    return _robot_subdir_loaders(config, ["baxter_views"])


def create_locobot_loaders(config: Config):
    """(reference: locobot/locobot_singleview_dataloader.py:12-60)"""
    return _robot_subdir_loaders(config, ["locobot_views"])


def create_movement_loaders(config: Config):
    """Loaders restricted to videos labeled high-movement by the copy
    baseline (reference: robonet_dataloaders.py:210-327 movement-filtered
    loaders + obj_movement.pkl metadata)."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset
    from robot_aware_control_tpu.evaluation.obj_movement import (
        load_movement_metadata,
    )

    if not config.world_error_dict:
        raise ValueError("--world_error_dict required for movement loaders")
    meta = load_movement_metadata(config.world_error_dict)
    pairs = [p for p in discover_hdf5(config.data_root) if meta.get(p[0], False)]
    if not pairs:
        raise FileNotFoundError("no high-movement videos found")
    train, test = train_test_split(pairs, config.train_val_split, config.seed)
    train, test = _host_shard(train), _host_shard(test)

    def mk(pairs_, seed, bs):
        ds = RoboNetHDF5Dataset(
            [p for p, _ in pairs_], [r for _, r in pairs_], config, seed=seed
        )
        # never let a small split produce zero batches (drop_last)
        return DataLoader(ds, min(bs, max(len(ds), 1)),
                          num_workers=config.data_threads, seed=seed)

    return (
        mk(train, config.seed, _host_batch(config.batch_size)),
        mk(test, config.seed + 1, _host_batch(config.test_batch_size)),
    )


def create_finetune_loaders(config: Config):
    """Few-shot finetune split: first finetune_num_train files train,
    next finetune_num_test test (reference:
    locobot_singleview_dataloader.py:62-96)."""
    from robot_aware_control_tpu.data.robonet_hdf5 import RoboNetHDF5Dataset

    pairs = discover_hdf5(config.data_root)
    ntr, nte = config.finetune_num_train, config.finetune_num_test
    train_pairs, test_pairs = pairs[:ntr], pairs[ntr:ntr + nte]
    train_pairs, test_pairs = _host_shard(train_pairs), _host_shard(test_pairs)

    def mk(pairs_, seed, bs):
        ds = RoboNetHDF5Dataset(
            [p for p, _ in pairs_], [r for _, r in pairs_], config, seed=seed
        )
        return DataLoader(ds, bs, num_workers=config.data_threads, seed=seed)

    return (
        mk(train_pairs, config.seed, _host_batch(config.batch_size)),
        mk(test_pairs, config.seed + 1, _host_batch(config.test_batch_size)),
    )
