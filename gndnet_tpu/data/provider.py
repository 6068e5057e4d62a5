"""Dataset providers: in-RAM cache + streaming loader + device prefetch.

Replaces the reference's torch-DataLoader stack (reference:
dataset_utils/dataset_provider.py):

* `GroundDataset` — eager in-RAM loader of `<split>/<seq>/reduced_velo/*.npy`
  (P x F float32 clouds) and `gnd_labels/*.npy` (H x W elevation grids) with a
  max_memory byte budget and frame skipping (reference kitti_gnd_sync,
  dataset_provider.py:172-243).
* `iterate_batches` — shuffled, drop_last batching (reference DataLoader args,
  dataset_provider.py:262-263).
* `StreamingLoader` — bounded-queue background-thread streaming from disk,
  the working equivalent of the reference's unused SharedMemory
  AsyncDataLoader (dataset_provider.py:26-169, whose label map aliases the
  data buffer — a bug we do not reproduce).
* `prefetch_to_device` — double-buffered `jax.device_put` so host decode
  overlaps device compute (the TPU-side analog of pin_memory + workers).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Iterator

import jax
import numpy as np


def index_frames(data_dir: str, split: str, skip_frames: int = 1):
    """List (cloud_path, label_path) pairs under data_dir/split/<seq>/."""
    root = os.path.join(data_dir, split)
    pairs = []
    for seq in sorted(os.listdir(root)):
        seq_path = os.path.join(root, seq)
        velo_dir = os.path.join(seq_path, "reduced_velo")
        label_dir = os.path.join(seq_path, "gnd_labels")
        if not os.path.isdir(velo_dir):
            continue
        files = sorted(os.listdir(velo_dir))
        for i in range(0, len(files), skip_frames):
            pairs.append(
                (os.path.join(velo_dir, files[i]),
                 os.path.join(label_dir, files[i]))
            )
    return pairs


class GroundDataset:
    """Eager in-RAM (clouds, labels) arrays with a byte budget."""

    def __init__(self, data_dir: str, split: str = "training",
                 skip_frames: int = 1, num_input_features: int = 3,
                 max_memory: float = 4e9,
                 logger: logging.Logger = logging.root):
        self.num_input_features = num_input_features
        pairs = index_frames(data_dir, split, skip_frames)
        if not pairs:
            raise FileNotFoundError(
                f"no frames under {data_dir}/{split}/<seq>/reduced_velo")
        clouds, labels, used = [], [], 0
        for cpath, lpath in pairs:
            cloud = np.load(cpath)[:, :num_input_features].astype(np.float32)
            label = np.load(lpath).astype(np.float32)
            need = cloud.nbytes + label.nbytes
            if used + need > max_memory:
                logger.warning(
                    "GroundDataset: stopping at %d/%d frames (%.1f MiB budget)",
                    len(clouds), len(pairs), max_memory / 2**20)
                break
            clouds.append(cloud)
            labels.append(label)
            used += need
        self.data = np.stack(clouds)
        self.labels = np.stack(labels)
        logger.info("GroundDataset[%s]: %d frames, %.1f MiB",
                    split, len(self.data), used / 2**20)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i], self.labels[i]


def iterate_batches(dataset, batch_size: int, shuffle: bool = True,
                    drop_last: bool = True, seed: int = 0,
                    epoch: int = 0) -> Iterator[tuple]:
    """Yield (clouds (B,P,F), labels (B,H,W)) numpy batches."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        idx = order[s:s + batch_size]
        yield dataset.data[idx], dataset.labels[idx]


class StreamingLoader:
    """Background-thread disk streaming with a bounded prefetch queue.

    Streams batches without holding the dataset in RAM; each epoch reshuffles
    the frame index.  This is the corrected equivalent of the reference's
    AsyncDataLoader SharedMemory ring (dataset_provider.py:26-127)."""

    def __init__(self, data_dir: str, split: str, batch_size: int,
                 skip_frames: int = 1, num_input_features: int = 3,
                 queue_depth: int = 4, seed: int = 0, drop_last: bool = True):
        self.pairs = index_frames(data_dir, split, skip_frames)
        if not self.pairs:
            raise FileNotFoundError(f"no frames under {data_dir}/{split}")
        self.batch_size = batch_size
        self.num_input_features = num_input_features
        self.queue_depth = queue_depth
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.pairs)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[tuple]:
        order = np.arange(len(self.pairs))
        np.random.default_rng(self.seed + epoch).shuffle(order)
        stop = len(order) - (len(order) % self.batch_size) if self.drop_last \
            else len(order)
        q: queue.Queue = queue.Queue(maxsize=self.queue_depth)
        stop_flag = threading.Event()

        def worker():
            try:
                for s in range(0, stop, self.batch_size):
                    if stop_flag.is_set():
                        return
                    idx = order[s:s + self.batch_size]
                    clouds = np.stack([
                        np.load(self.pairs[i][0])[:, :self.num_input_features]
                        .astype(np.float32) for i in idx])
                    labels = np.stack([
                        np.load(self.pairs[i][1]).astype(np.float32)
                        for i in idx])
                    q.put((clouds, labels))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop_flag.set()


def prefetch_to_device(iterator: Iterator, size: int = 2) -> Iterator:
    """Keep `size` batches resident on device ahead of the consumer.

    The TPU-side analog of the reference's pin_memory + worker prefetch
    (dataset_provider.py:256-263): `jax.device_put` is async, so enqueueing
    transfers ahead overlaps host decode and PCIe/ICI copy with device compute.
    """
    buf = []
    for item in iterator:
        buf.append(jax.device_put(item))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
