"""Host batching + background prefetch.

Replaces torch DataLoader + collate_pair_fn (reference
lib/data_loaders.py:31-85, 1839-1845): items are padded raw clouds (no CPU
voxelization — that's on device), batches are assembled by a tiny
thread-pool prefetcher (file reads release the GIL; the host has 1 vCPU in
the target environment, so heavy CPU work here would starve the chip).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from eyoc_tpu.training.pipeline import RawBatch


def collate_items(items, point_capacity: int) -> RawBatch:
    B = len(items)
    P = point_capacity
    xyz0 = np.zeros((B, P, 3), np.float32)
    xyz1 = np.zeros((B, P, 3), np.float32)
    n0 = np.zeros(B, np.int32)
    n1 = np.zeros(B, np.int32)
    T = np.zeros((B, 4, 4), np.float32)
    fd = np.zeros(B, np.int32)
    sr = np.zeros(B, np.float32)
    for b, it in enumerate(items):
        a, c = it["xyz0"][:P], it["xyz1"][:P]
        xyz0[b, : len(a)] = a
        xyz1[b, : len(c)] = c
        n0[b], n1[b] = len(a), len(c)
        T[b] = it["T_gt"]
        fd[b] = it["frame_distance"]
        sr[b] = it["search_radius"]
    return RawBatch(xyz0, n0, xyz1, n1, T, fd, sr)


class DataLoader:
    """shuffle + drop_last batching with a 2-deep background prefetcher."""

    def __init__(self, dataset, batch_size: int, point_capacity: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.point_capacity = point_capacity
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[RawBatch]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for i in range(nb):
                    if stop.is_set():
                        return
                    idx = order[i * self.batch_size: (i + 1) * self.batch_size]
                    items = [self.dataset[int(j)] for j in idx]
                    q.put(collate_items(items, self.point_capacity))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def make_data_loader(config, phase: str, batch_size: int, shuffle=None):
    """Reference-compatible factory (lib/data_loaders.py:1809-1847)."""
    from eyoc_tpu.data.datasets import dataset_str_mapping

    if shuffle is None:
        shuffle = phase != "test"
    Dataset = dataset_str_mapping[config.dataset]
    # augmentations apply to train phases only (reference lib/data_loaders.py:1824-1831)
    use_rot = config.use_random_rotation if phase in ("train", "trainval") else False
    use_scale = config.use_random_scale if phase in ("train", "trainval") else False
    dset = Dataset(phase, config, random_rotation=use_rot, random_scale=use_scale)
    return DataLoader(
        dset, batch_size, point_capacity=config.raw_point_capacity,
        shuffle=shuffle, seed=config.get("seed", 0),
    )
