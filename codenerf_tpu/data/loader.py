"""Host-side batch iterator with per-host sharded sampling.

Replaces the reference's torch DataLoader + RandomSampler/DistributedSampler
stack (view_synthesis/utils/util.py:59-90) with a seeded numpy pipeline:

  * training: sampling WITH replacement, matching
    ``RandomSampler(replacement=True, num_samples=iterations)`` (util.py:73-77)
  * multi-host: each host draws from its own disjoint stream (distinct seed
    per process), the TPU-native analog of per-rank seeding (train.py:29-31);
    validation uses a SHARED seed so every host sees the identical batch
    (replacing broadcast_object_list, eval.py:112-115)
  * batches are stacked numpy dicts ready for device put
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from codenerf_tpu.data.srn import SRNDataset
from codenerf_tpu.data.blender import BlenderNeRFDataset
from codenerf_tpu.data.llff import LLFFDataset

DATASET_REGISTRY = {
    "SRNDataset": SRNDataset,
    "BlenderNeRFDataset": BlenderNeRFDataset,
    "llff": LLFFDataset,
    "LLFFDataset": LLFFDataset,
}


def build_dataset(cfg_dataset, stage: str):
    """String-keyed dataset registry (reference util.py:68 getattr pattern)."""
    cls = DATASET_REGISTRY.get(cfg_dataset.type)
    if cls is None:
        raise ValueError(f"unknown dataset type: {cfg_dataset.type}")
    if cls is BlenderNeRFDataset:
        return cls(cfg_dataset.basedir, stage,
                   resolution_level=cfg_dataset.resolution_level)
    if cls is LLFFDataset:
        return cls(cfg_dataset.basedir, stage,
                   downsample_factor=cfg_dataset.downsample_factor,
                   llffhold=cfg_dataset.llffhold)
    return cls(cfg_dataset.basedir, stage)


def _stack(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class BatchIterator:
    """Infinite with-replacement batch stream over a dataset.

    Args:
      dataset: any registry dataset (len + __getitem__ -> sample dict).
      batch_size: per-host batch size.
      seed: RNG seed; pass ``seed + process_index`` for distinct per-host
        training streams, plain ``seed`` for host-identical validation.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        idx = self.rng.integers(0, len(self.dataset), size=self.batch_size)
        return self._load(idx)

    def _load(self, idx) -> dict:
        # batched native pipeline when the dataset provides one
        if hasattr(self.dataset, "load_views"):
            return self.dataset.load_views(idx)
        return _stack([self.dataset[int(i)] for i in idx])

    def fixed_batch(self, start: int = 0) -> dict:
        """Deterministic sequential batch (for validation picks, e.g. the
        reference's 6th-val-batch convention at eval.py:108-109)."""
        n = len(self.dataset)
        idx = [(start * self.batch_size + i) % n
               for i in range(self.batch_size)]
        return self._load(idx)


class PrefetchIterator:
    """Background-thread prefetch wrapper around any batch iterator.

    Decodes the next batch(es) while the device runs the current step —
    the host-side analog of the reference's (unused) DataLoader workers
    (util.py:88 sets num_workers=0).  Bounded queue, daemon thread.
    """

    def __init__(self, iterator, depth: int = 2, to_device: bool = False,
                 device_keys=("pose", "color", "object_id")):
        import queue
        import threading

        self._it = iterator
        self._q = queue.Queue(maxsize=max(1, depth))
        self._err = None

        def ship(batch):
            # Upload on the prefetch thread so the host->device transfer
            # overlaps the previous step instead of serializing with the
            # dispatch (on a tunneled TPU each synchronous transfer costs
            # a full RTT; measured ~22 ms/step of sustained-throughput
            # loss in the flagship train loop).  Single-device only —
            # sharded inputs are distributed by pjit from host numpy.
            import jax
            return {k: (jax.device_put(v) if k in device_keys else v)
                    for k, v in batch.items()}

        def worker():
            try:
                while True:
                    item = next(self._it)
                    if to_device:
                        item = ship(item)
                    self._q.put(item)
            except Exception as e:  # surfaced on the consumer side
                self._err = e
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise self._err
        return item
