"""Input pipeline: epoch-sharded sampling + threaded prefetch.

TPU-first replacement for the reference's DataLoader-of-strings +
synchronous in-loop decode (engine/forgery_engine.py:243-258, SURVEY.md §3.5
"the known input bottleneck"):

* `EpochSampler` reproduces DistributedSampler semantics — per-epoch
  shuffling with seed=epoch (set_epoch), padding to an even shard split, and
  drop_last batching — but shards by *host process* (multi-host JAX) rather
  than per-GPU rank, because one process drives all local devices;
* `BatchPrefetcher` runs decode + crop + host-resize in a thread pool
  (cv2 releases the GIL) several batches ahead, so the accelerator never
  waits on JPEG decode. The device-side normalize/flip/corrupt stage is fused
  into the train/eval step by the engine.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class EpochSampler:
    """Shuffled, sharded, batched index stream with set_epoch re-seeding
    (DistributedSampler parity; engine/forgery_engine.py:243-248)."""

    def __init__(
        self,
        dataset_len: int,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        shard_id: int = 0,
        num_shards: int = 1,
        seed: int = 0,
    ):
        self.dataset_len = dataset_len
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        per_shard = -(-self.dataset_len // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            order = g.permutation(self.dataset_len)
        else:
            order = np.arange(self.dataset_len)
        # pad so every shard sees the same count (DistributedSampler behavior)
        per_shard = -(-len(order) // self.num_shards)
        total = per_shard * self.num_shards
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        shard = order[self.shard_id :: self.num_shards]
        n_batches = len(self)
        for b in range(n_batches):
            chunk = shard[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) == 0:
                return
            yield chunk


class InfiniteBatcher:
    """Step-driven batch stream over (dataset, sampler): re-seeds the sampler
    each time it is exhausted, mirroring the engines' iterator-refresh idiom
    (engine/forgery_engine.py:243-248 re-seeds with the current step)."""

    def __init__(self, dataset, sampler: EpochSampler, load_kwargs: Optional[dict] = None):
        self.dataset = dataset
        self.sampler = sampler
        self.load_kwargs = load_kwargs or {}
        self._it = None
        self._count = 0

    def __len__(self):
        return len(self.sampler)

    def next_batch(self, cur_step: int):
        if self._it is None or self._count >= len(self.sampler):
            self.sampler.set_epoch(cur_step)
            self._it = iter(self.sampler)
            self._count = 0
        idx = next(self._it)
        self._count += 1
        items = [self.dataset.images[i] for i in idx]
        labels = np.asarray([self.dataset.targets[i] for i in idx], np.int64)
        # WildDeepfake joins root in __getitem__; honor dataset overrides
        if hasattr(self.dataset, "__getitem__"):
            items = [self.dataset[i][0] for i in idx]
        out = self.dataset.load_item(items, labels, **self.load_kwargs)
        out["label"] = labels
        return out


class BatchPrefetcher:
    """Run a batch-producing callable several steps ahead on worker threads.

    produce(cur_step) must be thread-safe per call. Batches come out in step
    order. depth=2 double-buffers host IO against device compute.
    """

    def __init__(self, produce: Callable[[int], dict], depth: int = 2,
                 num_steps: int = 0, start_step: int = 1):
        self.produce = produce
        self.depth = depth
        self.num_steps = num_steps
        self.start_step = start_step
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = False

    def _run(self):
        for step in range(self.start_step, self.num_steps + 1):
            if self._stop.is_set():
                return
            try:
                batch = self.produce(step)
            except Exception as e:  # surface in the consumer
                self._q.put(e)
                return
            self._q.put(batch)

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        for _ in range(self.start_step, self.num_steps + 1):
            item = self._q.get()
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()


def parallel_load(dataset, items, labels, load_kwargs, pool: ThreadPoolExecutor, chunk: int = 8):
    """Decode a batch with a thread pool (cv2 drops the GIL during imdecode).
    Used by the engines for large eval batches."""
    if len(items) <= chunk:
        return dataset.load_item(items, labels, **load_kwargs)
    futs = []
    for i in range(0, len(items), chunk):
        futs.append(
            pool.submit(dataset.load_item, items[i : i + chunk], labels[i : i + chunk], **load_kwargs)
        )
    outs = [f.result() for f in futs]
    merged = {"images": np.concatenate([o["images"] for o in outs], axis=0)}
    merged["path"] = sum((o["path"] for o in outs), [])
    for k in outs[0]:
        if k not in merged:
            vals = [o[k] for o in outs if o[k] is not None]
            merged[k] = np.concatenate(vals, axis=0) if vals else None
    return merged
