"""Host-side batch iteration + async device prefetch.

The reference feeds the model with a multi-worker PyTorch DataLoader
(train.py:106-110).  The TPU-native equivalent is: whole-batch NumPy
gathers from the shard cache (dataset.py), a background prefetch thread
that stages the next batches on device while the current step runs, and
**static shapes** — XLA compiles one program per shape, so the last
partial batch is padded up to ``batch_size`` and carries a ``valid``
mask instead of a smaller shape (SURVEY.md §7 "Input pipeline
throughput").
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import ShardCache
from .sampler import BalancedBatchSampler, ShuffleBatchSampler


class BatchIterator:
    """Yields host batches (dicts of numpy arrays) with static shapes.

    train=True  -> includes ``y``; drops the last partial batch when the
                   sampler says so.
    train=False -> includes ``ids`` and a ``valid`` mask; the final
                   partial batch is padded to full size.
    """

    def __init__(
        self,
        cache: ShardCache,
        index: Optional[np.ndarray] = None,
        *,
        batch_size: int,
        train: bool = True,
        shuffle: bool = False,
        seed: int = 777,
        sampler=None,
        drop_last: Optional[bool] = None,
    ):
        self.cache = cache
        self.index = (
            np.arange(len(cache), dtype=np.int64) if index is None else np.asarray(index)
        )
        self.batch_size = int(batch_size)
        self.train = train
        if drop_last is None:
            drop_last = train
        if sampler is not None:
            self.sampler = sampler
        else:
            self.sampler = ShuffleBatchSampler(
                self.index, batch_size, seed=seed, shuffle=shuffle, drop_last=drop_last
            )

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self.sampler:
            if isinstance(self.sampler, BalancedBatchSampler):
                # balanced sampler indexes into its own index space (the
                # training subset); translate to global indices.
                gidx = self.index[idx]
            else:
                gidx = idx
            n = gidx.shape[0]
            pad = self.batch_size - n
            if pad > 0:
                gidx = np.concatenate([gidx, np.repeat(gidx[-1:], pad)])
            batch = self.cache.gather(gidx, train=self.train)
            batch["valid"] = (
                np.arange(self.batch_size) < n
            ).astype(np.float32)
            yield batch


class DevicePrefetcher:
    """Background-thread prefetcher: stages up to ``depth`` batches on
    device (optionally with a NamedSharding) while compute runs."""

    _SENTINEL = object()

    def __init__(self, it, device_put=None, depth: int = 2):
        import jax

        self._it = it
        self._depth = depth
        if device_put is None:
            device_put = lambda b: jax.device_put(b)  # noqa: E731
        self._device_put = device_put
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                ids = batch.pop("ids", None)
                dev = self._device_put(batch)
                if ids is not None:
                    dev = dict(dev)
                    dev["ids"] = ids
                self._q.put(dev)
        except BaseException as e:  # surface in consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
