"""Batch samplers.

``BalancedBatchSampler`` reproduces the reference's fixed
pos_fraction-per-batch sampler (src/data/sampler.py:6-60): each batch
draws ``round(bs*pos_fraction)`` positives and the rest negatives, with
replacement, from ``np.random.default_rng(seed + epoch)``.

Faithful quirk, made explicit: the reference never calls
``set_epoch`` (train.py never does), so batches repeat across epochs.
Here ``set_epoch`` is called by the training loop by default;
``reseed_each_epoch=False`` restores the literal reference behaviour.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np


class BalancedBatchSampler:
    def __init__(
        self,
        y: np.ndarray,
        batch_size: int,
        pos_fraction: float = 0.5,
        num_batches: Optional[int] = None,
        replacement: bool = True,
        seed: int = 777,
        drop_last: bool = True,
        reseed_each_epoch: bool = True,
    ):
        y = np.asarray(y)
        assert y.ndim == 1
        self.y = y.astype(np.int8, copy=False)
        self.batch_size = int(batch_size)
        self.pos_fraction = float(pos_fraction)
        self.replacement = bool(replacement)
        self.seed = int(seed)
        self.epoch = 0
        self.reseed_each_epoch = bool(reseed_each_epoch)

        self.pos_idx = np.where(self.y == 1)[0]
        self.neg_idx = np.where(self.y == 0)[0]
        assert len(self.pos_idx) > 0 and len(self.neg_idx) > 0, (
            "BalancedBatchSampler requires both classes."
        )
        n = len(y)
        if num_batches is None:
            nb = n // self.batch_size if drop_last else math.ceil(n / self.batch_size)
        else:
            nb = int(num_batches)
        self.num_batches = max(1, nb)
        self.n_pos = int(round(self.batch_size * self.pos_fraction))
        self.n_neg = self.batch_size - self.n_pos

    def set_epoch(self, epoch: int) -> None:
        if self.reseed_each_epoch:
            self.epoch = int(epoch)

    def __iter__(self) -> Iterator[np.ndarray]:
        g = np.random.default_rng(self.seed + self.epoch)
        P, N = len(self.pos_idx), len(self.neg_idx)
        for _ in range(self.num_batches):
            if self.replacement:
                p_sel = self.pos_idx[g.integers(0, P, size=self.n_pos)]
                n_sel = self.neg_idx[g.integers(0, N, size=self.n_neg)]
            else:
                if self.n_pos > P or self.n_neg > N:
                    raise ValueError(
                        "replacement=False but class pool smaller than per-batch need"
                    )
                p_sel = self.pos_idx[g.permutation(P)[: self.n_pos]]
                n_sel = self.neg_idx[g.permutation(N)[: self.n_neg]]
            batch = np.concatenate([p_sel, n_sel])
            g.shuffle(batch)
            yield batch

    def __len__(self) -> int:
        return self.num_batches


class ShuffleBatchSampler:
    """Plain per-epoch permutation sampler (DataLoader(shuffle=True)
    equivalent, reference train.py:108), with drop_last padding control."""

    def __init__(
        self,
        n_or_index,
        batch_size: int,
        seed: int = 777,
        shuffle: bool = True,
        drop_last: bool = True,
    ):
        if np.isscalar(n_or_index):
            self.index = np.arange(int(n_or_index), dtype=np.int64)
        else:
            self.index = np.asarray(n_or_index, dtype=np.int64)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        n = self.index.shape[0]
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = self.index
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            idx = idx[g.permutation(idx.shape[0])]
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]
