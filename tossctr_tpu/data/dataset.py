"""Online shard-cache reading: batch-granular gathers over mmap'd NPY.

Replaces the reference's per-row ``Dataset.__getitem__`` + DataLoader
worker pool (src/data/dataset.py:8-124) with whole-batch vectorized
gathers — the per-row Python hop is the input-pipeline bottleneck the
SURVEY flags (§7 "Input pipeline throughput").  A batch of global
indices is located with one ``searchsorted`` over shard bounds and
fetched with one fancy-index per touched shard, directly producing the
model's host arrays.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

_KEYS = ["X_num", "X_mask", "X_cat", "seq", "y", "groups", "ids"]


def _use_native_gather() -> bool:
    """Native threaded gather, on by default when the library builds;
    TOSSCTR_NATIVE_GATHER=0 disables."""
    import os

    if os.environ.get("TOSSCTR_NATIVE_GATHER", "1") == "0":
        return False
    try:
        from ..native.build import have_fastgather

        return have_fastgather()
    except Exception:
        return False


class _Shard:
    def __init__(self, meta: dict):
        self.meta = meta
        self.rows = int(meta["rows"])
        self.start = int(meta["start"])
        self.end = int(meta["end"])
        self._arrs: Optional[Dict[str, np.ndarray]] = None

    @property
    def arrs(self) -> Dict[str, np.ndarray]:
        if self._arrs is None:
            a = {}
            for k in _KEYS:
                if k in self.meta and isinstance(self.meta[k], dict):
                    # ids are small; load eagerly (reference dataset.py:17-27)
                    mmap = None if k == "ids" else "r"
                    a[k] = np.load(self.meta[k]["path"], mmap_mode=mmap)
            self._arrs = a
        return self._arrs


class ShardCache:
    """Global-index view over a shard-cache manifest.

    ``gather(idx)`` returns the batch dict for arbitrary global indices
    (order preserved).  Used for both training batches and full-scan
    inference.
    """

    def __init__(self, manifest_path: str):
        with open(manifest_path, "r") as f:
            self.manifest = json.load(f)
        self.shards = [_Shard(m) for m in self.manifest["shards"]]
        self.ends = np.array([s.end for s in self.shards], dtype=np.int64)
        self.starts = np.array([s.start for s in self.shards], dtype=np.int64)
        self.rows = int(self.manifest["rows"])
        self.num_cols: List[str] = self.manifest.get("num_cols", [])
        self.cat_cols: List[str] = self.manifest.get("cat_cols", [])

    def __len__(self) -> int:
        return self.rows

    @property
    def dims(self) -> Dict[str, int]:
        """Feature dims from shard-0 metadata (reference train.py:121-124)."""
        m0 = self.manifest["shards"][0]
        return {
            "X_num": int(m0["X_num"]["shape"][1]),
            "X_mask": int(m0["X_mask"]["shape"][1]),
            "X_cat": int(m0["X_cat"]["shape"][1]),
            "seq_len": int(m0["seq"]["shape"][1]),
        }

    def gather(self, idx: np.ndarray, train: bool = True) -> Dict[str, np.ndarray]:
        idx = np.asarray(idx, dtype=np.int64)
        sid = np.searchsorted(self.ends, idx, side="right")
        n = idx.shape[0]
        batch: Dict[str, np.ndarray] = {}
        # allocate once from dims
        d = self.dims
        batch["X_num"] = np.empty((n, d["X_num"]), np.float32)
        batch["X_mask"] = np.empty((n, d["X_mask"]), np.float32)
        batch["X_cat"] = np.empty((n, d["X_cat"]), np.int32)
        batch["seq"] = np.empty((n, d["seq_len"]), np.int32)
        if train:
            batch["y"] = np.empty((n,), np.float32)
        else:
            batch["ids"] = np.empty((n,), dtype="U64")
        keys = ["X_num", "X_mask", "X_cat", "seq"] + (["y"] if train else [])
        for s in np.unique(sid):
            sel = sid == s
            li = idx[sel] - self.starts[s]
            arrs = self.shards[s].arrs
            # sort local indices for sequential mmap access, then unsort
            order = np.argsort(li, kind="stable")
            inv = np.empty_like(order)
            inv[order] = np.arange(order.size)
            li_sorted = li[order]
            raw = self._gather_raw(arrs, keys, li_sorted)
            batch["X_num"][sel] = raw["X_num"].astype(np.float32, copy=False)[inv]
            batch["X_mask"][sel] = raw["X_mask"].astype(np.float32)[inv]
            batch["X_cat"][sel] = raw["X_cat"][inv]
            batch["seq"][sel] = raw["seq"][inv]
            if train:
                batch["y"][sel] = raw["y"].astype(np.float32)[inv]
            elif "ids" in arrs:
                batch["ids"][sel] = arrs["ids"][li_sorted][inv]
        return batch

    def _gather_raw(self, arrs, keys, li_sorted) -> Dict[str, np.ndarray]:
        """Per-shard raw row gather; uses the native threaded gather
        (tossctr_tpu/native) when available, NumPy otherwise."""
        if _use_native_gather():
            from ..native.build import gather_rows_multi_native

            srcs = [arrs[k] for k in keys]
            outs = [
                np.empty((li_sorted.shape[0],) + arrs[k].shape[1:], arrs[k].dtype)
                for k in keys
            ]
            if gather_rows_multi_native(srcs, li_sorted, outs):
                return dict(zip(keys, outs))
        return {k: arrs[k][li_sorted] for k in keys}

    def labels(self) -> np.ndarray:
        return np.concatenate([np.asarray(s.arrs["y"]) for s in self.shards])

    def groups(self) -> np.ndarray:
        return np.concatenate([np.asarray(s.arrs["groups"]) for s in self.shards])


def load_labels_groups_for_split(manifest_path: str):
    """y, groups concatenated across shards for CV splitting
    (reference: src/data/dataset.py:82-96)."""
    cache = ShardCache(manifest_path)
    return cache.labels(), cache.groups()
