"""Sharded (pod-scale) pytree checkpoints.

VERDICT r2 #4: the plain msgpack path (`checkpoint.save_pytree`)
device_gets the ENTIRE params tree — a >5 GB (100M rows: >25 GB) host
pull and single-file write per save.  This module writes row-sharded
arrays SHARD BY SHARD: peak host memory is one table shard, each
process writes only the shards it can address (multi-host safe — shard
files are keyed by global row offset, so processes write disjoint
files), and restore can place each shard directly onto its target
device without ever assembling the full array on host.

Layout of a sharded checkpoint directory:

    <dir>/
      index.json          # {key: {shape, dtype, kind, rows: [[r0, r1], ...]}}
      dense.msgpack       # all replicated/small leaves in one blob
      <key>.r<r0>.npy     # one file per unique dim-0 shard of big arrays

Only dim-0 (row) sharding exists in this framework
(PartitionSpec('model', None) tables / ('model',) accumulators), which
keeps the format trivial and the mapping auditable.

The reference has no equivalent (single-GPU torch.save); this is the
TPU-native addition SURVEY.md §5 (checkpoint/resume) calls for at pod
scale.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

SEP = "/"


def _flatten(state: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in state.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _is_row_sharded(x) -> bool:
    """True when x is a jax.Array partitioned (only) along dim 0."""
    if not isinstance(x, jax.Array):
        return False
    try:
        sharding = x.sharding
    except Exception:  # noqa: BLE001 — e.g. fully-deleted arrays
        return False
    if sharding.is_fully_replicated or len(sharding.device_set) <= 1:
        return False
    shard_shape = sharding.shard_shape(x.shape)
    if shard_shape[0] == x.shape[0]:
        return False  # partitioned on some other dim (not produced here)
    assert shard_shape[1:] == x.shape[1:], (
        f"only dim-0 sharding is supported, got {x.shape} -> {shard_shape}"
    )
    return True


def _fname(key: str, r0: int) -> str:
    return key.replace(SEP, "__") + f".r{r0}.npy"


def save_sharded_pytree(dir_path: str, tree: Any) -> str:
    """Write ``tree`` (a pytree of arrays / jax.Arrays) into ``dir_path``.

    Row-sharded leaves stream out one shard file at a time (host memory
    = one shard); everything else goes into one msgpack blob.  In a
    multi-process run every process calls this with the same tree;
    each writes its addressable shards, process 0 writes the blob and
    index.
    """
    os.makedirs(dir_path, exist_ok=True)
    state = serialization.to_state_dict(tree)
    flat = _flatten(state) if isinstance(state, dict) else {"__leaf__": state}

    index: Dict[str, Dict] = {}
    dense: Dict[str, Any] = {}
    proc0 = jax.process_index() == 0
    for key, leaf in flat.items():
        if leaf is None:
            if proc0:
                index[key] = {"kind": "none"}
            continue
        if _is_row_sharded(leaf):
            rows_written = []
            seen = set()
            for shard in leaf.addressable_shards:
                r0 = shard.index[0].start or 0
                if r0 in seen:
                    continue  # replicated over 'data': one copy suffices
                seen.add(r0)
                data = np.asarray(shard.data)
                np.save(os.path.join(dir_path, _fname(key, r0)), _to_storable(data))
                rows_written.append([int(r0), int(r0 + data.shape[0])])
            index[key] = {
                "kind": "sharded",
                "shape": list(leaf.shape),
                "dtype": str(leaf.dtype),
                "rows": sorted(rows_written),
            }
        else:
            dense[key] = np.asarray(jax.device_get(leaf))
            index[key] = {"kind": "dense"}
    if proc0:
        with open(os.path.join(dir_path, "dense.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(_unflatten(dense)))
        # In multi-host runs each process contributed different row
        # entries; the index stores the GLOBAL layout derived from the
        # sharding instead of only what this process wrote.
        for key, leaf in flat.items():
            if index.get(key, {}).get("kind") == "sharded":
                rows = sorted(
                    {
                        (idx[0].start or 0,
                         idx[0].stop if idx[0].stop is not None else leaf.shape[0])
                        for _, idx in leaf.sharding.devices_indices_map(leaf.shape).items()
                    }
                )
                index[key]["rows"] = [[int(a), int(b)] for a, b in rows]
        tmp = os.path.join(dir_path, "index.json.tmp")
        with open(tmp, "w") as f:
            json.dump(index, f, indent=1)
        os.replace(tmp, os.path.join(dir_path, "index.json"))
    return dir_path


def is_sharded_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, "index.json"))


def _load_rows(dir_path: str, key: str, entry: Dict, r0: int, r1: int) -> np.ndarray:
    """Rows [r0, r1) of a sharded entry, reading only the covering files."""
    parts = []
    for a, b in entry["rows"]:
        if b <= r0 or a >= r1:
            continue
        arr = np.load(os.path.join(dir_path, _fname(key, a)), mmap_mode="r")
        lo, hi = max(r0, a), min(r1, b)
        parts.append(np.asarray(arr[lo - a: hi - a]))
    if not parts:
        raise FileNotFoundError(f"{key}: rows [{r0},{r1}) missing from checkpoint")
    out = np.concatenate(parts, 0) if len(parts) > 1 else parts[0]
    if out.shape[0] != r1 - r0:
        raise ValueError(f"{key}: rows [{r0},{r1}) incomplete in checkpoint")
    return out


def load_sharded_pytree(
    dir_path: str,
    target: Any = None,
    shardings: Any = None,
    shardings_fn=None,
) -> Any:
    """Restore a checkpoint written by :func:`save_sharded_pytree`.

    ``shardings`` (optional) is a pytree of NamedSharding matching
    ``target``; sharded entries are then placed device shard by device
    shard (``jax.make_array_from_single_device_arrays``) — the full
    array never exists on host.  ``shardings_fn(key, shape) ->
    NamedSharding`` is the structure-free alternative (e.g.
    ``parallel.sharding.registry_shardings_fn``) when no target tree
    exists yet.  Without either, sharded entries are assembled on host
    as numpy (fine for tests / small models).
    """
    with open(os.path.join(dir_path, "index.json")) as f:
        index = json.load(f)
    with open(os.path.join(dir_path, "dense.msgpack"), "rb") as f:
        dense = _flatten(serialization.msgpack_restore(f.read()))

    flat_shardings: Dict[str, Any] = {}
    if shardings is not None:
        flat_shardings = _flatten(serialization.to_state_dict(shardings))
    elif shardings_fn is not None:
        for key, entry in index.items():
            if entry.get("kind") == "sharded":
                flat_shardings[key] = shardings_fn(key, tuple(entry["shape"]))

    flat: Dict[str, Any] = {}
    for key, entry in index.items():
        kind = entry.get("kind")
        if kind == "none":
            flat[key] = None
        elif kind == "dense":
            flat[key] = dense[key]
        else:
            shape = tuple(entry["shape"])
            sh = flat_shardings.get(key)
            if sh is not None and getattr(sh, "device_set", None):
                arrays = []
                for dev, idx in sh.addressable_devices_indices_map(shape).items():
                    r0 = idx[0].start or 0
                    r1 = idx[0].stop if idx[0].stop is not None else shape[0]
                    host = _from_storable(
                        _load_rows(dir_path, key, entry, r0, r1), entry["dtype"]
                    )
                    arrays.append(jax.device_put(host, dev))
                flat[key] = jax.make_array_from_single_device_arrays(
                    shape, sh, arrays
                )
            else:
                flat[key] = _from_storable(
                    _load_rows(dir_path, key, entry, 0, shape[0]), entry["dtype"]
                )
    state = _unflatten(flat)
    if "__leaf__" in state and len(state) == 1:
        state = state["__leaf__"]
    if target is not None:
        return serialization.from_state_dict(target, state)
    return state


def _to_storable(arr: np.ndarray) -> np.ndarray:
    """np.save cannot round-trip ml_dtypes (bfloat16 etc.); store the
    raw bits as a same-width unsigned-int view.  The index records the
    true dtype for the reverse view."""
    if arr.dtype.kind == "V" or arr.dtype.name not in _NATIVE_DTYPES:
        return np.ascontiguousarray(arr).view(_UINT_BY_WIDTH[arr.dtype.itemsize])
    return arr


def _from_storable(arr: np.ndarray, dtype_str: str) -> np.ndarray:
    import jax.numpy as jnp

    want = jnp.dtype(dtype_str)
    if arr.dtype == want:
        return arr
    if want.name not in _NATIVE_DTYPES:
        return np.ascontiguousarray(arr).view(want)  # bit-exact reverse view
    return arr.astype(want)


_NATIVE_DTYPES = {
    "float16", "float32", "float64", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64", "bool",
}
_UINT_BY_WIDTH = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


class AsyncSaver:
    """One-slot background saver: a save is handed to a worker thread so
    the train loop keeps stepping while shards stream to disk.  A new
    save waits for the previous one (bounded memory, ordered writes)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn, *args, **kw):
        self.wait()

        def run():
            try:
                fn(*args, **kw)
            except BaseException as e:  # noqa: BLE001 — surfaced on next wait()
                self._err = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
