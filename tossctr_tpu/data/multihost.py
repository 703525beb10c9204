"""Multi-host input feeding (SURVEY.md §2.5/§7 "Determinism across hosts").

The reference is strictly single-process (one CUDA device,
reference train.py:126-139).  On a TPU pod every host must feed exactly
the rows of the global batch that live on its addressable devices, and
every host must agree on what the global batch *is* without
communicating.  The contract here:

  * The **global batch order is a pure function of
    (seed, fold, epoch)** — the samplers (data/sampler.py) are seeded
    host-independently, so every process computes the identical global
    index sequence from its own copy of the (small) label array.
  * Each process gathers only its **own row slice** of each global
    batch from the shard cache and assembles the global jax.Array with
    ``jax.make_array_from_process_local_data`` — no host ever touches
    another host's rows, and no cross-host traffic happens outside XLA
    collectives.
  * Row ownership is derived from the mesh: a global batch is sharded
    ``P('data', ...)``; the rows of process p are the union of the row
    ranges of its addressable devices along the data axis.

``process_index``/``process_count`` are injectable so single-process
tests can verify the N-process decomposition exactly: the concatenation
of every process's local rows (in device order) must equal the
single-process global batch (tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ..parallel.mesh import DATA_AXIS


def host_row_ranges(mesh, batch_size: int, process_index: Optional[int] = None):
    """Row ranges [(lo, hi), ...] of the global batch owned by this
    process, in the order ``make_array_from_process_local_data`` expects
    (addressable shards along the data axis, ascending).
    """
    if process_index is None:
        process_index = jax.process_index()
    n_data = mesh.shape[DATA_AXIS]
    assert batch_size % n_data == 0, (batch_size, n_data)
    rows_per = batch_size // n_data
    # device at data position i owns rows [i*rows_per, (i+1)*rows_per)
    mesh_devices = np.asarray(mesh.devices)
    ranges = []
    for i in range(n_data):
        row_devices = mesh_devices[i]  # all 'model' copies hold the same rows
        d0 = row_devices.flat[0]
        if d0.process_index == process_index:
            ranges.append((i * rows_per, (i + 1) * rows_per))
    # merge adjacent ranges for fewer gathers
    merged = []
    for lo, hi in sorted(ranges):
        if merged and merged[-1][1] == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def local_rows_of(global_rows: np.ndarray, ranges) -> np.ndarray:
    """This process's slice of a (B,) global-batch row-index vector."""
    return np.concatenate(
        [global_rows[lo:hi] for lo, hi in ranges]
    ) if ranges else np.zeros((0,), global_rows.dtype)


class MultiHostBatchIterator:
    """Per-host view of a :class:`~tossctr_tpu.data.loader.BatchIterator`
    stream: same sampler (same global order on every host), but each
    host gathers ONLY its own rows from the cache.

    Yields host batches whose arrays have the LOCAL row count; pair with
    :func:`make_global_device_put` to assemble global jax.Arrays.
    ``y``/``valid`` are yielded at GLOBAL size (host-side consumers —
    loss logging, metric masks — need the full view and the label/mask
    vectors are tiny).
    """

    def __init__(self, base_iterator, mesh, process_index: Optional[int] = None):
        self.base = base_iterator
        self.mesh = mesh
        self.ranges = host_row_ranges(
            mesh, base_iterator.batch_size, process_index
        )

    def set_epoch(self, epoch: int) -> None:
        self.base.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.base)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        sampler = self.base.sampler
        cache = self.base.cache
        bs = self.base.batch_size
        from .sampler import BalancedBatchSampler

        for idx in sampler:
            if isinstance(sampler, BalancedBatchSampler):
                gidx = self.base.index[idx]
            else:
                gidx = idx
            n = gidx.shape[0]
            pad = bs - n
            if pad > 0:
                gidx = np.concatenate([gidx, np.repeat(gidx[-1:], pad)])
            lidx = local_rows_of(gidx, self.ranges)
            batch = cache.gather(lidx, train=self.base.train)
            if self.base.train and "y" in batch:
                # global labels for host-side logging; the device path
                # re-assembles y from the local slice separately
                batch["y_local"] = batch.pop("y")
                batch["y"] = cache.labels()[gidx].astype(np.float32)
            batch["valid"] = (np.arange(bs) < n).astype(np.float32)
            yield batch


def make_global_device_put(mesh, batch_size: int):
    """device_put hook for :class:`DevicePrefetcher`: assembles each
    process-local batch into global jax.Arrays sharded ``P('data',...)``
    via ``jax.make_array_from_process_local_data``.  Host-only keys
    (``y_local``) are dropped; ``y``/``valid`` arrive at global size and
    are sliced back to this process's rows before assembly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ranges = host_row_ranges(mesh, batch_size)

    def put(batch):
        out = {}
        for k, v in batch.items():
            if k == "y_local":
                continue
            v = np.asarray(v)
            if v.shape[0] == batch_size and len(ranges) == 1 and (
                ranges[0] == (0, batch_size)
            ):
                local = v
            elif v.shape[0] == batch_size:
                local = np.concatenate([v[lo:hi] for lo, hi in ranges])
            else:
                local = v  # already local-sized
            sh = NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (v.ndim - 1)))
            )
            gshape = (batch_size,) + tuple(v.shape[1:])
            out[k] = jax.make_array_from_process_local_data(sh, local, gshape)
        return out

    return put
