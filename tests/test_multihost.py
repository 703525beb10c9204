"""Multi-host input feeding (data/multihost.py).

(a) decomposition: for any process count, the per-process local rows
    concatenated in data-axis order must reproduce the single-process
    global batch exactly, for every batch of the epoch — the SURVEY §7
    "identical global batches regardless of process count" contract.
(b) a real 2-process jax.distributed run on localhost CPU drives
    make_array_from_process_local_data + a psum'd loss and checks both
    processes agree with the single-process value.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tossctr_tpu.data.loader import BatchIterator
from tossctr_tpu.data.multihost import (
    MultiHostBatchIterator,
    host_row_ranges,
    local_rows_of,
)


class _FakeDev:
    def __init__(self, process_index):
        self.process_index = process_index


class _FakeMesh:
    """n_data x n_model device grid split contiguously over n_proc."""

    def __init__(self, n_data, n_model, n_proc):
        assert (n_data * n_model) % n_proc == 0
        per = n_data * n_model // n_proc
        devs = [_FakeDev(i // per) for i in range(n_data * n_model)]
        self.devices = np.asarray(devs, dtype=object).reshape(n_data, n_model)
        self.shape = {"data": n_data, "model": n_model}


@pytest.mark.parametrize("n_proc", [1, 2, 4])
def test_host_row_ranges_partition(n_proc):
    mesh = _FakeMesh(8, 1, n_proc)
    B = 64
    all_rows = []
    for p in range(n_proc):
        for lo, hi in host_row_ranges(mesh, B, process_index=p):
            all_rows.extend(range(lo, hi))
    assert all_rows == list(range(B))  # exact disjoint cover, in order


def test_multihost_batches_reassemble_to_global(tmp_path):
    from tossctr_tpu.data.synth import write_synth_train_test
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.config import Config
    import yaml

    root = str(tmp_path)
    write_synth_train_test(root, n_train=1200, n_test=100, seed=7)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "synth_small.yaml")
    ) as f:
        d = yaml.safe_load(f)
    d["data"].update(
        train_path=os.path.join(root, "train.parquet"),
        test_path=os.path.join(root, "test.parquet"),
        cache_dir=os.path.join(root, "cache"),
    )
    cfg = Config.from_dict(d)
    man_tr, _ = build_train_and_test(cfg)

    from tossctr_tpu.data.dataset import ShardCache

    cache = ShardCache(man_tr)
    idx = np.arange(len(cache))
    B = 128

    def one_epoch(it):
        it.set_epoch(1)
        return list(iter(it))

    ref = one_epoch(
        BatchIterator(cache, idx, batch_size=B, train=True, shuffle=True, seed=3)
    )

    n_proc = 4
    mesh = _FakeMesh(8, 1, n_proc)
    views = []
    for p in range(n_proc):
        base = BatchIterator(
            cache, idx, batch_size=B, train=True, shuffle=True, seed=3
        )
        views.append(
            one_epoch(MultiHostBatchIterator(base, mesh, process_index=p))
        )

    assert all(len(v) == len(ref) for v in views)
    for bi, gb in enumerate(ref):
        for key in ("X_num", "X_cat", "seq"):
            recon = np.concatenate([views[p][bi][key] for p in range(n_proc)])
            np.testing.assert_array_equal(recon, gb[key])
        for p in range(n_proc):
            # y and valid are global-size on every host
            np.testing.assert_array_equal(views[p][bi]["y"], gb["y"])
            np.testing.assert_array_equal(views[p][bi]["valid"], gb["valid"])
            # y_local is this host's slice of global y
            ranges = host_row_ranges(mesh, B, process_index=p)
            np.testing.assert_array_equal(
                views[p][bi]["y_local"], local_rows_of(gb["y"], ranges)
            )


_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def test_two_process_distributed_cpu(tmp_path):
    """Real jax.distributed 2-process run on localhost CPU: global batch
    assembly via make_array_from_process_local_data + a psum'd mean must
    match the single-process value computed here."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(2):
        e = dict(
            env,
            TOSSCTR_MH_PORT=str(port),
            TOSSCTR_MH_PID=str(pid),
            TOSSCTR_MH_OUT=str(tmp_path / f"out_{pid}.txt"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                env=e,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    vals = []
    for pid in range(2):
        with open(tmp_path / f"out_{pid}.txt") as f:
            vals.append(float(f.read().strip()))
    # single-process reference: mean over the identical global batch
    rng = np.random.default_rng(123)
    x = rng.normal(0, 1, (16, 4)).astype(np.float32)
    want = float((x * 2.0).mean())
    np.testing.assert_allclose(vals, [want, want], rtol=1e-6)
