"""Chunked table init: value semantics + the pod-scale memory bound.

VERDICT r3 weak #6: the pod drill peaked at 16.76 GB host RSS for a
0.51 GB table because ``jax.random.normal`` over the full (V, W) shape
materializes O(V*W) generation temporaries per device and XLA's SPMD
partitioner does not partition the draw (every automatic form measured
15-24 GB; ops/table_init.py header).  The fix defines the table on a
fixed global chunk grid and generates per shard under shard_map.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.table_init import (
    chunked_normal_init,
    sharded_chunked_normal_init,
    table_chunk_grid,
)


def test_grid_is_pure_function_of_rows():
    assert table_chunk_grid(10_000_000) == 128
    assert table_chunk_grid(100_000_000) == 256
    assert table_chunk_grid(2_000_000) == 128
    assert table_chunk_grid(999_999) == 1  # odd: single chunk


def test_small_tables_match_plain_normal():
    """At or below the threshold the initializer IS the plain draw."""
    key = jax.random.PRNGKey(3)
    a = chunked_normal_init(0.5, jnp.float32)(key, (1024, 16))
    b = jax.random.normal(key, (1024, 16), jnp.float32) * 0.5
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sharded_init_matches_unsharded_values():
    """Mesh-layout independence: the trajectory-parity tests fresh-init
    on each mesh, so the shard_map draw must equal the 1-device draw."""
    from tossctr_tpu.parallel.mesh import build_mesh

    V, W = 2_097_152, 8  # > threshold, small width keeps the test fast
    key = jax.random.PRNGKey(7)
    plain = np.asarray(chunked_normal_init(1.0, jnp.float32)(key, (V, W)))
    for model_axis in (2, 4):
        mesh = build_mesh(
            data=8 // model_axis, model=model_axis, devices=jax.devices()[:8]
        )
        init = sharded_chunked_normal_init(1.0, jnp.float32, mesh)
        sharded = np.asarray(jax.jit(lambda k: init(k, (V, W)))(key))
        assert np.array_equal(sharded, plain), model_axis
    # statistical sanity: N(0,1)
    assert abs(plain.mean()) < 0.01
    assert abs(plain.std() - 1.0) < 0.01


def test_pod_init_rss_bound(tmp_path):
    """Peak host RSS of the full sharded state init + one train step at
    a (2M, 128) bf16 table on the 8-virtual-device mesh, measured in a
    clean subprocess (exp/pod_rss_probe.py).  Before the chunked init
    this peaked at 18.2 GB (init) — a replicated full-table RNG draw
    per virtual device; the bound fails loudly if that regresses."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "exp", "pod_rss_probe.py"),
         "--vocab", "2000000", "--out", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    marks = json.loads("{" + out.stdout.split("{", 1)[1])
    # Assert GROWTH over the post-build baseline: the absolute
    # high-water is environment-sensitive (under heavy host load the
    # child's baseline itself was measured at 11+ GB before any table
    # work), but the table phases' growth is what the chunked init
    # bounds.  Clean-machine measurement: build 0.3 -> init 2.97 ->
    # first step 6.95 GB (budgets ~1.5x the deltas).
    base = marks["build"]
    assert marks["state_init"] - base < 4.2, marks
    assert marks["first_step"] - base < 10.0, marks
    assert marks["first_step"] < 25.0, marks  # lenient absolute roof


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
