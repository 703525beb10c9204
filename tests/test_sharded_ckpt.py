"""Sharded (pod-scale) checkpoint save/restore (VERDICT r2 #4).

Row-sharded arrays must stream out shard-by-shard (never a full-array
host pull), restore bit-exactly on host, and restore DIRECTLY into a
target sharding — including a different mesh layout than the one that
saved (re-sharding restore), which is what elastic pod restarts need.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tossctr_tpu.parallel.mesh import build_mesh
from tossctr_tpu.train.sharded_ckpt import (
    AsyncSaver,
    is_sharded_checkpoint,
    load_sharded_pytree,
    save_sharded_pytree,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tree(mesh):
    rng = np.random.default_rng(0)
    table = rng.normal(0, 1, (64, 32)).astype(jnp.bfloat16)
    accum = rng.random(64).astype(np.float32)
    dense = rng.normal(0, 1, (8, 4)).astype(np.float32)
    tree = {
        "params": {
            "dare": {
                "emb_tables": jax.device_put(
                    jnp.asarray(table), NamedSharding(mesh, P("model", None))
                )
            },
            "dense": {"w": jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P()))},
        },
        "accum": jax.device_put(jnp.asarray(accum), NamedSharding(mesh, P("model"))),
        "none_entry": None,
        "step": jnp.int32(7),
    }
    host = {
        "params": {"dare": {"emb_tables": table}, "dense": {"w": dense}},
        "accum": accum,
        "none_entry": None,
        "step": np.int32(7),
    }
    return tree, host


def test_save_restore_host_roundtrip(tmp_path):
    mesh = build_mesh(data=4, model=2)
    tree, host = _tree(mesh)
    d = save_sharded_pytree(str(tmp_path / "ckpt"), tree)
    assert is_sharded_checkpoint(d)
    with open(os.path.join(d, "index.json")) as f:
        index = json.load(f)
    # big table stored as 2 row-shard files (model axis = 2)
    e = index["params/dare/emb_tables"]
    assert e["kind"] == "sharded" and e["rows"] == [[0, 32], [32, 64]]
    assert index["params/dense/w"]["kind"] == "dense"
    assert index["none_entry"]["kind"] == "none"

    out = load_sharded_pytree(d)
    tbl = out["params"]["dare"]["emb_tables"]
    assert tbl.dtype == jnp.bfloat16  # bit-exact bf16 round-trip
    assert np.array_equal(
        np.asarray(tbl, np.float32),
        np.asarray(host["params"]["dare"]["emb_tables"], np.float32),
    )
    assert np.array_equal(out["accum"], host["accum"])
    assert np.array_equal(out["params"]["dense"]["w"], host["params"]["dense"]["w"])
    assert out["none_entry"] is None or out["none_entry"] == {}


@pytest.mark.parametrize("restore_model_axis", [2, 4])
def test_restore_into_sharding(tmp_path, restore_model_axis):
    """Restore straight into device shardings — same mesh layout and a
    DIFFERENT one (4-way rows from 2-way shard files)."""
    save_mesh = build_mesh(data=4, model=2)
    tree, host = _tree(save_mesh)
    d = save_sharded_pytree(str(tmp_path / "ckpt"), tree)

    mesh = build_mesh(data=8 // restore_model_axis, model=restore_model_axis)
    shardings = {
        "params": {
            "dare": {"emb_tables": NamedSharding(mesh, P("model", None))},
            "dense": {"w": NamedSharding(mesh, P())},
        },
        "accum": NamedSharding(mesh, P("model")),
        "none_entry": None,
        "step": None,
    }
    out = load_sharded_pytree(d, shardings=shardings)
    tbl = out["params"]["dare"]["emb_tables"]
    assert isinstance(tbl, jax.Array)
    assert tbl.sharding.spec == P("model", None)
    assert tbl.sharding.shard_shape(tbl.shape)[0] == 64 // restore_model_axis
    assert np.array_equal(
        np.asarray(tbl, np.float32),
        np.asarray(host["params"]["dare"]["emb_tables"], np.float32),
    )
    acc = out["accum"]
    assert acc.sharding.spec == P("model")
    assert np.array_equal(np.asarray(acc), host["accum"])


def test_async_saver_orders_and_propagates(tmp_path):
    mesh = build_mesh(data=4, model=2)
    tree, _ = _tree(mesh)
    s = AsyncSaver()
    s.submit(save_sharded_pytree, str(tmp_path / "a"), tree)
    s.submit(save_sharded_pytree, str(tmp_path / "b"), tree)  # waits for a
    s.wait()
    assert is_sharded_checkpoint(str(tmp_path / "a"))
    assert is_sharded_checkpoint(str(tmp_path / "b"))

    def boom():
        raise RuntimeError("disk gone")

    s.submit(boom)
    with pytest.raises(RuntimeError, match="disk gone"):
        s.wait()
