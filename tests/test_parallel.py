"""Sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tossctr_tpu.parallel.embedding import sharded_embedding_lookup
from tossctr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, build_mesh, mesh_axis_sizes
from tossctr_tpu.parallel.sharding import param_shardings, spec_for_param

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_axis_resolution():
    assert mesh_axis_sizes(8, -1, 1) == (8, 1)
    assert mesh_axis_sizes(8, -1, 2) == (4, 2)
    assert mesh_axis_sizes(8, 4, 2) == (4, 2)
    with pytest.raises(AssertionError):
        mesh_axis_sizes(8, 3, 2)


def test_build_mesh_shape():
    mesh = build_mesh(data=4, model=2)
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}


@pytest.mark.parametrize("model_axis", [1, 2, 4])
def test_sharded_lookup_matches_dense(model_axis):
    mesh = build_mesh(data=8 // model_axis, model=model_axis)
    rng = np.random.default_rng(0)
    V, D, B, L = 64, 16, 16, 10
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = rng.integers(0, V, (B, L)).astype(np.int32)
    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(DATA_AXIS, None)))
    out = sharded_embedding_lookup(tbl, ids_d, mesh)
    assert np.allclose(np.asarray(out), table[ids], atol=1e-6)


def test_sharded_lookup_gradient_scatter_add():
    """Backward must scatter-add into the owning shard, including
    duplicate ids, matching the dense gather gradient."""
    mesh = build_mesh(data=4, model=2)
    rng = np.random.default_rng(1)
    V, D, B, L = 32, 8, 8, 6
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = rng.integers(0, V, (B, L)).astype(np.int32)
    ids[:, 0] = ids[:, 1]  # force duplicates
    g = rng.normal(0, 1, (B, L, D)).astype(np.float32)

    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(DATA_AXIS, None)))

    def loss_sharded(t):
        return jnp.sum(sharded_embedding_lookup(t, ids_d, mesh) * g)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, jnp.asarray(ids), axis=0) * g)

    gs = jax.grad(loss_sharded)(tbl)
    gd = jax.grad(loss_dense)(jnp.asarray(table))
    assert np.allclose(np.asarray(gs), np.asarray(gd), atol=1e-5)


def test_sharded_lookup_under_jit():
    mesh = build_mesh(data=4, model=2)
    V, D = 40, 8
    table = np.arange(V * D, dtype=np.float32).reshape(V, D)
    ids = np.array([[0, 39, 20]], dtype=np.int32).repeat(8, axis=0)
    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(DATA_AXIS, None)))
    f = jax.jit(lambda t, i: sharded_embedding_lookup(t, i, mesh))
    out = f(tbl, ids_d)
    assert np.allclose(np.asarray(out), table[ids])


def test_param_sharding_registry():
    mesh = build_mesh(data=4, model=2)
    params = {
        "params": {
            "dare": {"emb_att": jnp.zeros((64, 8)), "aux_head": {"kernel": jnp.zeros((8, 1))}},
            "cat_embed": {"table_8": jnp.zeros((100, 8)), "proj_8": jnp.zeros((3, 8, 16))},
        }
    }
    sh = param_shardings(mesh, params)
    assert sh["params"]["dare"]["emb_att"].spec == P(MODEL_AXIS, None)
    # grouped cat tables REPLICATE by default (mesh.cat_sharding;
    # VERDICT r2 weak #7: sharded-without-exchange was hope, not design)
    assert sh["params"]["cat_embed"]["table_8"].spec == P()
    assert sh["params"]["dare"]["aux_head"]["kernel"].spec == P()
    assert sh["params"]["cat_embed"]["proj_8"].spec == P()  # 3D: not a table
    sh_row = param_shardings(mesh, params, shard_cat_tables=True)
    assert sh_row["params"]["cat_embed"]["table_8"].spec == P(MODEL_AXIS, None)
    assert sh_row["params"]["cat_embed"]["proj_8"].spec == P()


def test_data_parallel_loss_matches_single_device():
    """DP over the data axis: same loss and grads as single-device."""
    mesh = build_mesh(data=8, model=1)
    rng = np.random.default_rng(2)
    W = rng.normal(0, 1, (8, 4)).astype(np.float32)
    X = rng.normal(0, 1, (32, 8)).astype(np.float32)
    y = rng.normal(0, 1, (32, 4)).astype(np.float32)

    def loss(w, x, t):
        return jnp.mean((x @ w - t) ** 2)

    l0 = float(loss(jnp.asarray(W), jnp.asarray(X), jnp.asarray(y)))
    g0 = jax.grad(loss)(jnp.asarray(W), jnp.asarray(X), jnp.asarray(y))

    w_d = jax.device_put(jnp.asarray(W), NamedSharding(mesh, P()))
    x_d = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(DATA_AXIS, None)))
    y_d = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P(DATA_AXIS, None)))
    f = jax.jit(jax.value_and_grad(loss))
    l1, g1 = f(w_d, x_d, y_d)
    assert abs(float(l1) - l0) < 1e-6
    assert np.allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_a2a_lookup_matches_dense(model_axis):
    from tossctr_tpu.parallel.embedding import sharded_embedding_lookup_a2a

    mesh = build_mesh(data=8 // model_axis, model=model_axis)
    rng = np.random.default_rng(3)
    V, D, B, L = 64, 16, 16, 6
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = rng.integers(0, V, (B, L)).astype(np.int32)
    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
    )
    out = sharded_embedding_lookup_a2a(tbl, ids_d, mesh)
    assert np.allclose(np.asarray(out), table[ids], atol=1e-6)


def test_a2a_lookup_gradients():
    from tossctr_tpu.parallel.embedding import sharded_embedding_lookup_a2a

    mesh = build_mesh(data=2, model=4)
    rng = np.random.default_rng(4)
    V, D, B, L = 32, 8, 8, 5
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = rng.integers(0, V, (B, L)).astype(np.int32)
    ids[:, 0] = ids[:, 1]  # duplicates
    g = rng.normal(0, 1, (B, L, D)).astype(np.float32)
    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
    )

    gs = jax.grad(lambda t: jnp.sum(sharded_embedding_lookup_a2a(t, ids_d, mesh) * g))(tbl)
    gd = jax.grad(lambda t: jnp.sum(jnp.take(t, jnp.asarray(ids), axis=0) * g))(
        jnp.asarray(table)
    )
    assert np.allclose(np.asarray(gs), np.asarray(gd), atol=1e-5)


def test_a2a_lookup_under_jit():
    from tossctr_tpu.parallel.embedding import sharded_embedding_lookup_a2a

    mesh = build_mesh(data=4, model=2)
    V, D = 48, 8
    table = np.arange(V * D, dtype=np.float32).reshape(V, D)
    ids = np.tile(np.array([[0, 47, 23, 24]], np.int32), (8, 1))
    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
    )
    out = jax.jit(lambda t, i: sharded_embedding_lookup_a2a(t, i, mesh))(tbl, ids_d)
    assert np.allclose(np.asarray(out), table[ids])


@pytest.mark.parametrize("model_axis", [2, 4])
@pytest.mark.parametrize("exact", [False, True], ids=["scatter", "dedup"])
def test_sharded_rowwise_adagrad_matches_unsharded(model_axis, exact):
    """Owner-masked local update on a P('model',None) table must equal
    the plain single-device rowwise_adagrad_update exactly."""
    from tossctr_tpu.parallel.embedding import sharded_rowwise_adagrad_update
    from tossctr_tpu.train.sparse_embed import (
        RowwiseAdagradState,
        rowwise_adagrad_update,
    )

    mesh = build_mesh(data=8 // model_axis, model=model_axis)
    rng = np.random.default_rng(7)
    V, D, B, K = 64, 8, 8, 6
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    accum = np.abs(rng.normal(0, 1, (V,))).astype(np.float32)
    ids = rng.integers(0, V, (B, K)).astype(np.int32)
    ids[:, 0] = ids[:, 1]  # duplicates
    ids[0, :2] = 0  # pad hits
    g = rng.normal(0, 1, (B, K, D)).astype(np.float32)

    want_t, want_st = rowwise_adagrad_update(
        jnp.asarray(table), RowwiseAdagradState(jnp.asarray(accum)),
        jnp.asarray(ids).reshape(-1), jnp.asarray(g).reshape(-1, D),
        lr=0.1, weight_decay=0.01, pad_row=0, exact_dedup=exact,
    )

    tbl = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(MODEL_AXIS, None)))
    acc = jax.device_put(jnp.asarray(accum), NamedSharding(mesh, P(MODEL_AXIS)))
    ids_d = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(DATA_AXIS, None)))
    g_d = jax.device_put(jnp.asarray(g), NamedSharding(mesh, P(DATA_AXIS, None, None)))
    got_t, got_acc = sharded_rowwise_adagrad_update(
        tbl, acc, ids_d, g_d, mesh,
        lr=0.1, weight_decay=0.01, pad_row=0, exact_dedup=exact,
    )
    assert np.allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6), (
        np.abs(np.asarray(got_t) - np.asarray(want_t)).max()
    )
    assert np.allclose(np.asarray(got_acc), np.asarray(want_st.accum), atol=1e-6)
    # still row-sharded on the way out
    assert got_t.sharding.spec == P(MODEL_AXIS, None)
