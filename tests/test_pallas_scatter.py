"""Sweep-merge scatter kernel vs the XLA scatter oracle (interpret mode).

The kernel replaces ``table.at[ids].add(delta)`` / the no-sort rowwise
AdaGrad path; every case checks against those exact semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tossctr_tpu.ops.pallas_scatter import (
    rowwise_adagrad_sweep_update,
    sweep_rows_add,
)
from tossctr_tpu.train.sparse_embed import (
    RowwiseAdagradState,
    rowwise_adagrad_update,
)


def _oracle_add(tables, ids, deltas):
    return [
        t.at[ids].add(d.astype(t.dtype)) for t, d in zip(tables, deltas)
    ]


@pytest.mark.parametrize("v,sb", [(1024, 64), (1000, 64), (300, 32)])
def test_sweep_matches_scatter_f32(v, sb):
    rng = np.random.default_rng(0)
    n, d = 500, 8
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    tables = [
        jnp.asarray(rng.normal(size=(v, d)), jnp.float32) for _ in range(2)
    ]
    deltas = [
        jnp.asarray(rng.normal(size=(n, d)), jnp.float32) for _ in range(2)
    ]
    got = sweep_rows_add(
        tables, ids, deltas, superblock=sb, interpret=True
    )
    want = _oracle_add(tables, ids, deltas)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_sweep_hot_id_multi_chunk():
    # one id takes >> max_chunk occurrences -> multiple chunk iterations
    rng = np.random.default_rng(1)
    v, n, d, sb = 512, 800, 8, 64
    ids = np.full(n, 37, np.int64)
    ids[::7] = rng.integers(0, v, ids[::7].shape[0])
    ids = jnp.asarray(ids, jnp.int32)
    table = jnp.zeros((v, d), jnp.float32)
    delta = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    got = sweep_rows_add(
        [table], ids, [delta], superblock=sb, interpret=True
    )[0]
    want = _oracle_add([table], ids, [delta])[0]
    # fp32 deltas merge via hi+lo bf16 MXU passes (~1e-5 relative); the
    # ~685-dup hot row accumulates that to ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_sweep_drops_out_of_range():
    v, d = 256, 8
    ids = jnp.asarray([0, 5, v, v + 7, -1, 5], jnp.int32)
    table = jnp.ones((v, d), jnp.float32)
    delta = jnp.ones((ids.shape[0], d), jnp.float32)
    got = sweep_rows_add(
        [table], ids, [delta], superblock=32, interpret=True
    )[0]
    want = table.at[jnp.asarray([0, 5, 5])].add(1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_bf16_tables():
    rng = np.random.default_rng(2)
    v, n, d = 512, 300, 16
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.bfloat16)
    delta = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    got = sweep_rows_add(
        [table], ids, [delta], superblock=64, interpret=True
    )[0]
    want = table.at[ids].add(delta.astype(jnp.bfloat16))
    # fp32 in-kernel accumulation vs XLA's bf16 sequential adds
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.15
    )


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adagrad_sweep_matches_no_sort_path(wd):
    rng = np.random.default_rng(3)
    v, n, d, pad = 640, 400, 8, 0
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    lr = 0.05
    tabs, accs, grads = [], [], []
    for _ in range(2):
        tabs.append(jnp.asarray(rng.normal(size=(v, d)), jnp.float32))
        accs.append(jnp.asarray(rng.uniform(0, 0.5, v), jnp.float32))
        grads.append(jnp.asarray(rng.normal(size=(n, d)), jnp.float32))
    got_t, got_a = rowwise_adagrad_sweep_update(
        tabs, accs, ids, grads,
        lr=lr, weight_decay=wd, pad_row=pad,
        superblock=64, interpret=True,
    )
    for i in range(2):
        want_t, want_s = rowwise_adagrad_update(
            tabs[i], RowwiseAdagradState(accum=accs[i]), ids, grads[i],
            lr=lr, weight_decay=wd, pad_row=pad, exact_dedup=False,
        )
        np.testing.assert_allclose(
            np.asarray(got_a[i]), np.asarray(want_s.accum), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_t[i]), np.asarray(want_t), atol=1e-4
        )


def test_sweep_under_jit_with_traced_lr():
    """The trainer calls this inside a jitted step with a schedule-traced
    lr; make sure nothing requires concrete values."""
    rng = np.random.default_rng(4)
    v, n, d = 256, 100, 8
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    acc = jnp.zeros((v,), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    @jax.jit
    def step(tab, acc, lr):
        (t,), (a,) = rowwise_adagrad_sweep_update(
            [tab], [acc], ids, [g],
            lr=lr, pad_row=0, superblock=32, interpret=True,
        )
        return t, a

    t, a = step(tab, acc, jnp.float32(0.1))
    want_t, want_s = rowwise_adagrad_update(
        tab, RowwiseAdagradState(accum=acc), ids, g,
        lr=0.1, pad_row=0, exact_dedup=False,
    )
    np.testing.assert_allclose(np.asarray(t), np.asarray(want_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(want_s.accum), atol=1e-5)
