"""Bucketed a2a gradient return for the sharded rowwise-AdaGrad update
(VERDICT r3 #6 — parallel/embedding.sharded_rowwise_adagrad_update_a2a).

The all-gather form moves O(global B*K*D) bytes to every device; the
bucketed form routes each unique id's (deduped) gradient only to its
owning shard.  Results must match the unsharded exact-dedup update to
float tolerance (fp32 partial-sum order differs by design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.parallel.embedding import (
    sharded_rowwise_adagrad_update,
    sharded_rowwise_adagrad_update_a2a,
)
from tossctr_tpu.parallel.mesh import build_mesh
from tossctr_tpu.train.sparse_embed import (
    RowwiseAdagradState,
    rowwise_adagrad_update,
)

V, W, B, K = 512, 16, 16, 8
PAD = 0


def _data(seed, zipfish=False):
    rng = np.random.default_rng(seed)
    if zipfish:
        # heavy duplicates: half the ids drawn from 4 hot rows
        hot = rng.choice([3, 77, 200, 450], (B, K))
        uni = rng.integers(0, V, (B, K))
        ids = np.where(rng.random((B, K)) < 0.5, hot, uni)
    else:
        ids = rng.integers(0, V, (B, K))
    ids[0, :2] = PAD
    grads = rng.normal(0, 1, (B, K, W)).astype(np.float32)
    grads[0, :2] = 0.0  # pad rows carry zero grads (masked forward)
    table = rng.normal(0, 1, (V, W)).astype(np.float32)
    accum = np.abs(rng.normal(0, 0.1, (V,))).astype(np.float32)
    return (jnp.asarray(ids, jnp.int32), jnp.asarray(grads),
            jnp.asarray(table), jnp.asarray(accum))


@pytest.mark.parametrize("model_axis", [2, 4])
@pytest.mark.parametrize("zipfish", [False, True], ids=["uniform", "hot"])
def test_a2a_grad_return_matches_exact_dedup(model_axis, zipfish):
    ids, grads, table, accum = _data(0, zipfish)
    ref_t, ref_st = rowwise_adagrad_update(
        table, RowwiseAdagradState(accum), ids.reshape(-1), grads,
        lr=0.05, weight_decay=1e-3, pad_row=PAD, exact_dedup=True,
    )
    mesh = build_mesh(data=8 // model_axis, model=model_axis,
                      devices=jax.devices()[:8])
    got_t, got_acc = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh,
        lr=0.05, weight_decay=1e-3, pad_row=PAD, cap_factor=2.0,
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(ref_t), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_acc), np.asarray(ref_st.accum), atol=2e-5
    )
    # pad row untouched
    assert np.array_equal(np.asarray(got_t)[PAD], np.asarray(table)[PAD])


def test_a2a_matches_allgather_form():
    ids, grads, table, accum = _data(1)
    mesh = build_mesh(data=4, model=2, devices=jax.devices()[:8])
    ag_t, ag_acc = sharded_rowwise_adagrad_update(
        table, accum, ids, grads, mesh,
        lr=0.02, weight_decay=0.0, pad_row=PAD, exact_dedup=True,
    )
    a2a_t, a2a_acc = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh,
        lr=0.02, weight_decay=0.0, pad_row=PAD,
    )
    np.testing.assert_allclose(np.asarray(a2a_t), np.asarray(ag_t), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a2a_acc), np.asarray(ag_acc), atol=2e-5
    )


def test_halves_fused_layout():
    """Lane-fused (V, 2*Dh) table with a (V, 2) accumulator."""
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, V, (B, K)), jnp.int32)
    grads = jnp.asarray(rng.normal(0, 1, (B, K, W)).astype(np.float32))
    table = jnp.asarray(rng.normal(0, 1, (V, W)).astype(np.float32))
    accum = jnp.asarray(np.abs(rng.normal(0, 0.1, (V, 2))).astype(np.float32))
    ref_t, ref_st = rowwise_adagrad_update(
        table, RowwiseAdagradState(accum), ids.reshape(-1), grads,
        lr=0.05, pad_row=PAD, exact_dedup=True, halves=2,
    )
    mesh = build_mesh(data=4, model=2, devices=jax.devices()[:8])
    got_t, got_acc = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh, lr=0.05, pad_row=PAD, halves=2,
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_acc), np.asarray(ref_st.accum), atol=2e-5
    )


def test_overflow_drops_are_bounded_not_fatal():
    """cap_factor far below 1 forces bucket overflow: the update must
    still run (overflow DROPS, by contract) and touched rows must be a
    subset of the reference's."""
    ids, grads, table, accum = _data(4)
    mesh = build_mesh(data=4, model=2, devices=jax.devices()[:8])
    got_t, _ = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh, lr=0.05, pad_row=PAD,
        cap_factor=0.05,
    )
    changed = np.any(np.asarray(got_t) != np.asarray(table), axis=1)
    ref_t, _ = rowwise_adagrad_update(
        table, RowwiseAdagradState(accum), ids.reshape(-1), grads,
        lr=0.05, pad_row=PAD, exact_dedup=True,
    )
    ref_changed = np.any(np.asarray(ref_t) != np.asarray(table), axis=1)
    assert changed.sum() > 0
    assert np.all(~changed | ref_changed)  # subset of reference rows


def test_drop_counter_observes_overflow():
    """VERDICT r4 #5: the production drop counter (utils/log.riders via
    jax.debug.callback) must report forced overflow and stay silent in
    the healthy regime."""
    from tossctr_tpu.utils.log import riders

    ids, grads, table, accum = _data(5)
    mesh = build_mesh(data=4, model=2, devices=jax.devices()[:8])

    riders.read_and_reset("t_overflow")  # clean slate
    got_t, _ = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh, lr=0.05, pad_row=PAD,
        cap_factor=0.05, drop_counter="t_overflow",
    )
    jax.block_until_ready(got_t)
    jax.effects_barrier()
    dropped = riders.read_and_reset("t_overflow")
    assert dropped > 0, "forced overflow must be reported"

    got_t2, _ = sharded_rowwise_adagrad_update_a2a(
        table, accum, ids, grads, mesh, lr=0.05, pad_row=PAD,
        cap_factor=2.0, drop_counter="t_overflow",
    )
    jax.block_until_ready(got_t2)
    jax.effects_barrier()
    assert riders.read_and_reset("t_overflow") == 0
