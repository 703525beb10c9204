"""Pallas kernels vs their jnp oracles, in interpret mode on CPU
(SURVEY.md §4e).  On-device numerics are spot-checked by bench tooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.fm_cross import fm_cross_multihead
from tossctr_tpu.ops.pallas_kernels import (
    dare_score_pallas,
    fm_cross_pallas,
    make_pallas_score_fn,
)
from tossctr_tpu.ops.topk_select import dare_select_ids, recency_log_decay


def _score_oracle(att, q, ids, log_decay, pad_id=0):
    s = np.einsum("bld,bd->bl", att.astype(np.float32), q.astype(np.float32))
    s = s + log_decay[None, :]
    s[ids == pad_id] = -1e9
    return s


@pytest.mark.parametrize("B,L,D", [(8, 32, 16), (16, 40, 64)])
def test_dare_score_matches_oracle(B, L, D):
    rng = np.random.default_rng(0)
    att = rng.normal(0, 1, (B, L, D)).astype(np.float32)
    q = rng.normal(0, 1, (B, D)).astype(np.float32)
    ids = rng.integers(0, 50, (B, L)).astype(np.int32)
    ids[:, :5] = 0
    att[ids == 0] = 0.0
    ld = np.asarray(recency_log_decay(L, 8.0))
    got = np.asarray(
        dare_score_pallas(
            jnp.asarray(att), jnp.asarray(q), jnp.asarray(ids), jnp.asarray(ld),
            block_b=8, interpret=True,
        )
    )
    want = _score_oracle(att, q, ids, ld)
    assert np.allclose(got, want, atol=1e-4)


def test_pallas_score_fn_in_selection():
    """End-to-end: dare_select_ids with the pallas score_fn picks the
    same indices as the jnp path."""
    rng = np.random.default_rng(1)
    V, D, B, L = 200, 16, 8, 24
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    table[0] = 0
    seq = rng.integers(1, V, (B, L)).astype(np.int32)
    seq[:, :6] = 0
    q = rng.normal(0, 1, (B, D)).astype(np.float32)
    idx_ref, sel_ref, _ = dare_select_ids(
        jnp.asarray(table), jnp.asarray(seq), jnp.asarray(q), top_k=6, tau=8.0, pad_id=0
    )
    score_fn = make_pallas_score_fn(block_b=8, interpret=True)
    idx_p, sel_p, _ = dare_select_ids(
        jnp.asarray(table), jnp.asarray(seq), jnp.asarray(q), top_k=6, tau=8.0,
        pad_id=0, score_fn=score_fn,
    )
    assert np.array_equal(np.asarray(sel_ref), np.asarray(sel_p))


@pytest.mark.parametrize("B,F,D,H,R,P", [(16, 12, 16, 2, 8, 16), (8, 7, 32, 3, 4, 8)])
def test_fm_cross_pallas_forward(B, F, D, H, R, P):
    rng = np.random.default_rng(2)
    z = rng.normal(0, 1, (B, F, D)).astype(np.float32)
    U = rng.normal(0, 0.1, (H, D, R)).astype(np.float32)
    V = rng.normal(0, 0.1, (H, R, P)).astype(np.float32)
    got = np.asarray(fm_cross_pallas(jnp.asarray(z), jnp.asarray(U), jnp.asarray(V), 8, True))
    want = np.asarray(fm_cross_multihead(jnp.asarray(z), jnp.asarray(U), jnp.asarray(V)))
    assert np.allclose(got, want, atol=1e-3)


def test_fm_cross_pallas_gradients():
    rng = np.random.default_rng(3)
    B, F, D, H, R, P = 16, 10, 16, 2, 8, 16
    z = jnp.asarray(rng.normal(0, 1, (B, F, D)).astype(np.float32))
    U = jnp.asarray(rng.normal(0, 0.1, (H, D, R)).astype(np.float32))
    V = jnp.asarray(rng.normal(0, 0.1, (H, R, P)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(0, 1, (B, H * P)).astype(np.float32))

    def loss_pallas(z, U, V):
        return jnp.sum(fm_cross_pallas(z, U, V, 8, True) * g_out)

    def loss_ref(z, U, V):
        return jnp.sum(fm_cross_multihead(z, U, V) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(z, U, V)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(z, U, V)
    for a, b, name in zip(gp, gr, ["dz", "dU", "dV"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_fm_cross_pallas_partial_block():
    """B not divisible by block_b exercises the grid remainder path."""
    rng = np.random.default_rng(4)
    B, F, D, H, R, P = 10, 6, 16, 2, 4, 8
    z = jnp.asarray(rng.normal(0, 1, (B, F, D)).astype(np.float32))
    U = jnp.asarray(rng.normal(0, 0.1, (H, D, R)).astype(np.float32))
    V = jnp.asarray(rng.normal(0, 0.1, (H, R, P)).astype(np.float32))
    got = np.asarray(fm_cross_pallas(z, U, V, 4, True))
    want = np.asarray(fm_cross_multihead(z, U, V))
    assert np.allclose(got, want, atol=1e-3)


def test_fm_cross_pallas_gradients_partial_block():
    """B not divisible by block_b: dU/dV sums must exclude garbage rows."""
    rng = np.random.default_rng(5)
    B, F, D, H, R, P = 10, 6, 16, 2, 4, 8
    z = jnp.asarray(rng.normal(0, 1, (B, F, D)).astype(np.float32))
    U = jnp.asarray(rng.normal(0, 0.1, (H, D, R)).astype(np.float32))
    V = jnp.asarray(rng.normal(0, 0.1, (H, R, P)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(0, 1, (B, H * P)).astype(np.float32))
    gp = jax.grad(lambda z, U, V: jnp.sum(fm_cross_pallas(z, U, V, 4, True) * g_out),
                  argnums=(0, 1, 2))(z, U, V)
    gr = jax.grad(lambda z, U, V: jnp.sum(fm_cross_multihead(z, U, V) * g_out),
                  argnums=(0, 1, 2))(z, U, V)
    for a, b, name in zip(gp, gr, ["dz", "dU", "dV"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), name
