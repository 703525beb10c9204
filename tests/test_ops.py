import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.fm_cross import fm_cross_blocked, fm_cross_multihead
from tossctr_tpu.ops.topk_select import dare_topk_select, recency_log_decay


def _numpy_reference_topk(att_table, rep_table, seq_ids, query, top_k, tau, pad_id):
    """Literal transcription of the reference semantics (dare.py:116-138)."""
    B, L = seq_ids.shape
    D = att_table.shape[1]
    att = att_table[seq_ids].copy()
    rep = rep_table[seq_ids].copy()
    att[seq_ids == pad_id] = 0.0  # padding_idx row pinned to zero
    rep[seq_ids == pad_id] = 0.0
    pos = np.arange(L)
    decay = np.exp(-(L - 1 - pos) / max(1.0, float(tau)))
    scores = (att * query[:, None, :]).sum(-1) + np.log(decay + 1e-8)[None, :]
    scores[seq_ids == pad_id] = -1e9
    K = min(top_k, L)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :K]
    vals = np.take_along_axis(scores, idx, axis=1)
    sel = np.take_along_axis(rep, idx[..., None], axis=1)
    return sel, vals


@pytest.fixture
def topk_data():
    rng = np.random.default_rng(0)
    V, D, B, L = 500, 16, 8, 40
    att = rng.normal(0, 1, (V, D)).astype(np.float32)
    rep = rng.normal(0, 1, (V, D)).astype(np.float32)
    att[0] = 0.0  # pad row (padding_idx)
    rep[0] = 0.0
    seq = rng.integers(1, V, (B, L)).astype(np.int32)
    seq[:, :10] = 0  # left padding
    seq[3, :] = 0  # fully padded row
    q = rng.normal(0, 1, (B, D)).astype(np.float32)
    return att, rep, seq, q


@pytest.mark.parametrize("sparse", [False, True])
def test_topk_matches_numpy_reference(topk_data, sparse):
    att, rep, seq, q = topk_data
    K, tau = 12, 8.0
    want_sel, want_vals = _numpy_reference_topk(att, rep, seq, q, K, tau, 0)
    sel, vals, _ = dare_topk_select(
        jnp.asarray(att), jnp.asarray(rep), jnp.asarray(seq), jnp.asarray(q),
        top_k=K, tau=tau, pad_id=0, sparse_backward=sparse,
    )
    # scores (and thus gather order among ties) match
    assert np.allclose(np.asarray(vals), want_vals, atol=1e-4)
    # weighted sums are order-insensitive; compare softmax-gated aggregate
    def agg(s, v):
        w = np.exp(v - v.max(1, keepdims=True))
        w /= w.sum(1, keepdims=True)
        return (s * w[..., None]).sum(1)

    assert np.allclose(agg(np.asarray(sel), np.asarray(vals)), agg(want_sel, want_vals), atol=1e-3)


def test_topk_k_larger_than_L(topk_data):
    att, rep, seq, q = topk_data
    sel, vals, _ = dare_topk_select(
        jnp.asarray(att), jnp.asarray(rep), jnp.asarray(seq), jnp.asarray(q),
        top_k=100, tau=8.0, pad_id=0,
    )
    assert sel.shape == (8, 40, 16)  # K = min(top_k, L)


def test_topk_sparse_dense_gradients_agree(topk_data):
    """The sparse-backward path must produce the same gradients as the
    dense path — non-selected scores don't affect the output."""
    att, rep, seq, q = topk_data

    def loss(att_t, rep_t, q_t, sparse):
        sel, vals, _ = dare_topk_select(
            att_t, rep_t, jnp.asarray(seq), q_t,
            top_k=12, tau=8.0, pad_id=0, sparse_backward=sparse,
        )
        w = jax.nn.softmax(vals, axis=1)
        u = (sel * w[..., None]).sum(1)
        return (u**2).sum()

    gd = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(
        jnp.asarray(att), jnp.asarray(rep), jnp.asarray(q)
    )
    gs = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(
        jnp.asarray(att), jnp.asarray(rep), jnp.asarray(q)
    )
    for a, b in zip(gd, gs):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_topk_pad_row_gets_no_gradient(topk_data):
    att, rep, seq, q = topk_data

    def loss(att_t, rep_t):
        sel, vals, _ = dare_topk_select(
            att_t, rep_t, jnp.asarray(seq), jnp.asarray(q), top_k=12, tau=8.0, pad_id=0
        )
        return (sel.sum() + vals.sum())

    ga, gr = jax.grad(loss, argnums=(0, 1))(jnp.asarray(att), jnp.asarray(rep))
    assert np.allclose(np.asarray(ga)[0], 0.0)
    assert np.allclose(np.asarray(gr)[0], 0.0)


def test_recency_log_decay_values():
    ld = np.asarray(recency_log_decay(5, 2.0))
    want = np.log(np.exp(-(4 - np.arange(5)) / 2.0) + 1e-8)
    assert np.allclose(ld, want, atol=1e-6)


def test_fm_cross_matches_bruteforce_pairs():
    rng = np.random.default_rng(1)
    B, F, D, H, R, P = 4, 7, 8, 3, 5, 6
    z = rng.normal(0, 1, (B, F, D)).astype(np.float32)
    U = rng.normal(0, 0.1, (H, D, R)).astype(np.float32)
    V = rng.normal(0, 0.1, (H, R, P)).astype(np.float32)
    got = np.asarray(fm_cross_multihead(jnp.asarray(z), jnp.asarray(U), jnp.asarray(V)))
    # brute force: quad_h = 2 * sum_{i<j} a_i*a_j with a = z @ U_h
    want = np.zeros((B, H * P), np.float32)
    for h in range(H):
        A = z @ U[h]  # (B,F,R)
        quad = np.zeros((B, R), np.float32)
        for i in range(F):
            for j in range(i + 1, F):
                quad += 2 * A[:, i] * A[:, j]
        want[:, h * P : (h + 1) * P] = quad @ V[h]
    assert np.allclose(got, want, atol=1e-3)


def test_fm_cross_blocked_sums_blocks():
    rng = np.random.default_rng(2)
    B, F, D, H, R, P = 3, 6, 4, 2, 3, 5
    z = jnp.asarray(rng.normal(0, 1, (B, F, D)).astype(np.float32))
    U = jnp.asarray(rng.normal(0, 0.1, (H, D, R)).astype(np.float32))
    V = jnp.asarray(rng.normal(0, 0.1, (H, R, P)).astype(np.float32))
    blocks = {"a": (0, 3), "b": (3, 4), "c": (4, 6)}  # "b" single-feature, skipped
    got = np.asarray(fm_cross_blocked(z, U, V, blocks))
    want = np.asarray(fm_cross_multihead(z[:, 0:3], U, V)) + np.asarray(
        fm_cross_multihead(z[:, 4:6], U, V)
    )
    assert np.allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("chunk", [7, 8, 16, 40, 64])
def test_streaming_select_matches_dense(topk_data, chunk):
    """L-chunked streaming selection (select_chunk) must reproduce the
    dense pass exactly — indices, order, and tie-breaks (pad rows at
    -1e9 resolve to the earliest position in both)."""
    from tossctr_tpu.ops.topk_select import dare_select_ids

    att, rep, seq, q = topk_data
    for K in (5, 12, 40):
        dense = dare_select_ids(
            jnp.asarray(att), jnp.asarray(seq), jnp.asarray(q),
            top_k=K, tau=32.0, pad_id=0,
        )
        stream = dare_select_ids(
            jnp.asarray(att), jnp.asarray(seq), jnp.asarray(q),
            top_k=K, tau=32.0, pad_id=0, select_chunk=chunk,
        )
        np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(stream[0]))
        np.testing.assert_array_equal(np.asarray(dense[1]), np.asarray(stream[1]))


def test_streaming_select_pad_heavy_rows():
    """Rows with fewer than K real tokens: streaming must pick the same
    pad positions (earliest-first) as dense."""
    from tossctr_tpu.ops.topk_select import dare_select_ids

    rng = np.random.default_rng(3)
    V, D, B, L = 100, 8, 6, 30
    att = rng.normal(0, 1, (V, D)).astype(np.float32)
    seq = np.zeros((B, L), np.int32)
    seq[0, -2:] = rng.integers(1, V, 2)     # 2 real tokens
    seq[1, :] = 0                            # all pad
    seq[2, ::3] = rng.integers(1, V, seq[2, ::3].shape[0])
    q = rng.normal(0, 1, (B, D)).astype(np.float32)
    for chunk in (4, 9, 30):
        dense = dare_select_ids(
            jnp.asarray(att), jnp.asarray(seq), jnp.asarray(q),
            top_k=10, tau=8.0, pad_id=0,
        )
        stream = dare_select_ids(
            jnp.asarray(att), jnp.asarray(seq), jnp.asarray(q),
            top_k=10, tau=8.0, pad_id=0, select_chunk=chunk,
        )
        np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(stream[0]))
