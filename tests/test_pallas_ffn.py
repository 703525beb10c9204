"""Fused FFN kernel vs the jnp oracle (interpret mode).

Hidden dropout uses the counter-based hash of absolute (row, col, seed)
coordinates, so the mask is reproducible in numpy (``ffn_keep_reference``)
and both the dropout forward and its gradients are testable exactly on
CPU.  Also checks the DAREEncoderLayer param tree is identical between
the fused and unfused paths (checkpoint portability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.pallas_ffn import (
    ffn_keep_reference,
    ffn_reference,
    fused_ffn,
)


def _data(N=24, D=16, F=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.3, (D, F)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (F,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (F, D)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("N", [24, 17])  # 17: padded tail rows
def test_fused_ffn_forward_matches_reference(N):
    x, w1, b1, w2, b2 = _data(N=N)
    seed = jnp.zeros((1,), jnp.int32)
    got = np.asarray(fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 8, True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2))
    assert np.allclose(got, want, atol=2e-5), np.abs(got - want).max()


def test_fused_ffn_grads_match_reference():
    x, w1, b1, w2, b2 = _data()
    seed = jnp.zeros((1,), jnp.int32)

    def f_fused(x, w1, b1, w2, b2):
        return (fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 8, True) ** 2).sum()

    def f_ref(x, w1, b1, w2, b2):
        return (ffn_reference(x, w1, b1, w2, b2) ** 2).sum()

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, nm in zip(g_fused, g_ref, ["dx", "dw1", "db1", "dw2", "db2"]):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 5e-4, (nm, err)


def test_fused_ffn_grads_padded_tail():
    # N=17 with block 8 -> 7 padded rows whose garbage must not leak
    # into the weight/bias grads
    x, w1, b1, w2, b2 = _data(N=17)
    seed = jnp.zeros((1,), jnp.int32)

    def f_fused(w1, b1, w2, b2):
        return (fused_ffn(x, w1, b1, w2, b2, seed, 0.0, 8, True) ** 2).sum()

    def f_ref(w1, b1, w2, b2):
        return (ffn_reference(x, w1, b1, w2, b2) ** 2).sum()

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    for a, b in zip(g_fused, g_ref):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_fused_ffn_dropout_matches_masked_reference():
    x, w1, b1, w2, b2 = _data()
    p, seed_val = 0.3, 1234
    seed = jnp.full((1,), seed_val, jnp.int32)
    keep = jnp.asarray(ffn_keep_reference(x.shape[0], w1.shape[1], p, seed_val))
    got = np.asarray(fused_ffn(x, w1, b1, w2, b2, seed, p, 8, True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2, keep=keep))
    assert np.allclose(got, want, atol=2e-5), np.abs(got - want).max()


def test_fused_ffn_dropout_grads_match_masked_reference():
    x, w1, b1, w2, b2 = _data()
    p, seed_val = 0.25, 77
    seed = jnp.full((1,), seed_val, jnp.int32)
    keep = jnp.asarray(ffn_keep_reference(x.shape[0], w1.shape[1], p, seed_val))

    def f_fused(x, w1, b1, w2, b2):
        return (fused_ffn(x, w1, b1, w2, b2, seed, p, 8, True) ** 2).sum()

    def f_ref(x, w1, b1, w2, b2):
        return (ffn_reference(x, w1, b1, w2, b2, keep=keep) ** 2).sum()

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, nm in zip(g_fused, g_ref, ["dx", "dw1", "db1", "dw2", "db2"]):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 5e-4, (nm, err)


def test_encoder_layer_param_tree_identical_and_close():
    from tossctr_tpu.models.layers import DAREEncoderLayer

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (4, 12, 16)).astype(np.float32)
    )
    kw = dict(d_model=16, n_heads=2, mha_dropout=0.0, ffn_hidden=32,
              ffn_dropout=0.0, max_len=12)
    m0 = DAREEncoderLayer(**kw, use_pallas_ffn=False)
    m1 = DAREEncoderLayer(**kw, use_pallas_ffn=True)
    v0 = m0.init(jax.random.PRNGKey(0), x, deterministic=True)
    v1 = m1.init(jax.random.PRNGKey(0), x, deterministic=True)
    t0 = jax.tree_util.tree_structure(v0)
    t1 = jax.tree_util.tree_structure(v1)
    assert t0 == t1
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.allclose(np.asarray(a), np.asarray(b))  # same init draws
    y0 = m0.apply(v0, x, deterministic=True)
    y1 = m1.apply(v0, x, deterministic=True)
    assert np.allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)


# ------------- fused block tail (out-proj + norms + FFN) -------------

def _tail_data(N=40, D=16, F=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32))
    o = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32))
    wout = jnp.asarray(rng.normal(0, 0.3, (D, D)).astype(np.float32))
    bout = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    wn1 = jnp.asarray(rng.normal(1, 0.1, (D,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.3, (D, F)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (F,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (F, D)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    wn2 = jnp.asarray(rng.normal(1, 0.1, (D,)).astype(np.float32))
    return x, o, wout, bout, wn1, w1, b1, w2, b2, wn2


def _tail_reference(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, keep=None):
    def rms(r, w):
        rf = r.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(rf * rf, axis=-1, keepdims=True) + 1e-6)
        return (w * rf * inv).astype(r.dtype)

    a = x + (o @ wout + bout).astype(x.dtype)
    y1 = rms(a, wn1)
    y2 = y1 + ffn_reference(y1, w1, b1, w2, b2, keep=keep)
    return rms(y2, wn2)


def test_fused_block_tail_forward_matches_reference():
    from tossctr_tpu.ops.pallas_ffn import fused_block_tail

    args = _tail_data(N=37)  # non-multiple of block
    seed = jnp.zeros((1,), jnp.int32)
    got = np.asarray(fused_block_tail(*args, seed, 0.0, 16, True))
    want = np.asarray(_tail_reference(*args))
    assert np.allclose(got, want, atol=5e-4), np.abs(got - want).max()


def test_fused_block_tail_gradients_match_reference():
    from tossctr_tpu.ops.pallas_ffn import fused_block_tail

    args = _tail_data(N=24)
    seed = jnp.zeros((1,), jnp.int32)
    g_out = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (24, 16)).astype(np.float32)
    )

    def f_fused(*a):
        return jnp.sum(fused_block_tail(*a, seed, 0.0, 8, True) * g_out)

    def f_ref(*a):
        return jnp.sum(_tail_reference(*a) * g_out)

    idx = tuple(range(10))
    gf = jax.grad(f_fused, argnums=idx)(*args)
    gr = jax.grad(f_ref, argnums=idx)(*args)
    names = ["dx", "do", "dwout", "dbout", "dwn1", "dw1", "db1", "dw2",
             "db2", "dwn2"]
    for a, b, nm in zip(gf, gr, names):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 1e-3, (nm, err)


def test_fused_block_tail_dropout_matches_masked_reference():
    from tossctr_tpu.ops.pallas_ffn import ffn_keep_reference, fused_block_tail

    args = _tail_data(N=32, F=32)
    seed = jnp.asarray([99], jnp.int32)
    keep = jnp.asarray(ffn_keep_reference(32, 32, 0.3, 99))
    got = np.asarray(fused_block_tail(*args, seed, 0.3, 8, True))
    want = np.asarray(_tail_reference(*args, keep=keep))
    assert np.allclose(got, want, atol=5e-4), np.abs(got - want).max()

    g_out = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (32, 16)).astype(np.float32)
    )

    def f_fused(x, o, w1):
        a = list(args)
        a[0], a[1], a[5] = x, o, w1
        return jnp.sum(fused_block_tail(*a, seed, 0.3, 8, True) * g_out)

    def f_ref(x, o, w1):
        a = list(args)
        a[0], a[1], a[5] = x, o, w1
        return jnp.sum(_tail_reference(*a, keep=keep) * g_out)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(args[0], args[1], args[5])
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(args[0], args[1], args[5])
    for a, b in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_encoder_layer_fused_block_tree_and_outputs():
    """All three layer modes (unfused / pallas-ffn-only / fully fused
    attention+block-tail) share one param tree and agree numerically."""
    from tossctr_tpu.models.layers import DAREEncoderLayer

    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (4, 12, 16)).astype(np.float32)
    )
    kw = dict(d_model=16, n_heads=2, mha_dropout=0.0, ffn_hidden=32,
              ffn_dropout=0.0, max_len=12)
    modes = [
        DAREEncoderLayer(**kw),
        DAREEncoderLayer(**kw, use_pallas_ffn=True),
        DAREEncoderLayer(**kw, use_pallas_attn=True, use_pallas_ffn=True),
    ]
    vs = [m.init(jax.random.PRNGKey(0), x, deterministic=True) for m in modes]
    t0 = jax.tree_util.tree_structure(vs[0])
    for v in vs[1:]:
        assert jax.tree_util.tree_structure(v) == t0
    y0 = modes[0].apply(vs[0], x, deterministic=True)
    for m in modes[1:]:
        y = m.apply(vs[0], x, deterministic=True)
        assert np.allclose(np.asarray(y), np.asarray(y0), atol=5e-4), (
            np.abs(np.asarray(y) - np.asarray(y0)).max()
        )


def test_fuse_block_optout_same_tree_and_outputs():
    """fuse_block=False with both pallas kernels on: separate attention
    + FFN kernels with the SAME RMSNorm math and param tree as the
    fused block tail."""
    from tossctr_tpu.models.layers import DAREEncoderLayer

    x = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, (4, 12, 16)).astype(np.float32)
    )
    kw = dict(d_model=16, n_heads=2, mha_dropout=0.0, ffn_hidden=32,
              ffn_dropout=0.0, max_len=12, use_pallas_attn=True,
              use_pallas_ffn=True)
    m_fused = DAREEncoderLayer(**kw)
    m_sep = DAREEncoderLayer(**kw, fuse_block=False)
    v = m_fused.init(jax.random.PRNGKey(0), x, deterministic=True)
    v2 = m_sep.init(jax.random.PRNGKey(0), x, deterministic=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    y_f = m_fused.apply(v, x, deterministic=True)
    y_s = m_sep.apply(v, x, deterministic=True)
    assert np.allclose(np.asarray(y_f), np.asarray(y_s), atol=5e-4)
