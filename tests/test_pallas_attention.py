"""Fused MHA kernel vs the jnp oracle (interpret mode).

Dropout uses a counter-based hash of absolute coordinates, so the mask
is reproducible in numpy (``dropout_keep_reference``) and the dropout
path — forward AND gradients — is testable exactly on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.pallas_attention import (
    dropout_keep_reference,
    fused_mha,
    mha_reference,
)


def mha_reference_dropout(q, k, v, bias, n_heads: int, p: float, seed: int):
    """jnp oracle applying the kernel's exact keep-mask to the attention
    probabilities (torch nn.MultiheadAttention dropout semantics)."""
    B, K, D = q.shape
    dh = D // n_heads

    def heads(t):
        return t.reshape(B, K, n_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
    logits = logits + bias[None, None]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    keep = jnp.asarray(
        dropout_keep_reference(B, K, K, n_heads, p, seed).transpose(1, 0, 2, 3)
    )  # (B, H, K, K)
    w = (w * keep).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, K, D)


def _data(B=8, K=12, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, (K, K)).astype(np.float32))
    seed_arr = jnp.zeros((1,), jnp.int32)
    return q, k, v, bias, seed_arr


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
@pytest.mark.parametrize("H", [2, 4])
@pytest.mark.parametrize("K", [12, 8])
def test_fused_mha_forward_matches_reference(H, K, impl):
    q, k, v, bias, seed = _data(K=K)
    got = np.asarray(fused_mha(q, k, v, bias, seed, H, 0.0, 4, True, impl))
    want = np.asarray(mha_reference(q, k, v, bias, H))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
def test_fused_mha_k_not_multiple_of_8(impl):
    q, k, v, bias, seed = _data(B=6, K=13, D=16)
    got = np.asarray(fused_mha(q, k, v, bias, seed, 2, 0.0, 4, True, impl))
    want = np.asarray(mha_reference(q, k, v, bias, 2))
    assert np.allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
def test_fused_mha_gradients_match_reference(impl):
    q, k, v, bias, seed = _data(B=6, K=10, D=16)
    g_out = jnp.asarray(np.random.default_rng(1).normal(0, 1, (6, 10, 16)).astype(np.float32))

    def loss_pallas(q, k, v, bias):
        return jnp.sum(fused_mha(q, k, v, bias, seed, 2, 0.0, 4, True, impl) * g_out)

    def loss_ref(q, k, v, bias):
        return jnp.sum(mha_reference(q, k, v, bias, 2) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gp, gr, ["dq", "dk", "dv", "dbias"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_fused_mha_partial_batch_block():
    q, k, v, bias, seed = _data(B=10, K=12, D=16)
    got = np.asarray(fused_mha(q, k, v, bias, seed, 4, 0.0, 4, True))
    want = np.asarray(mha_reference(q, k, v, bias, 4))
    assert np.allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
def test_fused_mha_dropout_forward_matches_masked_reference(impl):
    q, k, v, bias, _ = _data(B=10, K=12, D=16)
    seed = jnp.asarray([1234], jnp.int32)
    got = np.asarray(fused_mha(q, k, v, bias, seed, 2, 0.3, 4, True, impl))
    want = np.asarray(mha_reference_dropout(q, k, v, bias, 2, 0.3, 1234))
    assert np.allclose(got, want, atol=5e-4), np.abs(got - want).max()
    # mask actually drops something and rescales
    nodrop = np.asarray(mha_reference(q, k, v, bias, 2))
    assert not np.allclose(got, nodrop, atol=1e-3)


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
def test_fused_mha_dropout_gradients_match_masked_reference(impl):
    """The ADVICE-high regression test: backward runs with a DIFFERENT
    batch block than forward, and must still regenerate the identical
    dropout mask — gradients must equal autodiff through the
    mask-applied jnp reference."""
    q, k, v, bias, _ = _data(B=10, K=12, D=16)
    seed = jnp.asarray([77], jnp.int32)
    g_out = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (10, 12, 16)).astype(np.float32)
    )

    def loss_pallas(q, k, v, bias):
        return jnp.sum(fused_mha(q, k, v, bias, seed, 2, 0.25, 8, True, impl) * g_out)

    def loss_ref(q, k, v, bias):
        return jnp.sum(mha_reference_dropout(q, k, v, bias, 2, 0.25, 77) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gp, gr, ["dq", "dk", "dv", "dbias"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_fused_mha_dropout_block_size_invariance():
    """Output and grads must not depend on the batch-block choice."""
    q, k, v, bias, _ = _data(B=8, K=10, D=16)
    seed = jnp.asarray([5], jnp.int32)

    outs, grads = [], []
    for bb in (2, 8):
        def loss(q, k, v):
            return jnp.sum(fused_mha(q, k, v, bias, seed, 2, 0.4, bb, True) ** 2)

        outs.append(np.asarray(fused_mha(q, k, v, bias, seed, 2, 0.4, bb, True)))
        grads.append(jax.grad(loss, argnums=(0, 1, 2))(q, k, v))
    assert np.allclose(outs[0], outs[1], atol=1e-5)
    for a, b in zip(grads[0], grads[1]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_layer_param_tree_identical_and_outputs_match():
    """MultiHeadSelfAttention with use_pallas on/off: same param tree,
    same output (checkpoint portability across backends)."""
    import flax.linen as nn

    from tossctr_tpu.models.layers import DAREEncoderLayer

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (6, 10, 16)).astype(np.float32))
    l_ref = DAREEncoderLayer(16, 2, 0.0, 32, 0.0, "rms", True, 10, use_pallas_attn=False)
    l_pal = DAREEncoderLayer(16, 2, 0.0, 32, 0.0, "rms", True, 10, use_pallas_attn=True)
    p_ref = l_ref.init(jax.random.PRNGKey(0), x)
    p_pal = l_pal.init(jax.random.PRNGKey(0), x)
    s_ref = jax.tree_util.tree_structure(p_ref)
    s_pal = jax.tree_util.tree_structure(p_pal)
    assert s_ref == s_pal
    # kernel auto-interprets on CPU and must reproduce the XLA path
    y_pal = l_pal.apply(p_ref, x, deterministic=True)
    y_ref = l_ref.apply(p_ref, x, deterministic=True)
    assert np.allclose(np.asarray(y_pal), np.asarray(y_ref), atol=5e-4)


def test_packed_and_loop_impls_agree():
    """The packed (head-in-M) and loop (per-head) kernels compute the
    same function — including bit-identical dropout masks (same
    absolute-coordinate hash)."""
    q, k, v, bias, _ = _data(B=10, K=12, D=16)
    seed = jnp.asarray([42], jnp.int32)
    for p in (0.0, 0.35):
        a = np.asarray(fused_mha(q, k, v, bias, seed, 4, p, 4, True, "loop"))
        b = np.asarray(fused_mha(q, k, v, bias, seed, 4, p, 8, True, "packed"))
        assert np.allclose(a, b, atol=2e-5), (p, np.abs(a - b).max())


# ---------------- qkv-fused kernel (fused_mha_qkv) ----------------

def _qkv_data(B=10, K=12, D=16, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (D, 3 * D)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (3 * D,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, (K, K)).astype(np.float32))
    return x, w, b, bias


def _ref_qkv_then_mha(x, w, b, bias, H, p=0.0, seed=0):
    qkv = x @ w + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if p > 0.0:
        return mha_reference_dropout(q, k, v, bias, H, p, seed)
    return mha_reference(q, k, v, bias, H)


@pytest.mark.parametrize("K", [12, 13])
@pytest.mark.parametrize("H", [2, 4])
def test_fused_mha_qkv_forward(H, K):
    from tossctr_tpu.ops.pallas_attention import fused_mha_qkv

    x, w, b, bias = _qkv_data(K=K)
    seed = jnp.zeros((1,), jnp.int32)
    got = np.asarray(fused_mha_qkv(x, w, b, bias, seed, H, 0.0, 4, True))
    want = np.asarray(_ref_qkv_then_mha(x, w, b, bias, H))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_fused_mha_qkv_gradients_match_reference():
    """dX, dWqkv, dbqkv and dbias against autodiff through the jnp
    oracle — the dW/db cross-grid accumulation and the in-kernel
    projection backward must agree with Dense-then-attention."""
    from tossctr_tpu.ops.pallas_attention import fused_mha_qkv

    x, w, b, bias = _qkv_data(B=9, K=10)
    seed = jnp.zeros((1,), jnp.int32)
    g_out = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (9, 10, 16)).astype(np.float32)
    )

    def loss_pallas(x, w, b, bias):
        return jnp.sum(fused_mha_qkv(x, w, b, bias, seed, 2, 0.0, 4, True) * g_out)

    def loss_ref(x, w, b, bias):
        return jnp.sum(_ref_qkv_then_mha(x, w, b, bias, 2) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, b, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, bias)
    for a, c in zip(gp, gr):
        assert np.allclose(np.asarray(a), np.asarray(c), atol=3e-4), (
            np.abs(np.asarray(a) - np.asarray(c)).max()
        )


def test_fused_mha_qkv_dropout_forward_and_grads():
    """p>0: forward equals the masked oracle (same absolute-coordinate
    hash as the unfused kernel) and gradients match autodiff through
    it, with backward running at a different block size than forward."""
    from tossctr_tpu.ops.pallas_attention import fused_mha_qkv

    x, w, b, bias = _qkv_data(B=12, K=12)
    seed = jnp.asarray([77], jnp.int32)
    got = np.asarray(fused_mha_qkv(x, w, b, bias, seed, 2, 0.25, 8, True))
    want = np.asarray(_ref_qkv_then_mha(x, w, b, bias, 2, p=0.25, seed=77))
    assert np.allclose(got, want, atol=5e-4), np.abs(got - want).max()

    g_out = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (12, 12, 16)).astype(np.float32)
    )

    def loss_pallas(x, w, b, bias):
        return jnp.sum(fused_mha_qkv(x, w, b, bias, seed, 2, 0.25, 8, True) * g_out)

    def loss_ref(x, w, b, bias):
        return jnp.sum(_ref_qkv_then_mha(x, w, b, bias, 2, p=0.25, seed=77) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, b, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, bias)
    for a, c in zip(gp, gr):
        assert np.allclose(np.asarray(a), np.asarray(c), atol=6e-4), (
            np.abs(np.asarray(a) - np.asarray(c)).max()
        )


def test_fused_mha_qkv_partial_batch_block():
    """B not a multiple of the block: batch-pad rows project to the
    qkv BIAS (not zero) and must still contribute nothing."""
    from tossctr_tpu.ops.pallas_attention import fused_mha_qkv

    x, w, b, bias = _qkv_data(B=7, K=12)
    seed = jnp.zeros((1,), jnp.int32)
    got = np.asarray(fused_mha_qkv(x, w, b, bias, seed, 2, 0.0, 4, True))
    want = np.asarray(_ref_qkv_then_mha(x, w, b, bias, 2))
    assert np.allclose(got, want, atol=2e-4)
    g_out = jnp.ones((7, 12, 16), jnp.float32)

    def loss(x, w, b, bias):
        return jnp.sum(fused_mha_qkv(x, w, b, bias, seed, 2, 0.0, 4, True) * g_out)

    def loss_ref(x, w, b, bias):
        return jnp.sum(_ref_qkv_then_mha(x, w, b, bias, 2) * g_out)

    gp = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, b, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, bias)
    for a, c in zip(gp, gr):
        assert np.allclose(np.asarray(a), np.asarray(c), atol=3e-4)


def test_layer_fuse_qkv_param_tree_and_outputs():
    """fuse_qkv=True vs False: identical param tree (checkpoint
    portability) and matching outputs."""
    from tossctr_tpu.models.layers import DAREEncoderLayer

    x = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (6, 10, 16)).astype(np.float32)
    )
    l_fused = DAREEncoderLayer(16, 2, 0.0, 32, 0.0, "rms", True, 10,
                               use_pallas_attn=True)
    l_ref = DAREEncoderLayer(16, 2, 0.0, 32, 0.0, "rms", True, 10,
                             use_pallas_attn=False)
    p_ref = l_ref.init(jax.random.PRNGKey(0), x)
    p_fused = l_fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_fused))
    y_f = l_fused.apply(p_ref, x, deterministic=True)
    y_r = l_ref.apply(p_ref, x, deterministic=True)
    assert np.allclose(np.asarray(y_f), np.asarray(y_r), atol=5e-4)


# ---- dropout_impl="hw" plumbing (CPU: interpret mode falls back to the
# hash, so outputs must be bit-identical to dropout_impl="hash"; the
# compiled hw path is validated on device by
# exp/hw_dropout_device_check.py) ----


@pytest.mark.parametrize("impl", ["loop", "packed", "wide"])
def test_hw_dropout_falls_back_to_hash_in_interpret(impl):
    q, k, v, bias, _ = _data(B=10, K=12, D=16)
    seed = jnp.asarray([9], jnp.int32)
    a = np.asarray(fused_mha(q, k, v, bias, seed, 2, 0.3, 8, True, impl, "hash"))
    b = np.asarray(fused_mha(q, k, v, bias, seed, 2, 0.3, 8, True, impl, "hw"))
    assert np.array_equal(a, b)


def test_hw_dropout_grads_on_cpu_fallback():
    q, k, v, bias, _ = _data(B=8, K=12, D=16)
    seed = jnp.asarray([3], jnp.int32)

    def loss(qq, di):
        return jnp.sum(
            fused_mha(qq, k, v, bias, seed, 2, 0.25, 8, True, "packed", di) ** 2
        )

    ga = jax.grad(lambda qq: loss(qq, "hash"))(q)
    gb = jax.grad(lambda qq: loss(qq, "hw"))(q)
    assert np.array_equal(np.asarray(ga), np.asarray(gb))


def test_dropout_impl_rejects_unknown():
    from tossctr_tpu.ops.pallas_attention import _resolve_dropout_impl

    assert _resolve_dropout_impl("hw", True) == "hash"
    assert _resolve_dropout_impl("hw", False) == "hw"
    assert _resolve_dropout_impl("hash", False) == "hash"
    with pytest.raises(ValueError):
        _resolve_dropout_impl("bogus", False)


def test_hw_chunk_gcd_of_fwd_bwd_blocks():
    from tossctr_tpu.ops.pallas_ffn import _ffn_hw_chunk

    assert _ffn_hw_chunk(512, 8192 * 64) == 256
    # tiny N: fwd and bwd share the same (rounded) block
    assert _ffn_hw_chunk(512, 100) == 104
    # mid N: gcd falls back to a small common divisor
    assert _ffn_hw_chunk(512, 300) % 8 == 0
