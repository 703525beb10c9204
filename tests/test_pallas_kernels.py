"""Pallas kernels vs their jnp oracles, in interpret mode on CPU
(SURVEY.md §4e).  On-device numerics are spot-checked by bench tooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.fm_cross import fm_cross_multihead
from tossctr_tpu.ops.pallas_kernels import fm_cross_pallas


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
