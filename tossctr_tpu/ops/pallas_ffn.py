"""Fused transformer FFN: dropout(gelu(x W1 + b1)) W2 + b2 in one kernel.

Why: at flagship shapes (B=8192, K=60, D=64, F=384) XLA materializes the
(B·K, F) hidden activation in HBM once forward and re-reads it backward
— the round-2 device trace bills the three DARE FFN layers ~42 ms/step
(fwd ~4.7, dgrad ~5.0, wgrad ~4.5 each; docs/DESIGN.md §2), nearly all
of it HBM traffic on 377 MB intermediates.  This kernel keeps the
hidden block in VMEM: forward writes only the (B·K, D) output, backward
*recomputes* the hidden block per tile (FLOPs are ~100x cheaper than
the HBM round-trip here) and accumulates dW1/db1/dW2/db2 across the
sequential grid.

Replaces the reference's stock ``nn.Linear/GELU/Dropout`` FFN
(src/models/dare.py:49-53,66-69) on the TPU path; the jnp oracle
(``ffn_reference``) and models/layers.py's unfused branch remain the
correctness baselines.

GELU is the tanh approximation — the same function flax's default
``nn.gelu(approximate=True)`` computes — evaluated in fp32.

Hidden-unit dropout (reference dare.py:52 ``nn.Dropout`` after GELU)
uses the same counter-based hash as ops/pallas_attention.py: the mask
is a pure function of (absolute token index, hidden index, seed), so
the backward recompute regenerates it bit-identically under a different
grid blocking, and tests can reproduce it in numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import _cdiv, _fmix32, _resolve_interpret, _round_up
from .pallas_attention import _MIX_R, _MIX_Q, _MIX_S

_SQRT_2_OVER_PI = np.float32(np.sqrt(2.0 / np.pi))
_GELU_C = np.float32(0.044715)


def _gelu_tanh(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    return 0.5 * h * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h * h)
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du


def _ffn_keep(shape, p: float, seed, row0):
    """Scaled keep-mask over a (bn, F) hidden block; pure function of
    (absolute row, hidden col, seed)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0.astype(jnp.uint32)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = _fmix32(r * _MIX_R + c * _MIX_Q + seed.astype(jnp.uint32) * _MIX_S)
    keep = (x >= np.uint32(int(p * (2**32)))).astype(jnp.float32)
    return keep / (1.0 - p)


def ffn_keep_reference(N: int, F: int, p: float, seed: int):
    """Numpy oracle of the in-kernel keep mask -> (N, F) scaled keep."""
    r = np.arange(N, dtype=np.uint32)[:, None]
    c = np.arange(F, dtype=np.uint32)[None, :]
    with np.errstate(over="ignore"):
        x = r * _MIX_R + c * _MIX_Q + np.uint32(np.int64(seed) & 0xFFFFFFFF) * _MIX_S
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x7FEB352D)
        x = x ^ (x >> np.uint32(15))
        x = x * np.uint32(0x846CA68B)
        x = x ^ (x >> np.uint32(16))
    keep = (x >= np.uint32(int(p * (2**32)))).astype(np.float32)
    return keep / (1.0 - p)


def _hidden(x, w1, b1, seed, i, bn, dropout_p):
    """(bn, D) block -> (h fp32, dropped gelu output fp32, keep or None)."""
    h = jax.lax.dot(
        x, w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    g = _gelu_tanh(h)
    if dropout_p > 0.0:
        keep = _ffn_keep(g.shape, dropout_p, seed, i * bn)
        return h, g * keep, keep
    return h, g, None


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, y_ref,
                    *, dropout_p: float):
    i = pl.program_id(0)
    x = x_ref[...]
    bn = x.shape[0]
    _, gd, _ = _hidden(x, w1_ref[...], b1_ref[...], seed_ref[0], i, bn,
                       dropout_p)
    y = jax.lax.dot(
        gd.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ffn_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, seed_ref, dy_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, dropout_p: float, N_total: int,
):
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    bn = x.shape[0]
    # zero padded tail rows: their buffer content is undefined and the
    # weight/bias grads sum over rows
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + i * bn
    valid = row < N_total
    x = jnp.where(valid, x, 0)
    dy = jnp.where(valid, dy, 0)

    w1 = w1_ref[...]
    w2 = w2_ref[...]
    h, gd, keep = _hidden(x, w1, b1_ref[...], seed_ref[0], i, bn, dropout_p)

    dyf = dy.astype(jnp.float32)
    # dW2 += gd^T dy ; db2 += sum(dy)
    dw2 = jax.lax.dot_general(
        gd.astype(x.dtype), dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dyf, axis=0, keepdims=True)
    # d(dropped gelu) = dy W2^T
    dgd = jax.lax.dot_general(
        dy, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if keep is not None:
        dgd = dgd * keep
    dh = dgd * _gelu_tanh_grad(h)
    dhc = dh.astype(x.dtype)
    dw1 = jax.lax.dot_general(
        x, dhc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dx = jax.lax.dot_general(
        dhc, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(i != 0)
    def _():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2


def _pad_rows(x, Np):
    return x if x.shape[0] == Np else jnp.pad(x, ((0, Np - x.shape[0]), (0, 0)))


def _fwd_call(x, w1, b1, w2, b2, seed, *, dropout_p, block_n, interpret):
    interpret = _resolve_interpret(interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    Np = _round_up(N, bn)
    out = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, dropout_p=float(dropout_p)),
        grid=(_cdiv(Np, bn),),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, D), x.dtype),
        interpret=interpret,
    )(_pad_rows(x, Np), w1, b1.reshape(1, F), w2, b2.reshape(1, D), seed)
    return out[:N]


def _bwd_call(x, w1, b1, w2, seed, dy, *, dropout_p, block_n, interpret):
    interpret = _resolve_interpret(interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    Np = _round_up(N, bn)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(
            _ffn_bwd_kernel, dropout_p=float(dropout_p), N_total=N
        ),
        grid=(_cdiv(Np, bn),),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, D), x.dtype),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(_pad_rows(x, Np), w1, b1.reshape(1, F), w2, seed, _pad_rows(dy, Np))
    return dx[:N], dw1, db1.reshape(F), dw2, db2.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_ffn(x, w1, b1, w2, b2, seed, dropout_p: float = 0.0,
              block_n: int = 512, interpret: bool = False):
    """dropout(gelu_tanh(x @ w1 + b1), p) @ w2 + b2, fused in VMEM.

    x: (N, D); w1 (D, F); b1 (F,); w2 (F, D); b2 (D,); seed int32 (1,)
    for hidden dropout (ignored when dropout_p == 0).  Returns (N, D)
    in x.dtype; weight/bias grads in fp32."""
    return _fwd_call(x, w1, b1, w2, b2, seed, dropout_p=dropout_p,
                     block_n=block_n, interpret=interpret)


def _fused_ffn_fwd(x, w1, b1, w2, b2, seed, dropout_p, block_n, interpret):
    y = _fwd_call(x, w1, b1, w2, b2, seed, dropout_p=dropout_p,
                  block_n=block_n, interpret=interpret)
    return y, (x, w1, b1, w2, seed)


def _fused_ffn_bwd(dropout_p, block_n, interpret, res, dy):
    x, w1, b1, w2, seed = res
    dx, dw1, db1, dw2, db2 = _bwd_call(
        x, w1, b1, w2, seed, dy, dropout_p=dropout_p,
        block_n=max(8, block_n // 2), interpret=interpret,
    )
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype), jnp.zeros_like(seed))


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2, keep=None):
    """jnp oracle: gelu_tanh in fp32, optional precomputed keep mask."""
    h = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    g = _gelu_tanh(h)
    if keep is not None:
        g = g * keep
    return (g @ w2.astype(jnp.float32) + b2).astype(x.dtype)
