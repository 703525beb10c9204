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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tossctr_tpu.ops._vmem import kernel_compiler_params

from .pallas_attention import (
    _cdiv, _fmix32, _hw_block, _hw_keep, _resolve_dropout_impl,
    _resolve_interpret, _round_up,
)
from .pallas_attention import _MIX_R, _MIX_Q, _MIX_S

_SQRT_2_OVER_PI = np.float32(np.sqrt(2.0 / np.pi))
_GELU_C = np.float32(0.044715)


def default_tail_block_n() -> int:
    """Row-block for the fused block-tail kernel (N = B*Kp rows at
    flagship shapes).  512 ran a 1024/2048-launch grid that was mostly
    launch overhead (layer bwd 5.1 ms/step in the round-3 trace); with
    the per-kernel VMEM raise (ops/_vmem.py) 1024 measured fastest of
    {512..8192} (exp/tail_block_probe.py).  Override:
    TOSSCTR_TAIL_BLOCK_N (read at trace time)."""
    return int(os.environ.get("TOSSCTR_TAIL_BLOCK_N", "1024"))


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


def _ffn_hw_chunk(block_n: int, N: int) -> int:
    """Re-seed granularity for the hw-PRNG hidden mask: the gcd of the
    forward (block_n) and backward (block_n // 2) row blocks, so both
    kernels regenerate the identical mask with the fewest reseeds (a
    512/256 blocking reseeds once per 256 rows instead of per 8)."""
    import math

    bn_f = _hw_block(min(block_n, _round_up(N, 8)))
    bn_b = _hw_block(min(max(8, block_n // 2), _round_up(N, 8)))
    return math.gcd(bn_f, bn_b)


def _hidden(x, w1, b1, seed, i, bn, dropout_p, dropout_impl="hash",
            hw_chunk=8):
    """(bn, D) block -> (h fp32, dropped gelu output fp32, keep or None)."""
    h = jax.lax.dot(
        x, w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    g = _gelu_tanh(h)
    if dropout_p > 0.0:
        if dropout_impl == "hw":
            keep = _hw_keep(g.shape, dropout_p, seed, jnp.int32(0), i * bn,
                            hw_chunk)
        else:
            keep = _ffn_keep(g.shape, dropout_p, seed, i * bn)
        return h, g * keep, keep
    return h, g, None


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, y_ref,
                    *, dropout_p: float, dropout_impl: str = "hash",
                    hw_chunk: int = 8):
    i = pl.program_id(0)
    x = x_ref[...]
    bn = x.shape[0]
    _, gd, _ = _hidden(x, w1_ref[...], b1_ref[...], seed_ref[0], i, bn,
                       dropout_p, dropout_impl, hw_chunk)
    y = jax.lax.dot(
        gd.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ffn_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, seed_ref, dy_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, dropout_p: float, N_total: int, dropout_impl: str = "hash",
    hw_chunk: int = 8,
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
    h, gd, keep = _hidden(x, w1, b1_ref[...], seed_ref[0], i, bn, dropout_p,
                          dropout_impl, hw_chunk)

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


def _fwd_call(x, w1, b1, w2, b2, seed, *, dropout_p, block_n, interpret,
              dropout_impl="hash", hw_chunk=8):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    if dropout_impl == "hw":
        bn = _hw_block(bn)
    Np = _round_up(N, bn)
    out = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, dropout_p=float(dropout_p),
                          dropout_impl=dropout_impl, hw_chunk=hw_chunk),
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
        compiler_params=kernel_compiler_params(),
    )(_pad_rows(x, Np), w1, b1.reshape(1, F), w2, b2.reshape(1, D), seed)
    return out[:N]


def _bwd_call(x, w1, b1, w2, seed, dy, *, dropout_p, block_n, interpret,
              dropout_impl="hash", hw_chunk=8):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    if dropout_impl == "hw":
        bn = _hw_block(bn)
    Np = _round_up(N, bn)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(
            _ffn_bwd_kernel, dropout_p=float(dropout_p), N_total=N,
            dropout_impl=dropout_impl, hw_chunk=hw_chunk,
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
        compiler_params=kernel_compiler_params(),
    )(_pad_rows(x, Np), w1, b1.reshape(1, F), w2, seed, _pad_rows(dy, Np))
    return dx[:N], dw1, db1.reshape(F), dw2, db2.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_ffn(x, w1, b1, w2, b2, seed, dropout_p: float = 0.0,
              block_n: int = 512, interpret: bool = False,
              dropout_impl: str = "hash"):
    """dropout(gelu_tanh(x @ w1 + b1), p) @ w2 + b2, fused in VMEM.

    x: (N, D); w1 (D, F); b1 (F,); w2 (F, D); b2 (D,); seed int32 (1,)
    for hidden dropout (ignored when dropout_p == 0).  Returns (N, D)
    in x.dtype; weight/bias grads in fp32.  ``dropout_impl``: "hash"
    (numpy-reproducible counter hash) or "hw" (hardware PRNG — see
    pallas_attention._hw_keep for the reproducibility contract)."""
    return _fwd_call(x, w1, b1, w2, b2, seed, dropout_p=dropout_p,
                     block_n=block_n, interpret=interpret,
                     dropout_impl=dropout_impl,
                     hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]))


def _fused_ffn_fwd(x, w1, b1, w2, b2, seed, dropout_p, block_n, interpret,
                   dropout_impl):
    y = _fwd_call(x, w1, b1, w2, b2, seed, dropout_p=dropout_p,
                  block_n=block_n, interpret=interpret,
                  dropout_impl=dropout_impl,
                  hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]))
    return y, (x, w1, b1, w2, seed)


def _fused_ffn_bwd(dropout_p, block_n, interpret, dropout_impl, res, dy):
    x, w1, b1, w2, seed = res
    dx, dw1, db1, dw2, db2 = _bwd_call(
        x, w1, b1, w2, seed, dy, dropout_p=dropout_p,
        block_n=max(8, block_n // 2), interpret=interpret,
        dropout_impl=dropout_impl,
        hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]),
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


# ------------------------------------------------------------------
# Fused encoder-block tail: out-proj + residual + RMSNorm + FFN +
# residual + RMSNorm in ONE kernel.
#
# The DARE layer between two attention cores is
#   y1 = rmsnorm(x + o @ Wout + bout) * wn1
#   y2 = rmsnorm(y1 + ffn(y1)) * wn2
# XLA runs this as ~8 separate fusions per layer (out-proj bias,
# residual adds, fp32 norm stats, norm apply, and their backwards),
# each a full HBM round-trip over (B*K, D) — ~4 ms/layer at B=8192.
# Here the whole tail reads x and o once and writes y2 once; backward
# recomputes everything per tile and accumulates the seven weight/bias
# grads across the sequential grid.  Replaces the stock residual+norm
# +FFN stack of the reference layer (src/models/dare.py:49-70).
# ------------------------------------------------------------------

_RMS_EPS = 1e-6


def _rms_fwd(r, wn):
    """bf16 residual r -> (y bf16, inv f32, y_hat f32); matches
    models/layers.RMSNorm: stats in fp32, output cast to r.dtype."""
    rf = r.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(rf * rf, axis=-1, keepdims=True) + _RMS_EPS)
    y_hat = rf * inv
    y = (wn.astype(jnp.float32) * y_hat).astype(r.dtype)
    return y, inv, y_hat


def _rms_bwd(dy, wn, inv, y_hat):
    """-> (dr f32, dwn-partial (1, D) f32)."""
    g = dy.astype(jnp.float32) * wn.astype(jnp.float32)
    dr = inv * (g - y_hat * jnp.mean(g * y_hat, axis=-1, keepdims=True))
    dwn = jnp.sum(dy.astype(jnp.float32) * y_hat, axis=0, keepdims=True)
    return dr, dwn


def _block_tail_fwd_core(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed,
                         row0, dropout_p, dropout_impl="hash", hw_chunk=8):
    """Shared forward: returns every intermediate backward needs."""
    a = (jax.lax.dot(
        o, wout, preferred_element_type=jnp.float32
    ) + bout.astype(jnp.float32)).astype(x.dtype)
    r1 = x + a
    y1, inv1, y_hat1 = _rms_fwd(r1, wn1)
    h = jax.lax.dot(
        y1, w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    g = _gelu_tanh(h)
    keep = None
    if dropout_p > 0.0:
        if dropout_impl == "hw":
            keep = _hw_keep(g.shape, dropout_p, seed, jnp.int32(0), row0,
                            hw_chunk)
        else:
            keep = _ffn_keep(g.shape, dropout_p, seed, row0)
        g = g * keep
    ff = (jax.lax.dot(
        g.astype(x.dtype), w2, preferred_element_type=jnp.float32
    ) + b2.astype(jnp.float32)).astype(x.dtype)
    r2 = y1 + ff
    y2, inv2, y_hat2 = _rms_fwd(r2, wn2)
    return a, y1, inv1, y_hat1, h, g, keep, inv2, y_hat2, y2


def _block_tail_fwd_kernel(
    x_ref, o_ref, wout_ref, bout_ref, wn1_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, wn2_ref, seed_ref, y_ref, *, dropout_p: float,
    dropout_impl: str = "hash", hw_chunk: int = 8,
):
    i = pl.program_id(0)
    x = x_ref[...]
    bn = x.shape[0]
    *_, y2 = _block_tail_fwd_core(
        x, o_ref[...], wout_ref[...], bout_ref[...], wn1_ref[...],
        w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...], wn2_ref[...],
        seed_ref[0], i * bn, dropout_p, dropout_impl, hw_chunk,
    )
    y_ref[...] = y2.astype(y_ref.dtype)


def _block_tail_bwd_kernel(
    x_ref, o_ref, wout_ref, bout_ref, wn1_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, wn2_ref, seed_ref, dy_ref,
    dx_ref, do_ref, dwout_ref, dbout_ref, dwn1_ref, dw1_ref, db1_ref,
    dw2_ref, db2_ref, dwn2_ref, *, dropout_p: float, N_total: int,
    dropout_impl: str = "hash", hw_chunk: int = 8,
):
    i = pl.program_id(0)
    x = x_ref[...]
    o = o_ref[...]
    dy = dy_ref[...]
    bn = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + i * bn
    valid = row < N_total
    x = jnp.where(valid, x, 0)
    o = jnp.where(valid, o, 0)
    dy = jnp.where(valid, dy, 0)

    wout = wout_ref[...]
    wn1 = wn1_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    wn2 = wn2_ref[...]
    a, y1, inv1, y_hat1, h, g, keep, inv2, y_hat2, _ = _block_tail_fwd_core(
        x, o, wout, bout_ref[...], wn1, w1, b1_ref[...], w2, b2_ref[...],
        wn2, seed_ref[0], i * bn, dropout_p, dropout_impl, hw_chunk,
    )
    # norm2 backward
    dr2, dwn2 = _rms_bwd(dy, wn2, inv2, y_hat2)
    dr2c = dr2.astype(x.dtype)
    # FFN backward (upstream dr2 both through ffn and the residual)
    dw2 = jax.lax.dot_general(
        g.astype(x.dtype), dr2c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dr2, axis=0, keepdims=True)
    dg = jax.lax.dot_general(
        dr2c, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if keep is not None:
        dg = dg * keep
    dh = dg * _gelu_tanh_grad(h)
    dhc = dh.astype(x.dtype)
    dw1 = jax.lax.dot_general(
        y1, dhc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dy1 = dr2 + jax.lax.dot_general(
        dhc, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # norm1 backward
    dr1, dwn1 = _rms_bwd(dy1.astype(x.dtype), wn1, inv1, y_hat1)
    dr1c = dr1.astype(x.dtype)
    # out-projection backward; dx is the pure residual path
    dwout = jax.lax.dot_general(
        o, dr1c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbout = jnp.sum(dr1, axis=0, keepdims=True)
    do = jax.lax.dot_general(
        dr1c, wout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dr1.astype(dx_ref.dtype)
    do_ref[...] = do.astype(do_ref.dtype)

    @pl.when(i == 0)
    def _():
        dwout_ref[...] = dwout
        dbout_ref[...] = dbout
        dwn1_ref[...] = dwn1
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dwn2_ref[...] = dwn2

    @pl.when(i != 0)
    def _():
        dwout_ref[...] += dwout
        dbout_ref[...] += dbout
        dwn1_ref[...] += dwn1
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dwn2_ref[...] += dwn2


def _tail_specs(bn, D, F):
    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    return dict(
        x=pl.BlockSpec((bn, D), row, memory_space=pltpu.VMEM),
        wdd=pl.BlockSpec((D, D), fixed, memory_space=pltpu.VMEM),
        wdf=pl.BlockSpec((D, F), fixed, memory_space=pltpu.VMEM),
        wfd=pl.BlockSpec((F, D), fixed, memory_space=pltpu.VMEM),
        vd=pl.BlockSpec((1, D), fixed, memory_space=pltpu.VMEM),
        vf=pl.BlockSpec((1, F), fixed, memory_space=pltpu.VMEM),
        smem=pl.BlockSpec(memory_space=pltpu.SMEM),
    )


def _tail_fwd_call(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed, *,
                   dropout_p, block_n, interpret, dropout_impl="hash",
                   hw_chunk=8):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    if dropout_impl == "hw":
        bn = _hw_block(bn)
    Np = _round_up(N, bn)
    sp = _tail_specs(bn, D, F)
    out = pl.pallas_call(
        functools.partial(_block_tail_fwd_kernel, dropout_p=float(dropout_p),
                          dropout_impl=dropout_impl, hw_chunk=hw_chunk),
        grid=(_cdiv(Np, bn),),
        in_specs=[
            sp["x"], sp["x"], sp["wdd"], sp["vd"], sp["vd"], sp["wdf"],
            sp["vf"], sp["wfd"], sp["vd"], sp["vd"], sp["smem"],
        ],
        out_specs=sp["x"],
        out_shape=jax.ShapeDtypeStruct((Np, D), x.dtype),
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(
        _pad_rows(x, Np), _pad_rows(o, Np), wout, bout.reshape(1, D),
        wn1.reshape(1, D), w1, b1.reshape(1, F), w2, b2.reshape(1, D),
        wn2.reshape(1, D), seed,
    )
    return out[:N]


def _tail_bwd_call(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed, dy, *,
                   dropout_p, block_n, interpret, dropout_impl="hash",
                   hw_chunk=8):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    N, D = x.shape
    F = w1.shape[1]
    bn = min(block_n, _round_up(N, 8))
    if dropout_impl == "hw":
        bn = _hw_block(bn)
    Np = _round_up(N, bn)
    sp = _tail_specs(bn, D, F)
    outs = pl.pallas_call(
        functools.partial(
            _block_tail_bwd_kernel, dropout_p=float(dropout_p), N_total=N,
            dropout_impl=dropout_impl, hw_chunk=hw_chunk,
        ),
        grid=(_cdiv(Np, bn),),
        in_specs=[
            sp["x"], sp["x"], sp["wdd"], sp["vd"], sp["vd"], sp["wdf"],
            sp["vf"], sp["wfd"], sp["vd"], sp["vd"], sp["smem"], sp["x"],
        ],
        out_specs=[
            sp["x"], sp["x"], sp["wdd"], sp["vd"], sp["vd"], sp["wdf"],
            sp["vf"], sp["wfd"], sp["vd"], sp["vd"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, D), x.dtype),
            jax.ShapeDtypeStruct((Np, D), x.dtype),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(
        _pad_rows(x, Np), _pad_rows(o, Np), wout, bout.reshape(1, D),
        wn1.reshape(1, D), w1, b1.reshape(1, F), w2, b2.reshape(1, D),
        wn2.reshape(1, D), seed, _pad_rows(dy, Np),
    )
    (dx, do, dwout, dbout, dwn1, dw1, db1, dw2, db2, dwn2) = outs
    return (
        dx[:N], do[:N], dwout, dbout.reshape(D), dwn1.reshape(D),
        dw1, db1.reshape(F), dw2, db2.reshape(D), dwn2.reshape(D),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def fused_block_tail(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed,
                     dropout_p: float = 0.0, block_n: int = 512,
                     interpret: bool = False, dropout_impl: str = "hash"):
    """rmsnorm(y1 + ffn(y1)) * wn2 where y1 = rmsnorm(x + o@wout+bout) * wn1.

    x, o: (N, D) bf16 (layer input and attention-core output); returns
    (N, D).  The (N, F) hidden, both residuals and both fp32 norm
    intermediates never touch HBM; all weight/bias grads accumulate in
    fp32 across the sequential grid.  ``seed``/``dropout_p`` drive the
    FFN hidden dropout (``dropout_impl``: "hash" = the fused_ffn
    counter hash, "hw" = hardware PRNG)."""
    return _tail_fwd_call(
        x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed,
        dropout_p=dropout_p, block_n=block_n, interpret=interpret,
        dropout_impl=dropout_impl,
        hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]),
    )


def _fused_block_tail_fwd(x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed,
                          dropout_p, block_n, interpret, dropout_impl):
    y = _tail_fwd_call(
        x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed,
        dropout_p=dropout_p, block_n=block_n, interpret=interpret,
        dropout_impl=dropout_impl,
        hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]),
    )
    return y, (x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed)


def _fused_block_tail_bwd(dropout_p, block_n, interpret, dropout_impl, res, dy):
    x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed = res
    dx, do, dwout, dbout, dwn1, dw1, db1, dw2, db2, dwn2 = _tail_bwd_call(
        x, o, wout, bout, wn1, w1, b1, w2, b2, wn2, seed, dy,
        dropout_p=dropout_p, block_n=max(8, block_n // 2),
        interpret=interpret, dropout_impl=dropout_impl,
        hw_chunk=_ffn_hw_chunk(block_n, x.shape[0]),
    )
    return (
        dx, do, dwout.astype(wout.dtype), dbout.astype(bout.dtype),
        dwn1.astype(wn1.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype), dwn2.astype(wn2.dtype),
        jnp.zeros_like(seed),
    )


fused_block_tail.defvjp(_fused_block_tail_fwd, _fused_block_tail_bwd)
