"""Pallas TPU kernels for the two hot ops (SURVEY.md §3 hot loops #1/#3).

Each kernel has a pure-jnp oracle in this package (ops/topk_select.py,
ops/fm_cross.py) and is tested against it in interpret mode on CPU and
compiled on TPU (tests/test_pallas_kernels.py).

(A ``dare_score`` kernel for the DARE selection scoring pass lived
here through round 2 and was removed: it still had to gather the full
(B, L, D) att rows in HBM first — XLA's fused gather+dot compiles to
the same traffic, and the device trace showed no win.  The scoring
pass is latency-bound on the row gather itself (~12 ns/row,
docs/DESIGN.md §2); the streaming alternative is
ops.topk_select.select_chunk.)

``fm_cross``: QNN-alpha multi-head low-rank FM cross with custom VJP.
The jnp path materializes A = einsum(z, U) of shape (B, H, F, R) in HBM
(~160 MB at bench shapes) for forward AND keeps it for backward; the
kernel keeps A in VMEM scratch per (batch-block, head), writing only the
(B, H*P) output.  Backward recomputes A blockwise and accumulates
dU/dV across the sequential TPU grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tossctr_tpu.ops._vmem import kernel_compiler_params


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resolve_interpret(interpret: bool) -> bool:
    # compiled Mosaic kernels need a TPU; fall back to the interpreter on
    # CPU/GPU so the ops work (slowly) on any backend
    return bool(interpret) or jax.default_backend() != "tpu" 


# ============================================================
# fm_cross
# ============================================================


def _fm_fwd_kernel(z_ref, u_ref, v_ref, out_ref, *, heads: int):
    z = z_ref[...]  # (Bb, F, D)
    Bb, F, D = z.shape

    def head(h, _):
        U = u_ref[h]  # (D, R)
        V = v_ref[h]  # (R, P)
        A = jax.lax.dot_general(
            z.reshape(Bb * F, D), U,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(Bb, F, U.shape[1])
        s = jnp.sum(A, axis=1)  # (Bb, R)
        quad = s * s - jnp.sum(A * A, axis=1)
        out = jax.lax.dot_general(
            quad.astype(V.dtype), V,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bb, P)
        out_ref[h] = out  # head-major output: dynamic index on batch dim
        return 0

    jax.lax.fori_loop(0, heads, head, 0)


def _fm_bwd_kernel(z_ref, u_ref, v_ref, g_ref, dz_ref, du_ref, dv_ref, *,
                   heads: int, B_total: int):
    i = pl.program_id(0)
    z = z_ref[...]  # (Bb, F, D)
    Bb, F, D = z.shape
    # sanitize out-of-range batch rows of the last block (undefined buffer
    # content would poison the dU/dV batch sums); masks are built at the
    # full operand shapes — Mosaic mishandles broadcasting replicated
    # singleton dims of i1 vectors
    P_ = v_ref.shape[2]
    zmask = (jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) + i * Bb) < B_total
    gmask = (jax.lax.broadcasted_iota(jnp.int32, (Bb, P_), 0) + i * Bb) < B_total
    z = jnp.where(zmask, z, 0.0)

    # zero the cross-grid accumulators once; subsequent grid steps and
    # heads accumulate into the refs directly
    @pl.when(i == 0)
    def _():
        du_ref[...] = jnp.zeros(du_ref.shape, du_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    def head(h, dz_acc):
        U = u_ref[h]  # (D, R)
        V = v_ref[h]  # (R, P)
        g = jnp.where(gmask, g_ref[h], 0.0)  # (Bb, P), head-major input
        A = jax.lax.dot_general(
            z.reshape(Bb * F, D), U,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(Bb, F, U.shape[1])
        s = jnp.sum(A, axis=1)  # (Bb, R)
        quad = s * s - jnp.sum(A * A, axis=1)
        # dV: (R, P) partial = quad^T @ g
        dv_ref[h] += jax.lax.dot_general(
            quad, g.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dquad: (Bb, R) = g @ V^T
        dquad = jax.lax.dot_general(
            g.astype(jnp.float32), V.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dA = 2*dquad*(s - A)
        dA = 2.0 * dquad[:, None, :] * (s[:, None, :] - A)  # (Bb, F, R)
        # dz += dA @ U^T
        dz_acc = dz_acc + jax.lax.dot_general(
            dA.reshape(Bb * F, U.shape[1]), U.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(Bb, F, D)
        # dU: (D, R) partial = sum_b z^T dA
        du_ref[h] += jax.lax.dot_general(
            z.reshape(Bb * F, D).astype(jnp.float32), dA.reshape(Bb * F, U.shape[1]),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dz_acc

    dz_acc = jax.lax.fori_loop(0, heads, head, jnp.zeros((Bb, F, D), jnp.float32))
    dz_ref[...] = dz_acc.astype(dz_ref.dtype)


def _fm_fwd_call(z, U, V, *, block_b: int, interpret: bool):
    interpret = _resolve_interpret(interpret)
    B, F, D = z.shape
    H, _, R = U.shape
    P = V.shape[2]
    bb = min(block_b, B)
    grid = (_cdiv(B, bb),)
    out = pl.pallas_call(
        functools.partial(_fm_fwd_kernel, heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, F, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D, R), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, R, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, bb, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B, P), jnp.float32),
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(z, U, V)
    return out.transpose(1, 0, 2).reshape(B, H * P).astype(z.dtype)


def _fm_bwd_call(z, U, V, g, *, block_b: int, interpret: bool):
    interpret = _resolve_interpret(interpret)
    # backward carries an fp32 (Bb,F,D) dz accumulator plus recomputed
    # A/dA blocks; quarter the block to stay inside scoped VMEM
    block_b = max(8, block_b // 4)
    B, F, D = z.shape
    H, _, R = U.shape
    P = V.shape[2]
    bb = min(block_b, B)
    grid = (_cdiv(B, bb),)
    dz, dU, dV = pl.pallas_call(
        functools.partial(_fm_bwd_kernel, heads=H, B_total=B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, F, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D, R), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, R, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bb, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, F, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D, R), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, R, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, F, D), z.dtype),
            jax.ShapeDtypeStruct((H, D, R), jnp.float32),
            jax.ShapeDtypeStruct((H, R, P), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(z, U, V, g.reshape(B, H, P).transpose(1, 0, 2))
    return dz, dU.astype(U.dtype), dV.astype(V.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fm_cross_pallas(z, U, V, block_b: int = 64, interpret: bool = False):
    """Fused multi-head FM cross: z (B,F,D), U (H,D,R), V (H,R,P)
    -> (B, H*P); numerically equal to ops.fm_cross.fm_cross_multihead."""
    return _fm_fwd_call(z, U, V, block_b=block_b, interpret=interpret)


def _fm_fwd_rule(z, U, V, block_b, interpret):
    return _fm_fwd_call(z, U, V, block_b=block_b, interpret=interpret), (z, U, V)


def _fm_bwd_rule(block_b, interpret, res, g):
    z, U, V = res
    dz, dU, dV = _fm_bwd_call(z, U, V, g, block_b=block_b, interpret=interpret)
    return dz, dU, dV


fm_cross_pallas.defvjp(_fm_fwd_rule, _fm_bwd_rule)
