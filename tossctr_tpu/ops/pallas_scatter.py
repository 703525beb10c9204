"""Pallas sweep-merge scatter: giant-table row updates at HBM speed.

The problem (measured, docs/DESIGN.md §2): XLA lowers
``table.at[ids].add(delta)`` on TPU to a per-row tile read-modify-write
— ~42.7 ms per (10M, 64) table for 245k touched rows at flagship
shapes, ~40x off memory speed-of-light, and it scales with the number
of update rows.  Sorted/unique hints, dedup-then-set and per-row DMA
kernels were all measured to not help (per-row HBM DMA is not
expressible: bf16 slices must be 16-sublane aligned).

This kernel replaces the scatter with a **single bandwidth-bound sweep**
over the table in aligned superblocks.  Update rows are sorted by row
id once (ids are shared by all tables being updated — DARE's att/rep
tables are touched at the same selected ids, reference dare.py:116-138
— so one sort serves all).  Each grid step then:

  1. receives its (SB, D) block of every table via the normal Pallas
     pipeline (double-buffered, aliased in-place),
  2. DMAs its contiguous segment of the sorted update rows from HBM in
     fixed 128-row chunks (dynamic start aligned down to 128, masked by
     absolute position; sorted ids also ride a 128-lane i32 view so the
     chunk is a single lane-aligned row),
  3. merges each chunk into the block with a one-hot MXU matmul
     ``acc += onehot @ chunk_deltas`` where ``onehot[r, j] =
     (ids[j] == block_base + r)`` — no dynamic VMEM indexing, duplicate
     ids accumulate natively (in fp32, better than XLA's bf16 scatter),
     arbitrarily hot rows just take extra chunk iterations,
  4. writes ``block + acc`` back (tables alias in-place).

Cost is ~2 * table_bytes of HBM traffic regardless of batch size or id
distribution, vs the XLA scatter's per-row cost — the sweep wins
whenever a nontrivial fraction of 16-row tiles is touched (245k random
ids touch ~32% of a 10M-row table's tiles).  All tables passed in one
call share the sweep: traffic for N tables is one read+write of each,
with a single sorted-segment stream feeding them all.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tossctr_tpu.ops._vmem import kernel_compiler_params

# fixed chunk of sorted update rows processed per inner iteration; also
# the alignment of dynamic DMA starts (128 covers every dtype's sublane
# tiling AND the 128-lane rows of the ids view)
_CHUNK = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _resolve_interpret(interpret: bool) -> bool:
    return bool(interpret) or jax.default_backend() != "tpu"


def _sweep_kernel(
    starts_ref,  # scalar prefetch: (Ms+1,) i32 segment starts per superblock
    *refs,
    n_tables: int,
    d: int,
    sb: int,
    w_pad: int,
):
    t_in = refs[:n_tables]
    packed_hbm = refs[n_tables]  # (npad, w_pad) table-dtype, sorted
    ids_hbm = refs[n_tables + 1]  # (npad // 128, 128) i32, sorted
    t_out = refs[n_tables + 2 : 2 * n_tables + 2]
    pbuf, ibuf, psem, isem = refs[2 * n_tables + 2 :]

    m = pl.program_id(0)
    start = starts_ref[m]
    end = starts_ref[m + 1]
    base = pl.multiple_of((start // _CHUNK) * _CHUNK, _CHUNK)
    nc = jnp.where(end > start, pl.cdiv(end - base, _CHUNK), 0)

    def start_dma(k, slot):
        off = pl.multiple_of(base + k * _CHUNK, _CHUNK)
        pltpu.make_async_copy(
            packed_hbm.at[pl.ds(off, _CHUNK), :], pbuf.at[slot], psem.at[slot]
        ).start()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(off // _CHUNK, 1), :], ibuf.at[slot], isem.at[slot]
        ).start()

    @pl.when(nc > 0)
    def _():
        start_dma(0, 0)

    def body(k, acc):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nc)
        def _():
            start_dma(k + 1, jax.lax.rem(k + 1, 2))

        off = pl.multiple_of(base + k * _CHUNK, _CHUNK)
        pltpu.make_async_copy(
            packed_hbm.at[pl.ds(off, _CHUNK), :], pbuf.at[slot], psem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(off // _CHUNK, 1), :], ibuf.at[slot], isem.at[slot]
        ).wait()

        ids_row = ibuf[slot]  # (1, 128) i32, lane j = sorted id at off + j
        # everything at full (sb, 128) shape — Mosaic rejects broadcasting
        # replicated singleton dims of i1 vectors, so compare i32s instead
        local_b = jnp.broadcast_to(ids_row - m * sb, (sb, _CHUNK))
        pos_b = jnp.broadcast_to(
            off + jax.lax.broadcasted_iota(jnp.int32, (1, _CHUNK), 1),
            (sb, _CHUNK),
        )
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (sb, _CHUNK), 0)
        hit = (row_iota == local_b) & (pos_b >= start) & (pos_b < end)
        oh = hit.astype(jnp.bfloat16)  # exact 0/1, MXU-native lhs
        upd = pbuf[slot]  # (128, w_pad)

        def oh_dot(rhs):
            return jax.lax.dot_general(
                oh,
                rhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (sb, w_pad)

        if upd.dtype == jnp.bfloat16:
            return acc + oh_dot(upd)
        # fp32 deltas: one bf16 MXU pass truncates to ~0.4% rel error
        # (measured) and Mosaic rejects fp32 contract precision with a
        # bf16 lhs — split into hi+lo bf16 passes (~bf16^2 rel error)
        hi = upd.astype(jnp.bfloat16)
        lo = (upd - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return acc + oh_dot(hi) + oh_dot(lo)

    acc = jax.lax.fori_loop(0, nc, body, jnp.zeros((sb, w_pad), jnp.float32))

    for t in range(n_tables):
        blk = t_in[t][...].astype(jnp.float32)
        t_out[t][...] = (blk + acc[:, t * d : (t + 1) * d]).astype(t_out[t].dtype)


def sweep_rows_add(
    tables: Sequence[jnp.ndarray],
    ids: jnp.ndarray,
    deltas: Sequence[jnp.ndarray],
    *,
    superblock: int = 2048,
    interpret: bool = False,
) -> List[jnp.ndarray]:
    """``tables[t][ids] += deltas[t]`` for every table at once, as one
    bandwidth-bound sweep.  ids (N,) int32 in any order, duplicates
    allowed (accumulated in fp32); out-of-range ids are dropped.
    deltas[t] (N, D) are cast to the table dtype before merging (parity
    with ``table.at[ids].add(delta.astype(table.dtype))``)."""
    assert len(tables) == len(deltas) >= 1
    V, D = tables[0].shape
    for t in tables:
        assert t.shape == (V, D), "all swept tables must share (V, D)"
    dtype = tables[0].dtype
    assert superblock % 8 == 0
    interpret = _resolve_interpret(interpret)

    n_tab = len(tables)
    W = n_tab * D
    w_pad = _round_up(W, 128)
    N = int(ids.shape[0])
    Ms = _cdiv(V, superblock)
    sentinel = jnp.int32(Ms * superblock)

    ids = ids.reshape(-1).astype(jnp.int32)
    # out-of-range ids (e.g. drop sentinels from upstream) -> sentinel
    ids = jnp.where((ids >= 0) & (ids < V), ids, sentinel)
    ids_s, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    packed = jnp.concatenate(
        [d.reshape(N, D).astype(dtype) for d in deltas], axis=1
    )
    if w_pad > W:
        packed = jnp.pad(packed, ((0, 0), (0, w_pad - W)))
    packed_s = jnp.take(packed, order, axis=0)

    npad = _round_up(N + 2 * _CHUNK, _CHUNK)
    ids_p = jnp.concatenate(
        [ids_s, jnp.full((npad - N,), sentinel, jnp.int32)]
    )
    packed_p = jnp.pad(packed_s, ((0, npad - N), (0, 0)))
    ids_rows = ids_p.reshape(npad // _CHUNK, _CHUNK)

    bounds = jnp.arange(Ms + 1, dtype=jnp.int32) * superblock
    starts = jnp.searchsorted(ids_p, bounds, side="left").astype(jnp.int32)

    kernel = functools.partial(
        _sweep_kernel, n_tables=n_tab, d=D, sb=superblock, w_pad=w_pad
    )
    tab_spec = pl.BlockSpec(
        (superblock, D), lambda m, s: (m, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ms,),
        in_specs=[tab_spec] * n_tab
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # packed updates (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # sorted ids, 128-lane rows
        ],
        out_specs=[tab_spec] * n_tab,
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK, w_pad), dtype),
            pltpu.VMEM((2, 1, _CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((V, D), dtype) for _ in range(n_tab)],
        # operand order: [starts, *tables, packed, ids_rows] -> alias each
        # table input onto its output for in-place RMW
        input_output_aliases={1 + t: t for t in range(n_tab)},
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(starts, *tables, packed_p, ids_rows)
    return list(out)


def rowwise_adagrad_sweep_update(
    tables: Sequence[jnp.ndarray],
    accums: Sequence[jnp.ndarray],
    ids: jnp.ndarray,
    row_grads: Sequence[jnp.ndarray],
    *,
    lr,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    pad_row: Optional[int] = None,
    superblock: int = 2048,
    interpret: bool = False,
    halves: int = 1,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Row-wise AdaGrad over several same-shape tables touched at the
    same ids (DARE's att/rep pair, or one lane-fused (V, H*D) table with
    ``halves=H``), with the row merge done by ``sweep_rows_add`` instead
    of XLA scatter.  Semantics match
    ``train.sparse_embed.rowwise_adagrad_update(exact_dedup=False)``
    per table: per-occurrence g², post-accumulation scale, lazy decay —
    only the duplicate-row summation runs in fp32 here (the XLA path
    sums in table dtype).
    """
    V, W = tables[0].shape
    Dh = W // halves
    ids = ids.reshape(-1)
    N = ids.shape[0]
    new_accums: List[jnp.ndarray] = []
    deltas: List[jnp.ndarray] = []
    for table, accum, g in zip(tables, accums, row_grads):
        g = g.astype(jnp.float32).reshape(N, W)
        if pad_row is not None:
            g = g * (ids != pad_row)[:, None]
        if halves == 1:
            g2 = jnp.mean(g * g, axis=1)
        else:
            g2 = jnp.mean((g * g).reshape(N, halves, Dh), axis=2)
        accum = accum.at[ids].add(g2)
        scale = lr / (jnp.sqrt(jnp.take(accum, ids, axis=0)) + eps)
        if halves > 1:
            scale = jnp.repeat(scale, Dh, axis=1)
        else:
            scale = scale[:, None]
        delta = -scale * g
        if weight_decay:
            rows = jnp.take(table, ids, axis=0).astype(jnp.float32)
            # pad_row never decays (torch padding_idx; matches
            # train/sparse_embed.rowwise_adagrad_update)
            if pad_row is not None:
                rows = rows * (ids != pad_row)[:, None]
            delta = delta - (lr * weight_decay) * rows
        new_accums.append(accum)
        deltas.append(delta)
    new_tables = sweep_rows_add(
        list(tables), ids, deltas, superblock=superblock, interpret=interpret
    )
    return new_tables, new_accums
