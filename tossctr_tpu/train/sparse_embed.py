"""Row-sparse optimizer updates for giant embedding tables.

Why this exists (measured on v5e, see bench notes): letting autodiff
produce a dense (10M, 64) scatter-add cotangent costs ~67 ms per table
per step plus a dense optimizer sweep over every row; the whole rest of
the train step is single-digit milliseconds.  The industry-standard fix
(DLRM-style) is to read gradients w.r.t. the *gathered rows* only
(models/dare.py perturb hooks) and update just the touched rows:

  1. sort the (B*K,) touched ids,
  2. segment-sum duplicate rows' gradients (a scatter-add over
     duplicates would race in the read-modify-write optimizer),
  3. gather the touched rows + their per-row accumulator state,
  4. apply a row-wise AdaGrad step (per-row second-moment scalar,
     O(vocab) state instead of AdamW's O(vocab*dim) moments),
  5. scatter-set the updated rows; padding segments route to index
     ``vocab`` and are dropped (mode='drop').

Semantic deviations from the reference's dense AdamW over nn.Embedding,
made deliberately and documented: untouched rows see no weight decay or
moment decay that step (lazy updates), and the optimizer family for
tables is row-wise AdaGrad (+ optional lazy decay on touched rows), the
standard choice for sparse CTR embeddings.  Set
``train.embedding_optimizer: adamw`` for the literal (slow) reference
behaviour.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RowwiseAdagradState(NamedTuple):
    # (V,) fp32 per-row grad-square accumulator; (V, H) when the table
    # fuses H logical tables lane-wise (model.fused_seq_tables: the
    # att/rep pair stored as one (V, 2D) array so the row tile is
    # exactly 128 lanes — see ops/pallas_scatter.py header and
    # docs/DESIGN.md; each half keeps its own accumulator so fused
    # updates equal the split-table updates bit-for-bit)
    accum: jnp.ndarray


def init_rowwise_adagrad(
    table: jnp.ndarray, init_accum: float = 0.0, halves: int = 1
) -> RowwiseAdagradState:
    shape = (table.shape[0],) if halves == 1 else (table.shape[0], halves)
    return RowwiseAdagradState(accum=jnp.full(shape, init_accum, jnp.float32))


def _cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D int32 cumsum via a two-level (row, lane)
    decomposition: XLA's 1-D cumsum at N~500k lowers to a slow scan on
    TPU; cumsum along the 512-lane minor axis plus a tiny row-offset
    cumsum is a pure VPU pipeline."""
    n = x.shape[0]
    C = 512
    if n % C:
        # pad to a C multiple with zeros (cumsum of zeros is exact) so
        # non-flagship shapes keep the fast two-level form instead of
        # silently reverting to the scalar scan
        pad = C - n % C
        return _cumsum_i32(jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]))[:n]
    x2 = x.reshape(n // C, C)
    w = jnp.cumsum(x2, axis=1)
    tot = w[:, -1]
    offs = jnp.cumsum(tot) - tot  # exclusive row offsets (n/C elements)
    return (w + offs[:, None]).reshape(n)


def dedup_rows(
    ids: jnp.ndarray, grads: jnp.ndarray, drop_index: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort + segment-sum duplicates.  -> (uids (N,), g (N,D) fp32)
    where padding segments carry ``drop_index`` (to be dropped by
    scatter).

    TPU notes (exp/update_trace_probe.py): ONE variadic sort carries
    the permutation payload (argsort + separate gather costs ~2x); the
    (N, D) grad permute runs in the input dtype (bf16 cotangents =
    half the traffic of permuting after the fp32 cast); the segment
    sum gets ``indices_are_sorted=True`` — segment ids are ascending by
    construction, and the hint removes the scatter's sorting RMW
    penalty on TPU (sorted+unique scatter measured 3x cheaper than
    unsorted)."""
    # Invariant: every real id must satisfy id < drop_index <
    # iinfo(ids.dtype).max — iinfo.max is the in-sort padding sentinel
    # below, so an id equal to it would be indistinguishable from
    # padding.  Callers pass drop_index = vocab, far below INT32_MAX.
    assert drop_index < jnp.iinfo(ids.dtype).max, (
        "drop_index must leave the iinfo.max sentinel free")
    n = ids.shape[0]
    ids_s, order = jax.lax.sort(
        (ids, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    g_s = jnp.take(grads, order, axis=0)
    first = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    seg = _cumsum_i32(first.astype(jnp.int32)) - 1  # ascending segment ids
    g_uniq = jax.ops.segment_sum(
        g_s.astype(jnp.float32), seg, num_segments=n, indices_are_sorted=True
    )
    # representative id per segment: segment j's representative is the
    # j-th smallest unique id (ids_s ascends), so ONE cheap 1-D sort of
    # (first ? id : INT_MAX) compacts them to the front in order — a
    # segment_max scatter here measured 4.6 ms/step at B=8192 on v5e,
    # the sort is sub-ms.
    uid = jax.lax.sort(
        jnp.where(first, ids_s, jnp.iinfo(ids_s.dtype).max)
    )
    n_unique = jnp.sum(first)
    valid = jnp.arange(n) < n_unique
    # padding slots get DISTINCT ascending out-of-range ids
    # (drop_index + k) so the downstream scatter's unique_indices /
    # indices_are_sorted promises hold literally — a repeated sentinel
    # would violate the uniqueness contract (undefined per JAX docs)
    # even though those entries are dropped.
    uids = jnp.where(valid, uid, drop_index + jnp.arange(n)).astype(jnp.int32)
    return uids, g_uniq


def rowwise_adagrad_update(
    table: jnp.ndarray,
    state: RowwiseAdagradState,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    *,
    lr,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    pad_row: Optional[int] = None,
    exact_dedup: bool = False,
    halves: int = 1,
    rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, RowwiseAdagradState]:
    """ids (N,) int, row_grads (N,D) — per-occurrence gradients of the
    gathered rows (duplicates allowed).  ``pad_row`` (e.g. the sequence
    pad id) never receives updates, mirroring torch's padding_idx.

    ``rows`` (N,D or matching row_grads' leading shape) — the rows of
    ``table`` at ``ids`` as already gathered by the model's forward
    pass, reused here for the lazy weight-decay term so the update
    needs no second 491k-row gather (measured 5.2 ms/step at B=8192).
    Forward rows are pad-masked, which keeps ``pad_row`` decay-free —
    exactly the torch padding_idx semantics.  Only consulted by the
    no-sort path when ``weight_decay > 0``.

    ``halves > 1``: the table lane-fuses that many logical tables
    (model.fused_seq_tables — att/rep as one (V, 2D) array).  Each
    D//halves lane slice keeps its OWN second-moment column in the
    (V, halves) accumulator, so the fused update equals running the
    split tables independently — with a single row scatter.

    Two duplicate-handling modes:
      * exact_dedup=True  — sort + segment-sum duplicates, then one
        read-modify-write per unique row (textbook AdaGrad).
      * exact_dedup=False (default) — pure scatter-adds: the accumulator
        gets each occurrence's g^2, then every occurrence's gradient is
        scaled by the row's *post-accumulation* statistic and
        scatter-added.  No sort (TPU sorts of 245k keys cost tens of ms);
        for duplicate rows this scales each occurrence by the shared
        denominator instead of scaling their sum — a standard streaming
        approximation, equal to exact when a row appears once in the
        batch.  Weight decay applies per occurrence (lazy).
    """
    V, W = table.shape
    assert W % halves == 0
    Dh = W // halves
    # pad-mask in the cotangent dtype (0/1 multiply is exact in bf16);
    # the fp32 cast happens after dedup's row permute so the (N, W)
    # reorder moves half the bytes
    g_raw = row_grads.reshape(-1, W)
    ids = ids.reshape(-1)
    if pad_row is not None:
        g_raw = g_raw * (ids != pad_row)[:, None].astype(g_raw.dtype)
    g = g_raw.astype(jnp.float32)

    def row_g2(gr):
        """(N, W) -> per-half second moment: (N,) or (N, halves).

        The per-half means run as ``halves`` lane-masked full-width
        reduces instead of a (N, halves, Dh) reshape+reduce: the (V,
        halves) accumulator lives in a {0,1} (transposed-tile) layout,
        and XLA satisfied the reshape form by transposing the FULL
        (N, W) g^2 tensor (268 MB of layout copies per step at B=8192,
        trace: mul.2060 + copy.605) rather than the (N, halves)
        result."""
        g2 = gr * gr
        if halves == 1:
            return jnp.mean(g2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) // Dh
        cols = [
            jnp.sum(jnp.where(lane == h, g2, 0.0), axis=1) / Dh
            for h in range(halves)
        ]
        return jnp.stack(cols, axis=1)  # (N, halves)

    def widen(scale):
        """Per-half scale -> per-lane: (N,) -> (N,1) / (N,H) -> (N,W)."""
        if halves == 1:
            return scale[:, None]
        return jnp.repeat(scale, Dh, axis=1)

    if exact_dedup:
        # dedup_rows emits ids sorted ascending with the drop sentinel at
        # the tail: both scatter fast-path hints hold
        uids, gu = dedup_rows(ids, g_raw, drop_index=V)
        acc_rows = jnp.take(state.accum, uids, axis=0, mode="fill", fill_value=0.0)
        acc_new = acc_rows + row_g2(gu)
        scale = lr / (jnp.sqrt(acc_new) + eps)
        urows = jnp.take(table, uids, axis=0, mode="fill", fill_value=0.0).astype(jnp.float32)
        # pad_row never decays (torch padding_idx; matches the no-sort
        # path's masked-forward-rows semantics)
        wd_mask = (uids != pad_row)[:, None] if pad_row is not None else 1.0
        new_rows = urows * (1.0 - lr * weight_decay * wd_mask) - widen(scale) * gu
        table = table.at[uids].set(
            new_rows.astype(table.dtype), mode="drop",
            unique_indices=True, indices_are_sorted=True,
        )
        accum = state.accum.at[uids].set(
            acc_new, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return table, RowwiseAdagradState(accum=accum)

    # ---- no-sort scatter path ----
    accum = state.accum.at[ids].add(row_g2(g))
    scale = lr / (jnp.sqrt(jnp.take(accum, ids, axis=0)) + eps)
    delta = -widen(scale) * g
    if weight_decay:
        if rows is None:
            rows_f = jnp.take(table, ids, axis=0).astype(jnp.float32)
            # match the forward gather's pad masking: padding_idx rows
            # never decay
            if pad_row is not None:
                rows_f = rows_f * (ids != pad_row)[:, None]
        else:
            rows_f = rows.astype(jnp.float32).reshape(-1, W)
        delta = delta - (lr * weight_decay) * rows_f
    table = table.at[ids].add(delta.astype(table.dtype))
    return table, RowwiseAdagradState(accum=accum)


def sparse_sgd_update(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    *,
    lr,
    weight_decay: float = 0.0,
    pad_row: Optional[int] = None,
    rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain sparse SGD; duplicates handled natively by scatter-add.
    ``rows``: forward-gathered (pad-masked) table rows at ``ids``,
    reused for weight decay (see rowwise_adagrad_update)."""
    V, D = table.shape
    g = row_grads.astype(jnp.float32).reshape(-1, D)
    ids = ids.reshape(-1)
    if pad_row is not None:
        g = g * (ids != pad_row)[:, None]
    if weight_decay:
        if rows is None:
            rows_f = jnp.take(table, ids, axis=0).astype(jnp.float32)
            if pad_row is not None:
                rows_f = rows_f * (ids != pad_row)[:, None]
        else:
            rows_f = rows.astype(jnp.float32).reshape(-1, D)
        g = g + weight_decay * rows_f
    return table.at[ids].add((-lr * g).astype(table.dtype))
