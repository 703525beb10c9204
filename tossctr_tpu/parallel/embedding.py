"""Row-sharded embedding lookup over the ``model`` mesh axis.

The classic sparse-embedding exchange (SURVEY.md §2.5): each shard owns
a contiguous row range of the table; for a lookup, every shard gathers
the rows it owns (out-of-range ids masked to zero) and a ``psum`` over
the ``model`` axis assembles the full embeddings.  Autodiff through
shard_map gives the correct backward for free: the psum's cotangent
broadcasts to every shard, the mask zeroes foreign rows, and the gather
transpose scatter-adds into the *local* table shard — i.e., gradients
never materialize the full table on one device.

This mask-gather-psum form moves B*L*D activation bytes over ICI per
shard, independent of the number of shards, and needs no duplicate-id
handling.

``sharded_embedding_lookup_a2a`` is the classic DLRM-style id-exchange:
the batch is partitioned over BOTH mesh axes, each device buckets its
ids by owning shard, `all_to_all` routes id buckets to their owners,
owners gather locally, and a reverse `all_to_all` returns the rows.
Autodiff gives the reverse exchange + local scatter-add backward for
free.  Buckets are padded to the static worst case (every id owned by
one shard), so the psum form usually moves fewer bytes at small model-
axis sizes; the a2a form is the scalable shape for large meshes (real
deployments cap bucket sizes statistically).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _local_lookup(local_table, ids, axis_name: str):
    """Gather locally-owned rows, zero elsewhere; psum to assemble."""
    rows = local_table.shape[0]
    shard = jax.lax.axis_index(axis_name)
    lo = shard * rows
    li = ids - lo
    ok = (li >= 0) & (li < rows)
    e = jnp.take(local_table, jnp.clip(li, 0, rows - 1), axis=0)
    e = jnp.where(ok[..., None], e, jnp.zeros((), e.dtype))
    return jax.lax.psum(e, axis_name)


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    shard_batch: bool = True,
) -> jnp.ndarray:
    """table (V, D) sharded P('model', None); ids (..., ) int — batch dim
    optionally sharded over 'data'.  Returns embeddings (..., D) with the
    ids' batch sharding, replicated over 'model'."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jnp.take(table, ids, axis=0)

    ids_spec = (
        P(DATA_AXIS, *([None] * (ids.ndim - 1))) if shard_batch else P(*([None] * ids.ndim))
    )
    out_spec = P(*(ids_spec + (None,)))

    fn = jax.shard_map(
        partial(_local_lookup, axis_name=MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), ids_spec),
        out_specs=out_spec,
    )
    return fn(table, ids)


def _a2a_lookup(local_table, ids, *, axis_name: str, n_shards: int):
    """Per-device body of the id-exchange lookup.

    ids: (b, L) local queries.  Bucket by owner shard (padded to the
    static worst case cap = b*L), all_to_all ids to owners, gather
    owned rows, all_to_all the rows back, unbucket.
    """
    b, L = ids.shape
    rows = local_table.shape[0]
    n = b * L
    flat = ids.reshape(n)
    owner = jnp.clip(flat // rows, 0, n_shards - 1)

    # stable bucket order: sort by owner; slot within the (m, n) send
    # buffer is the rank of the id inside its bucket
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    # position of each sorted element within its owner run
    idx = jnp.arange(n)
    run_start = jnp.searchsorted(sorted_owner, jnp.arange(n_shards), side="left")
    pos_in_bucket = idx - run_start[sorted_owner]
    send_ids = jnp.zeros((n_shards, n), flat.dtype)
    send_ids = send_ids.at[sorted_owner, pos_in_bucket].set(flat[order])
    valid = jnp.zeros((n_shards, n), bool)
    valid = valid.at[sorted_owner, pos_in_bucket].set(True)

    # route buckets to their owners: after a2a, row r holds the ids that
    # rank r's peers want served (tiled over the leading axis)
    recv_ids = jax.lax.all_to_all(send_ids, axis_name, 0, 0, tiled=True)
    recv_ids = recv_ids.reshape(n_shards, n)

    # serve: gather my local rows for every requested id
    li = jnp.clip(recv_ids - jax.lax.axis_index(axis_name) * rows, 0, rows - 1)
    served = jnp.take(local_table, li, axis=0)  # (m, n, D)

    # route the rows back to the requesters
    back = jax.lax.all_to_all(
        served.reshape(n_shards * n, -1), axis_name, 0, 0, tiled=True
    ).reshape(n_shards, n, -1)

    # unbucket: entry (owner[j], pos[j]) is the row for sorted query j
    rows_sorted = back[sorted_owner, pos_in_bucket]
    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    out = rows_sorted[inv].reshape(b, L, -1)
    return out


def sharded_rowwise_adagrad_update(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    mesh: Mesh,
    *,
    lr,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    pad_row: int = 0,
    exact_dedup: bool = False,
    halves: int = 1,
):
    """Row-sparse AdaGrad on a row-sharded table, composed with the
    sharded lookup (VERDICT r1 #4).  ``halves`` mirrors
    train/sparse_embed.rowwise_adagrad_update: a lane-fused (V, H*D)
    table carries an (V, H) accumulator, sharded with its rows.

    table (V, D) P('model', None); accum (V,) P('model'); ids (B, K) and
    row_grads (B, K, D) sharded over 'data'.  Each device all-gathers
    the (ids, grads) over the DATA axis — every data-replica of a model
    shard must apply the identical full update or the replication
    invariant breaks — masks to the rows it owns, and runs the plain
    local update (train/sparse_embed.rowwise_adagrad_update) on its
    shard.  Per-occurrence processing order equals the unsharded path
    (tiled all_gather preserves batch order), so results match the
    single-device update to float exactness.

    -> (new_table P('model', None), new_accum P('model'))
    """
    from ..train.sparse_embed import RowwiseAdagradState, rowwise_adagrad_update

    m = mesh.shape[MODEL_AXIS]
    if m == 1:
        new_t, st = rowwise_adagrad_update(
            table, RowwiseAdagradState(accum), ids.reshape(-1), row_grads,
            lr=lr, eps=eps, weight_decay=weight_decay, pad_row=pad_row,
            exact_dedup=exact_dedup, halves=halves,
        )
        return new_t, st.accum

    D = table.shape[1]

    def body(local_table, local_accum, ids_l, g_l, lr_l):
        rows = local_table.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        ids_all = jax.lax.all_gather(ids_l, DATA_AXIS, axis=0, tiled=True).reshape(-1)
        g_all = jax.lax.all_gather(g_l, DATA_AXIS, axis=0, tiled=True).reshape(-1, D)
        li = ids_all - shard * rows
        own = (li >= 0) & (li < rows)
        li = jnp.where(own, li, rows)  # out-of-range -> dropped by scatter
        g_all = g_all * own[:, None]
        # pad_row in local coordinates: matches only on the owning shard,
        # reproducing the unsharded update's pad semantics exactly
        new_t, st = rowwise_adagrad_update(
            local_table, RowwiseAdagradState(local_accum), li, g_all,
            lr=lr_l[0], eps=eps, weight_decay=weight_decay,
            pad_row=pad_row - shard * rows,
            exact_dedup=exact_dedup, halves=halves,
        )
        return new_t, st.accum

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS) if halves == 1 else P(MODEL_AXIS, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None, None),
            P(),
        ),
        out_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS) if halves == 1 else P(MODEL_AXIS, None),
        ),
        # outputs ARE replicated over 'data' — every data-replica applies
        # the identical all_gathered update — but the static varying-axis
        # checker cannot prove it through the gather+scatter body
        check_vma=False,
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    return fn(table, accum, ids, row_grads, lr_arr)


def sharded_rowwise_adagrad_update_a2a(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    mesh: Mesh,
    *,
    lr,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    pad_row: int = 0,
    halves: int = 1,
    cap_factor: float = 2.0,
    debug_overflow: bool = False,
    drop_counter: str | None = None,
):
    """Bucketed gradient return (VERDICT r3 #6): row grads travel only
    to their owning shards instead of all-gathering O(global B*K*D)
    bytes to every device (``sharded_rowwise_adagrad_update``).

    Per device, with n = B*K/(d*m) local items and W = row width:
      1. local exact dedup (sort + segment-sum, train/sparse_embed) —
         partial fp32 sums per unique id; zipf duplicates collapse here,
         and unique HASHED ids spread ~uniformly over owner shards,
      2. run-length bucket by owner (dedup output is ascending, so
         owner is non-decreasing — no second sort), bucket cap =
         ceil(cap_factor * n / m),
      3. ``all_to_all`` over 'model': buckets reach their owners
         (~cap_factor * n * 4W bytes sent),
      4. ``all_gather`` over 'data' of the ALREADY-FILTERED buckets
         (~cap_factor * B*K*4W / m bytes — the 1/m win vs the plain
         all-gather's B*K*cotangent_bytes*W),
      5. the owner merges partial sums (exact dedup again) and applies
         the rowwise-AdaGrad step — g^2 is computed on the MERGED sum,
         so results match the exact_dedup all-gather path up to fp32
         summation order.

    Static-shape caveat (documented deviation): a bucket holds at most
    ``cap`` unique ids; overflow is dropped.  After dedup the owner of
    a unique id is a hash-uniform draw, so P(overflow) at cap_factor=2
    is negligible for n/m >= ~64 (binomial tail); adversarial id sets
    can still overflow — raise ``mesh.extra.a2a_grad_cap_factor`` or
    use the all-gather form where exactness under adversarial ids
    matters more than bytes.

    -> (new_table P('model', None), new_accum)
    """
    from ..train.sparse_embed import (
        RowwiseAdagradState, dedup_rows, rowwise_adagrad_update,
    )

    d = mesh.shape[DATA_AXIS]
    m = mesh.shape[MODEL_AXIS]
    if m == 1:
        new_t, st = rowwise_adagrad_update(
            table, RowwiseAdagradState(accum), ids.reshape(-1), row_grads,
            lr=lr, eps=eps, weight_decay=weight_decay, pad_row=pad_row,
            exact_dedup=True, halves=halves,
        )
        return new_t, st.accum
    V, W = table.shape

    def body(local_table, local_accum, ids_l, g_l, lr_l):
        rows = local_table.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        flat = ids_l.reshape(-1)
        n = flat.shape[0]
        g = g_l.reshape(n, W)
        # pad-row occurrences carry zero grads (masked in the forward);
        # retire their ids to the drop sentinel so they neither consume
        # bucket slots nor receive decay (torch padding_idx semantics)
        is_pad = flat == pad_row
        g = g * (~is_pad)[:, None].astype(g.dtype)
        flat = jnp.where(is_pad, V, flat)

        # 1. local exact dedup: ascending unique ids with fp32 partial
        #    sums; padding slots carry ids >= V
        uids, gu = dedup_rows(flat, g, drop_index=V)
        valid = uids < V
        owner = jnp.minimum(uids // rows, m - 1)

        # 2. run-length bucketing (owner is non-decreasing)
        cap = -(-max(1, int(cap_factor * n)) // m)
        cap = max(8, -(-cap // 8) * 8)
        idx = jnp.arange(n, dtype=jnp.int32)
        run_start = jnp.searchsorted(
            owner, jnp.arange(m, dtype=owner.dtype), side="left"
        ).astype(jnp.int32)
        pos = idx - run_start[owner]
        keep = valid & (pos < cap)
        if drop_counter is not None:
            # production observability (VERDICT r4 #5): every shard
            # reports its LOCAL dropped-unique-id count to the host
            # rider registry (utils/log.riders); the train loop reads
            # the per-epoch total and logs/warns.  A cheap async
            # scalar callback — no step-signature change, no psum.
            from ..utils.log import _riders_add

            jax.debug.callback(
                _riders_add, drop_counter, jnp.sum(valid & ~keep),
                ordered=False,
            )
        if debug_overflow:
            # per-device dropped-unique-id count per step (opt-in:
            # mesh.extra.a2a_grad_debug) — nonzero means the
            # hash-uniform owner assumption is violated for this id
            # stream and cap_factor should rise (or use allgather)
            jax.debug.print(
                "a2a_grad_return dropped {d} unique ids (cap {c})",
                d=jnp.sum(valid & ~keep), c=cap,
            )
        # dropped items get DISTINCT out-of-range slots so the scatter's
        # unique_indices promise holds literally (mode='drop' discards
        # them)
        slot = jnp.where(keep, owner * cap + pos, m * cap + idx)
        send_ids = jnp.full((m * cap,), V, jnp.int32)
        send_ids = send_ids.at[slot].set(
            uids.astype(jnp.int32), mode="drop", unique_indices=True
        )
        send_g = jnp.zeros((m * cap, W), jnp.float32)
        send_g = send_g.at[slot].set(gu, mode="drop", unique_indices=True)

        # 3. buckets to their owners over the model axis
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(m, cap), MODEL_AXIS, 0, 0, tiled=True
        ).reshape(m * cap)
        recv_g = jax.lax.all_to_all(
            send_g.reshape(m, cap, W), MODEL_AXIS, 0, 0, tiled=True
        ).reshape(m * cap, W)

        # 4. gather the filtered buckets across data replicas — every
        #    data replica of this shard must apply the identical update
        ids_all = jax.lax.all_gather(
            recv_ids, DATA_AXIS, axis=0, tiled=True
        )
        g_all = jax.lax.all_gather(recv_g, DATA_AXIS, axis=0, tiled=True)

        # 5. local coords; foreign/padded ids -> dropped by the scatter
        li = ids_all - shard * rows
        own = (li >= 0) & (li < rows)
        li = jnp.where(own, li, rows).astype(jnp.int32)
        g_all = g_all * own[:, None]
        new_t, st = rowwise_adagrad_update(
            local_table, RowwiseAdagradState(local_accum), li, g_all,
            lr=lr_l[0], eps=eps, weight_decay=weight_decay,
            pad_row=pad_row - shard * rows,
            exact_dedup=True, halves=halves,
        )
        return new_t, st.accum

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS) if halves == 1 else P(MODEL_AXIS, None),
            # batch partitioned over BOTH axes, matching the a2a lookup
            P((DATA_AXIS, MODEL_AXIS), None),
            P((DATA_AXIS, MODEL_AXIS), None, None),
            P(),
        ),
        out_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS) if halves == 1 else P(MODEL_AXIS, None),
        ),
        # outputs are data-replicated (identical all_gathered update on
        # every replica) — unprovable for the static checker
        check_vma=False,
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    _ = d
    return fn(table, accum, ids, row_grads, lr_arr)


def sharded_embedding_lookup_a2a(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """DLRM-style id-exchange lookup: table P('model', None); ids with the
    batch dim partitioned over ('data','model') jointly (full DP)."""
    m = mesh.shape[MODEL_AXIS]
    if m == 1:
        return jnp.take(table, ids, axis=0)
    assert ids.ndim == 2, "expects (B, L) ids"
    fn = jax.shard_map(
        partial(_a2a_lookup, axis_name=MODEL_AXIS, n_shards=m),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
        out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
    )
    return fn(table, ids)
