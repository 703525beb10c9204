"""DARE top-k selection — the framework's hottest op.

Reference semantics (src/models/dare.py:116-138): for each row, score
every sequence position by ``<att_emb, query> + log(recency_decay)``
with pad positions masked to -1e9, take the top-k scores (output stays
in **score order**, not time order), and gather the *representation*
embeddings of the selected positions.  The selection scores double as
the gating logits.

TPU-first redesign (SURVEY.md §2.5 "fused Pallas top-k-select"):

  * The reference gathers BOTH (B,L,D) tables up front.  Here the rep
    table is only ever gathered at the K selected positions — traffic
    drops from 2·B·L·D to B·(L+K)·D.
  * ``sparse_backward=True`` additionally confines the *backward* pass
    to the selected rows: the full-L scoring pass runs under
    ``stop_gradient`` (it only determines indices, which are not
    differentiable anyway) and the k selected scores are recomputed
    from a (B,K,D) gather.  Gradients then touch K instead of L rows of
    the 10M-row att table — mathematically identical, because
    non-selected scores do not influence the output.
  * Pad handling: the reference's ``padding_idx`` pins row ``pad_id`` to
    zero with no gradient; here lookups are multiplied by the non-pad
    mask, which both zeroes the embedding and blocks its gradient.

A Pallas scoring kernel was built, measured, and REMOVED in round 2:
it still had to gather the full (B, L, D) rows into HBM first, and
XLA's fused gather+dot compiles to identical traffic — the pass is
latency-bound on the row gather itself (docs/DESIGN.md §2).  The
L-chunked ``select_chunk`` path below is the HBM-pressure option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def recency_log_decay(L: int, tau: float, dtype=jnp.float32) -> jnp.ndarray:
    """log(exp(-(L-1-pos)/tau) + 1e-8) for pos = 0..L-1
    (reference dare.py:126-130)."""
    pos = jnp.arange(L, dtype=dtype)
    decay = jnp.exp(-(L - 1 - pos) / jnp.maximum(1.0, tau).astype(dtype))
    return jnp.log(decay + 1e-8)


def log_decay_at(idx: jnp.ndarray, L: int, tau: float,
                 dtype=jnp.float32) -> jnp.ndarray:
    """recency_log_decay(L, tau)[idx], computed arithmetically.

    Gathering the (L,) decay vector at (B,K) positions compiles to a
    batched element-gather that measured 4 ms/step at B=8192 on v5e;
    the same values cost ~0 as an elementwise expression of idx.  Bit
    equality with the table holds because both evaluate the identical
    f32 expression per position."""
    pos = idx.astype(dtype)
    decay = jnp.exp(-(L - 1 - pos) / jnp.maximum(1.0, tau).astype(dtype))
    return jnp.log(decay + 1e-8)


def take_along_rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(a, idx, axis=1)`` for a (B, L) array via ONE
    flat 1-D gather.

    XLA:TPU lowers the batched 2-D form to a per-row kCustom gather
    (5.7 ms/step at B=8192, K=60); flattening to ids ``b*L + idx``
    makes it the same cheap 1-D row gather the embedding lookups use."""
    B, L = a.shape
    base = (jnp.arange(B, dtype=idx.dtype) * L)[:, None]
    return jnp.take(a.reshape(-1), idx + base, axis=0)


def _scores(att: jnp.ndarray, query: jnp.ndarray, seq_ids: jnp.ndarray,
            log_decay: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    s = jnp.einsum("bld,bd->bl", att, query) + log_decay[None, :]
    return jnp.where(seq_ids == pad_id, jnp.asarray(-1e9, s.dtype), s)


def _streaming_topk_ids(
    table: jnp.ndarray,
    seq_ids: jnp.ndarray,
    query: jnp.ndarray,
    log_decay: jnp.ndarray,
    pad_id: int,
    K: int,
    chunk: int,
    take,
):
    """Running top-k over L-chunks: the (B,L,D) att-embedding tensor
    never exists — each scan step gathers only (B,chunk,D), scores it,
    and merges into a (B,K) carry (SURVEY.md §2.5 "Sequence handling":
    blockwise over L, ring/long-context extensible).

    Tie-order matches the dense ``lax.top_k`` exactly: the carry rides
    first in each merge concat and ``lax.top_k`` is stable, so equal
    scores (the -1e9 pads) resolve to the earliest L position, same as
    one dense top_k over (B, L).
    """
    B, L = seq_ids.shape
    cdt = query.dtype
    n_chunks = -(-L // chunk)
    Lp = n_chunks * chunk
    if Lp > L:
        # phantom positions: pad_id tokens -> -1e9, and they sit after
        # every real position in merge order, so with K <= L they are
        # never selected
        seq_ids = jnp.pad(seq_ids, ((0, 0), (0, Lp - L)),
                          constant_values=pad_id)
        log_decay = jnp.pad(log_decay, (0, Lp - L))
    ids_cs = seq_ids.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    dec_cs = log_decay.reshape(n_chunks, chunk)
    pos0 = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    init = (
        jnp.full((B, K), -jnp.inf, cdt),
        jnp.zeros((B, K), jnp.int32),
    )

    def body(carry, xs):
        bv, bp = carry
        ids_c, dec_c, c0 = xs
        nonpad = (ids_c != pad_id)
        att = take(table, ids_c).astype(cdt) * nonpad[..., None].astype(cdt)
        s = jnp.einsum("bcd,bd->bc", att, query) + dec_c[None, :].astype(cdt)
        s = jnp.where(nonpad, s, jnp.asarray(-1e9, cdt))
        mv = jnp.concatenate([bv, s], axis=1)
        mp = jnp.concatenate(
            [bp, jnp.broadcast_to(c0 + jnp.arange(chunk, dtype=jnp.int32),
                                  (B, chunk))], axis=1
        )
        bv, j = jax.lax.top_k(mv, K)
        bp = take_along_rows(mp, j)
        return (bv, bp), None

    (vals, idx), _ = jax.lax.scan(body, init, (ids_cs, dec_cs, pos0))
    return idx


def _proxy_topk_ids(
    table: jnp.ndarray,
    seq_ids: jnp.ndarray,
    query: jnp.ndarray,
    log_decay: jnp.ndarray,
    tau: float,
    pad_id: int,
    K: int,
    block: int,
    candidates: int,
    take,
    replicate_fn=None,
):
    """Hierarchical prefilter (VERDICT r4 #8; exp/hier_select_probe.py).

    The scoring gather pays a flat ~12.8 ns per index from an HBM
    operand but only ~4 ns once the operand fits VMEM (docs/DESIGN.md
    round-4 cost function).  So: score every position against a small
    PROXY table — per-cluster means of the att rows, cluster(id) =
    id // block (pure arithmetic on the hashed ids) — keep the top
    `candidates` positions per row, and run the exact gather + score
    only on B*candidates rows.  24.3 ms vs 37.8 dense at flagship
    shapes on v5e (both above the dispatch floor), proxy build
    included (~1.9 ms, a streaming block-mean read of the table).

    Semantics: the returned top-k is the EXACT-score top-k *of the
    candidate set* — identical to the dense path whenever the true
    top-k survives the proxy stage (bit-identical at block=1, where
    the proxy IS the att table; tests/test_select_proxy.py).  Both
    sort stages are stable with position payloads, so tie order
    (earliest position first, pads last) matches the dense path.

    -> (idx (B,K) positions, sel_ids (B,K) token ids)
    """
    B, L = seq_ids.shape
    cdt = query.dtype
    V, Wt = table.shape
    D = query.shape[-1]
    C = V // block
    C2 = min(candidates, L)
    # proxy build: fp32 block means of the att half, stored in the
    # table dtype.  Recomputed per forward — the table moves every step.
    proxy = table.reshape(C, block, Wt)[:, :, :D]
    proxy = proxy.astype(jnp.float32).mean(axis=1).astype(table.dtype)
    if replicate_fn is not None:
        # under explicit sharding, pin the small proxy REPLICATED —
        # GSPMD's psum-mode default keeps it row-sharded and
        # all-reduces a full (b, L, D) proxy-score block instead
        proxy = replicate_fn(proxy)
    cl = jnp.minimum(seq_ids // block, C - 1)
    ps = jnp.take(proxy, cl.reshape(-1), axis=0).reshape(B, L, D).astype(cdt)
    s1 = jnp.einsum("bld,bd->bl", ps, query) + log_decay[None, :]
    s1 = jnp.where(seq_ids == pad_id, jnp.asarray(-1e9, s1.dtype), s1)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    _, cpos, cids = jax.lax.sort(
        (-s1, pos, seq_ids), dimension=-1, num_keys=1, is_stable=True
    )
    cpos, cids = cpos[:, :C2], cids[:, :C2]
    # exact stage on the candidates only (same lookup form as dense)
    nonpad = (cids != pad_id)
    att = take(table, cids).astype(cdt) * nonpad[..., None].astype(cdt)
    s2 = jnp.einsum("bcd,bd->bc", att, query)
    s2 = s2 + log_decay_at(cpos, L, tau, cdt)
    s2 = jnp.where(nonpad, s2, jnp.asarray(-1e9, s2.dtype))
    _, idx, sel_ids = jax.lax.sort(
        (-s2, cpos, cids), dimension=-1, num_keys=1, is_stable=True
    )
    return idx[:, :K], sel_ids[:, :K]


def dare_select_ids(
    att_table: jnp.ndarray,
    seq_ids: jnp.ndarray,
    query: jnp.ndarray,
    *,
    top_k: int,
    tau: float,
    pad_id: int = 0,
    lookup_fn=None,
    select_chunk=None,
    select_proxy=None,
):
    """Selection phase only, entirely under stop_gradient:
    -> (idx (B,K) positions into L, sel_ids (B,K) token ids, log_decay (L,)).

    The indices are not differentiable, so running the full-L scoring
    pass without autodiff costs nothing in fidelity and keeps the
    (B,L,D) gather out of the backward graph (SURVEY.md §2.5).

    ``lookup_fn(table, ids) -> rows`` optionally replaces the plain
    gather (e.g. the explicit row-sharded exchange,
    parallel/embedding.py)."""
    B, L = seq_ids.shape
    K = min(top_k, L)
    cdt = query.dtype
    log_decay = recency_log_decay(L, float(tau), cdt)
    sg_table = jax.lax.stop_gradient(att_table)
    sg_query = jax.lax.stop_gradient(query)
    take = lookup_fn if lookup_fn is not None else (
        lambda t, i: jnp.take(t, i, axis=0)
    )
    if select_proxy and select_proxy.get("candidates", L) < L:
        # select_proxy = {"block": int, "candidates": int} — the
        # hierarchical prefilter (falls through to the dense pass when
        # candidates >= L, where prefiltering is a no-op)
        idx, sel_ids = _proxy_topk_ids(
            sg_table, seq_ids, sg_query, log_decay, float(tau), pad_id, K,
            int(select_proxy["block"]), int(select_proxy["candidates"]),
            take, replicate_fn=select_proxy.get("replicate_fn"),
        )
    elif select_chunk and select_chunk < L:
        idx = _streaming_topk_ids(
            sg_table, seq_ids, sg_query, log_decay, pad_id, K,
            int(select_chunk), take,
        )
        sel_ids = take_along_rows(seq_ids, idx)
    else:
        att = take(sg_table, seq_ids).astype(cdt)
        att = att * (seq_ids != pad_id)[..., None].astype(cdt)
        scores = _scores(att, sg_query, seq_ids, log_decay, pad_id)
        # ONE variadic stable sort carries positions AND token ids as
        # payloads, replacing top_k + a (B*K,) element gather of the
        # ids (the gather measured 3.5 ms/step at B=8192 on v5e —
        # latency-bound random reads).  Tie order matches lax.top_k:
        # stable ascending sort on -score keeps equal scores in
        # original (lowest-position-first) order.
        B_ = scores.shape[0]
        pos = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None, :], (B_, L)
        )
        _, idx_s, ids_s = jax.lax.sort(
            (-scores, pos, seq_ids), dimension=-1, num_keys=1,
            is_stable=True,
        )
        idx, sel_ids = idx_s[:, :K], ids_s[:, :K]
    idx = jax.lax.stop_gradient(idx)
    sel_ids = jax.lax.stop_gradient(sel_ids)
    return idx, sel_ids, log_decay


def dare_topk_select(
    att_table: jnp.ndarray,
    rep_table: jnp.ndarray,
    seq_ids: jnp.ndarray,
    query: jnp.ndarray,
    *,
    top_k: int,
    tau: float,
    pad_id: int = 0,
    sparse_backward: bool = True,
):
    """-> (sel_rep (B,K,D), vals (B,K), sel_ids (B,K))."""
    B, L = seq_ids.shape
    D = att_table.shape[-1]
    K = min(top_k, L)
    cdt = query.dtype
    log_decay = recency_log_decay(L, float(tau), cdt)
    nonpad = (seq_ids != pad_id)

    if sparse_backward:
        idx, sel_ids, log_decay = dare_select_ids(
            att_table, seq_ids, query, top_k=top_k, tau=tau, pad_id=pad_id,
        )
        # ---- differentiable recompute on the K selected positions ----
        sel_nonpad = (sel_ids != pad_id).astype(cdt)[..., None]
        att_sel = jnp.take(att_table, sel_ids, axis=0).astype(cdt) * sel_nonpad
        vals = jnp.einsum("bkd,bd->bk", att_sel, query)
        vals = vals + log_decay_at(idx, L, float(tau), cdt)
        vals = jnp.where(sel_ids == pad_id, jnp.asarray(-1e9, cdt), vals)
    else:
        # dense reference path (correctness oracle / parity testing)
        att = jnp.take(att_table, seq_ids, axis=0).astype(cdt)
        att = att * nonpad[..., None].astype(cdt)
        scores = _scores(att, query, seq_ids, log_decay, pad_id)
        vals, idx = jax.lax.top_k(scores, K)
        sel_ids = take_along_rows(seq_ids, idx)

    sel_nonpad = (sel_ids != pad_id).astype(cdt)[..., None]
    sel_rep = jnp.take(rep_table, sel_ids, axis=0).astype(cdt) * sel_nonpad
    return sel_rep, vals, sel_ids
