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

A Pallas kernel (kernels: ops/pallas_dare.py) replaces the scoring
pass; this jnp version remains the correctness oracle for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def recency_log_decay(L: int, tau: float, dtype=jnp.float32) -> jnp.ndarray:
    """log(exp(-(L-1-pos)/tau) + 1e-8) for pos = 0..L-1
    (reference dare.py:126-130)."""
    pos = jnp.arange(L, dtype=dtype)
    decay = jnp.exp(-(L - 1 - pos) / jnp.maximum(1.0, tau).astype(dtype))
    return jnp.log(decay + 1e-8)


def _scores(att: jnp.ndarray, query: jnp.ndarray, seq_ids: jnp.ndarray,
            log_decay: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    s = jnp.einsum("bld,bd->bl", att, query) + log_decay[None, :]
    return jnp.where(seq_ids == pad_id, jnp.asarray(-1e9, s.dtype), s)


def dare_select_ids(
    att_table: jnp.ndarray,
    seq_ids: jnp.ndarray,
    query: jnp.ndarray,
    *,
    top_k: int,
    tau: float,
    pad_id: int = 0,
    score_fn=None,
    lookup_fn=None,
):
    """Selection phase only, entirely under stop_gradient:
    -> (idx (B,K) positions into L, sel_ids (B,K) token ids, log_decay (L,)).

    The indices are not differentiable, so running the full-L scoring
    pass without autodiff costs nothing in fidelity and keeps the
    (B,L,D) gather out of the backward graph (SURVEY.md §2.5).

    ``lookup_fn(table, ids) -> rows`` optionally replaces the plain
    gather (e.g. the explicit row-sharded exchange,
    parallel/embedding.py) and is ignored when ``score_fn`` is given."""
    B, L = seq_ids.shape
    K = min(top_k, L)
    cdt = query.dtype
    log_decay = recency_log_decay(L, float(tau), cdt)
    sg_table = jax.lax.stop_gradient(att_table)
    sg_query = jax.lax.stop_gradient(query)
    if score_fn is not None:
        scores = score_fn(sg_table, seq_ids, sg_query, log_decay, pad_id)
    else:
        take = lookup_fn if lookup_fn is not None else (
            lambda t, i: jnp.take(t, i, axis=0)
        )
        att = take(sg_table, seq_ids).astype(cdt)
        att = att * (seq_ids != pad_id)[..., None].astype(cdt)
        scores = _scores(att, sg_query, seq_ids, log_decay, pad_id)
    _, idx = jax.lax.top_k(scores, K)
    idx = jax.lax.stop_gradient(idx)
    sel_ids = jnp.take_along_axis(seq_ids, idx, axis=1)
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
    score_fn=None,
):
    """-> (sel_rep (B,K,D), vals (B,K), sel_ids (B,K)).

    ``score_fn(att_table, seq_ids, query, log_decay, pad_id) -> (B,L)``
    optionally replaces the dense scoring pass (e.g. with a Pallas
    kernel); it is only used under stop_gradient for index selection.
    """
    B, L = seq_ids.shape
    D = att_table.shape[-1]
    K = min(top_k, L)
    cdt = query.dtype
    log_decay = recency_log_decay(L, float(tau), cdt)
    nonpad = (seq_ids != pad_id)

    if sparse_backward:
        idx, sel_ids, log_decay = dare_select_ids(
            att_table, seq_ids, query, top_k=top_k, tau=tau, pad_id=pad_id,
            score_fn=score_fn,
        )
        # ---- differentiable recompute on the K selected positions ----
        sel_nonpad = (sel_ids != pad_id).astype(cdt)[..., None]
        att_sel = jnp.take(att_table, sel_ids, axis=0).astype(cdt) * sel_nonpad
        vals = jnp.einsum("bkd,bd->bk", att_sel, query)
        vals = vals + jnp.take(log_decay, idx)
        vals = jnp.where(sel_ids == pad_id, jnp.asarray(-1e9, cdt), vals)
    else:
        # dense reference path (correctness oracle / parity testing)
        att = jnp.take(att_table, seq_ids, axis=0).astype(cdt)
        att = att * nonpad[..., None].astype(cdt)
        scores = _scores(att, query, seq_ids, log_decay, pad_id)
        vals, idx = jax.lax.top_k(scores, K)
        sel_ids = jnp.take_along_axis(seq_ids, idx, axis=1)

    sel_nonpad = (sel_ids != pad_id).astype(cdt)[..., None]
    sel_rep = jnp.take(rep_table, sel_ids, axis=0).astype(cdt) * sel_nonpad
    return sel_rep, vals, sel_ids
