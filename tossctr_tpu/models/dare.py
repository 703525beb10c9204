"""DARE sequence encoder (reference: src/models/dare.py:72-162).

Two embedding tables over the behaviour-token vocabulary — ``att`` for
scoring, ``rep`` for representation — feed a recency-weighted top-k
selection (ops/topk_select.py), an optional small transformer over the
K selected tokens, score-gated aggregation, and an auxiliary
self-ensemble head.

TPU design notes:
  * The tables are the dominant memory object (2 x vocab x D); they are
    declared with a row-sharding-friendly layout — parallel/sharding.py
    assigns them PartitionSpec('model', None).
  * top-k selection runs with sparse backward (gradients touch only the
    K selected rows per example; see ops/topk_select.py).
  * K is static => the transformer compiles to fixed (B,K,D) shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..ops.table_init import chunked_normal_init
from ..ops.topk_select import dare_select_ids, log_decay_at
from .layers import DAREEncoderLayer


class DARE(nn.Module):
    seq_vocab: int
    emb_dim: int
    dropout: float
    top_k: int = 80
    recency_tau: float = 256.0
    pad_id: int = 0
    select_chunk: Optional[int] = None  # L-chunked streaming selection
    # hierarchical prefilter (ops/topk_select._proxy_topk_ids):
    # 0 candidates = off
    select_proxy_block: int = 64
    select_proxy_candidates: int = 0
    # round K up to the 8-sublane tile after selection (pads carry
    # pad_id; see the comment at the pad site) — keeps every (B,K,D)
    # tensor tile-aligned so kernel-boundary reshapes are bitcasts
    pad_topk: bool = True
    attn_impl: str = "packed"  # fused-attention geometry (layers.py)
    dropout_impl: str = "hash"  # hash | hw kernel dropout mask (layers.py)
    # store att/rep lane-fused as one (V, 2D) param "emb_tables": a row
    # is one native 128-lane tile at D=64 (no relayout copies, one
    # gather/scatter for both tables).  False = reference-shaped split
    # "emb_att"/"emb_rep" params (parity oracle).
    fused_tables: bool = False
    transformer_block: bool = True
    n_layers: int = 2
    n_heads: int = 4
    mha_dropout: float = 0.1
    ffn_hidden: int = 256
    ffn_dropout: float = 0.1
    norm: str = "rms"
    gating: str = "softmax"  # softmax | relu
    add_positional_bias: bool = True
    emb_init_std: float = 1.0  # torch nn.Embedding default is N(0,1)
    sparse_backward: bool = True
    # sparse_tables=True detaches the tables from autodiff entirely: the
    # train step reads gradients w.r.t. the *gathered rows* through the
    # 'perturbations' collection and applies row-sparse optimizer updates
    # (train/sparse_embed.py), instead of letting XLA materialize a dense
    # (vocab, D) scatter-add cotangent per table per step.
    sparse_tables: bool = False
    table_dtype: Any = jnp.float32  # storage dtype of the two tables
    use_pallas_attn: bool = False
    use_pallas_ffn: bool = False
    dtype: Any = jnp.float32
    # lookup_fn(table, ids) -> rows: replaces plain jnp.take for table
    # reads, e.g. the explicit row-sharded exchange over the 'model'
    # mesh axis (parallel/embedding.sharded_embedding_lookup)
    lookup_fn: Optional[Any] = None
    # pins the select-proxy table replicated under explicit sharding
    replicate_fn: Optional[Any] = None
    # initializer override for the big tables: build_model passes the
    # shard_map form when the tables are row-sharded so per-device init
    # temps stay O(one chunk) (ops/table_init.py — same values as the
    # default chunked grid on any mesh)
    table_init_fn: Optional[Any] = None

    @nn.compact
    def __call__(self, seq_ids, query_vec, deterministic: bool = True):
        """seq_ids (B,L) int32, query_vec (B,D) -> (u_seq (B,D), aux_logit (B,))"""
        D = self.emb_dim
        query = query_vec.astype(self.dtype)
        take = self.lookup_fn if self.lookup_fn is not None else (
            lambda t, i: jnp.take(t, i, axis=0)
        )
        # chunked N(0, std) draws: bounded per-device init temps at pod
        # vocabularies, mesh-layout independent (ops/table_init.py)
        tbl_init = self.table_init_fn or chunked_normal_init(
            self.emb_init_std, self.table_dtype
        )
        if self.fused_tables:
            # att/rep lane-fused into one (V, 2D) table: a row is exactly
            # one 128-lane TPU tile at D=64, so gathers/scatters hit the
            # native layout — XLA's (V, 64) gather otherwise inserts a
            # full transposed relayout copy of the table per step
            # (measured: 2.56 GB of step temps at 10M rows, zero when
            # fused; scripts/tpu_layout_probe.py)
            emb_tables = self.param(
                "emb_tables",
                tbl_init,
                (self.seq_vocab, 2 * D),
                self.table_dtype,
            )
            # selection scores read the att half of each gathered row
            att_lookup = lambda t, i: take(t, i)[..., :D]  # noqa: E731
            sel_table = emb_tables
        else:
            emb_att = self.param(
                "emb_att", tbl_init, (self.seq_vocab, D), self.table_dtype,
            )
            emb_rep = self.param(
                "emb_rep", tbl_init, (self.seq_vocab, D), self.table_dtype,
            )
            att_lookup = take
            sel_table = emb_att
        idx, sel_ids, log_decay = dare_select_ids(
            sel_table, seq_ids, query,
            top_k=self.top_k, tau=self.recency_tau, pad_id=self.pad_id,
            lookup_fn=att_lookup,
            select_chunk=self.select_chunk,
            select_proxy=(
                {"block": self.select_proxy_block,
                 "candidates": self.select_proxy_candidates,
                 "replicate_fn": self.replicate_fn}
                if self.select_proxy_candidates else None
            ),
        )
        K_logical = sel_ids.shape[1]
        if self.pad_topk:
            # Round K up to the 8-sublane tile once HERE: every (B,K,D)
            # tensor downstream is then tile-aligned, so the
            # (B,K,D)<->(B*K,D) reshapes around the fused kernels are
            # free bitcasts instead of relayout copies (~16 ms/step of
            # 'data formatting' in the r2 trace), and the kernels' own
            # K->Kp padding becomes a no-op.  The appended slots carry
            # pad_id, which the existing pad semantics (-1e9 score,
            # masked rows, zero gating weight) treat exactly like a
            # short sequence's pads — u_seq is unchanged.
            K_now = sel_ids.shape[1]
            K_pad = -(-K_now // 8) * 8
            if K_pad != K_now:
                padw = ((0, 0), (0, K_pad - K_now))
                sel_ids = jnp.pad(sel_ids, padw, constant_values=self.pad_id)
                idx = jnp.pad(idx, padw)
        self.sow("intermediates", "sel_ids", sel_ids)

        sel_nonpad = (sel_ids != self.pad_id).astype(self.dtype)[..., None]
        if self.fused_tables:
            tbl = jax.lax.stop_gradient(emb_tables) if self.sparse_tables else emb_tables
            # ONE (B,K,2D) gather yields both halves
            rows = take(tbl, sel_ids).astype(self.dtype) * sel_nonpad
            # sown pre-perturb so the sparse optimizer can reuse the
            # forward-gathered rows for lazy weight decay instead of a
            # second 491k-row gather (5.2 ms/step at B=8192); masked
            # rows also keep the pad row decay-free (torch padding_idx)
            self.sow("intermediates", "sel_rows", rows)
            # perturb(): identity whose cotangent is the rows' gradient
            rows = self.perturb("table_rows", rows)
            att_sel, sel_rep = rows[..., :D], rows[..., D:]
        else:
            att_tbl = jax.lax.stop_gradient(emb_att) if self.sparse_tables else emb_att
            rep_tbl = jax.lax.stop_gradient(emb_rep) if self.sparse_tables else emb_rep
            att_sel = take(att_tbl, sel_ids).astype(self.dtype) * sel_nonpad
            sel_rep = take(rep_tbl, sel_ids).astype(self.dtype) * sel_nonpad
            self.sow("intermediates", "att_rows_fwd", att_sel)
            self.sow("intermediates", "rep_rows_fwd", sel_rep)
            att_sel = self.perturb("att_rows", att_sel)
            sel_rep = self.perturb("rep_rows", sel_rep)
        vals = jnp.einsum("bkd,bd->bk", att_sel, query) + log_decay_at(
            idx, seq_ids.shape[1], float(self.recency_tau), self.dtype
        )
        vals = jnp.where(sel_ids == self.pad_id, jnp.asarray(-1e9, self.dtype), vals)

        x = sel_rep
        if self.transformer_block:
            for i in range(self.n_layers):
                x = DAREEncoderLayer(
                    d_model=self.emb_dim,
                    valid_k=(K_logical if sel_ids.shape[1] != K_logical else None),
                    attn_impl=self.attn_impl,
                    dropout_impl=self.dropout_impl,
                    n_heads=self.n_heads,
                    mha_dropout=self.mha_dropout,
                    ffn_hidden=self.ffn_hidden,
                    ffn_dropout=self.ffn_dropout,
                    norm=self.norm,
                    add_pos_bias=self.add_positional_bias,
                    max_len=self.top_k,
                    use_pallas_attn=self.use_pallas_attn,
                    use_pallas_ffn=self.use_pallas_ffn,
                    dtype=self.dtype,
                    name=f"layer_{i}",
                )(x, deterministic=deterministic)

        # gating over the selection-score logits (reference dare.py:150-155)
        if self.gating == "relu":
            w = nn.relu(vals)
            w = w / (w.sum(axis=1, keepdims=True) + 1e-12)
        else:
            w = nn.softmax(vals.astype(jnp.float32), axis=1).astype(self.dtype)
        u_seq = (x * w[..., None]).sum(axis=1)  # (B,D)
        u_seq = nn.Dropout(self.dropout)(u_seq, deterministic=deterministic)

        aux_logit = nn.Dense(
            1, dtype=self.dtype, param_dtype=jnp.float32, name="aux_head"
        )(u_seq)[:, 0]
        return u_seq, aux_logit
