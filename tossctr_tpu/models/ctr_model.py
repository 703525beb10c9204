"""CTRModel: full model assembly (reference: src/models/wrapper.py:7-176).

Composition: per-column hashed categorical embeddings + projection,
numeric/mask feature embeddings, context vector + query construction
(S1 / S2 / concat), DARE sequence encoder, and the QNN-alpha head (or
the fallback MLP head when disabled).  Returns
``(logits, sigmoid(logits), aux_logit)``.

TPU-first categorical design: the reference holds ~35 separate
``nn.Embedding + Linear`` pairs and loops over them in Python
(wrapper.py:106-112).  Here columns are **grouped by embedding width**;
each group keeps one flat row-offset table (sum of cardinalities, d_in)
and one stacked projection tensor (n_cols, d_in, D), so a group is one
gather plus one batched einsum on the MXU regardless of how many
columns it contains.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .dare import DARE
from .feature_embed import BinaryFeatureEmbedding, NumericFeatureEmbedding
from .qnn_alpha import QNNAlpha


@dataclass(frozen=True)
class CatGroup:
    d_in: int
    cols: Tuple[str, ...]  # column names in this group
    col_idx: Tuple[int, ...]  # positions in X_cat
    cards: Tuple[int, ...]  # cardinalities (bucket + margin)

    @property
    def offsets(self) -> Tuple[int, ...]:
        out, acc = [], 0
        for c in self.cards:
            out.append(acc)
            acc += c
        return tuple(out)

    @property
    def total_rows(self) -> int:
        return int(sum(self.cards))


@dataclass(frozen=True)
class ModelSpec:
    """Static model configuration resolved from (Config, cache dims)."""

    emb_dim: int
    f_embed: int
    num_dim: int
    mask_dim: int
    cat_cols: Tuple[str, ...]
    cat_groups: Tuple[CatGroup, ...]
    seq_vocab: int
    top_k: int
    recency_tau: float
    pad_id: int
    query_mode: str
    query_key: str
    transformer_block: bool
    tfm_n_layers: int
    tfm_n_heads: int
    tfm_mha_dropout: float
    tfm_ffn_hidden: int
    tfm_ffn_dropout: float
    tfm_norm: str
    tfm_gating: str
    tfm_add_pos_bias: bool
    dare_dropout: float
    embedding_dropout: float
    qnn_enabled: bool
    select_chunk: Optional[int] = None
    select_proxy_block: int = 64
    select_proxy_candidates: int = 0  # 0 = off
    fused_seq_tables: bool = True
    pad_topk: bool = True
    attn_impl: str = "packed"
    dropout_impl: str = "hash"
    table_dtype: str = "float32"
    qnn: Dict[str, Any] = field(default_factory=dict)
    block_slices: Dict[str, Tuple[int, int]] = field(default_factory=dict)
    aux_head_weight: float = 0.0

    @property
    def n_feat(self) -> int:
        return 1 + self.num_dim + self.mask_dim + len(self.cat_cols)


def build_model_spec(cfg, dims: Dict[str, int]) -> ModelSpec:
    """cfg: tossctr_tpu Config; dims: ShardCache.dims."""
    D = cfg.model.emb_dim
    qa = cfg.model.qnn_alpha
    f_embed = int(qa.feature_embed_dim or max(8, D // 4))
    cat_cols = tuple(cfg.data.cat_cols)
    # group columns by embedding width
    dims_map = cfg.model.cat_embedding_dims or {}
    by_width: Dict[int, List[int]] = {}
    for i, c in enumerate(cat_cols):
        by_width.setdefault(int(dims_map.get(c, D)), []).append(i)
    groups = tuple(
        CatGroup(
            d_in=w,
            cols=tuple(cat_cols[i] for i in idxs),
            col_idx=tuple(idxs),
            cards=tuple(cfg.data.bucket_for(cat_cols[i]) for i in idxs),
        )
        for w, idxs in sorted(by_width.items())
    )

    num_dim = int(dims["X_num"])
    mask_dim = int(dims["X_mask"])
    # block slices for pair_grouping='block' (reference wrapper.py:60-76)
    block: Dict[str, Tuple[int, int]] = {}
    ofs = 0
    block["seq"] = (ofs, ofs + 1)
    ofs += 1
    if num_dim > 0:
        block["num"] = (ofs, ofs + num_dim)
        ofs += num_dim
    if mask_dim > 0:
        block["mask"] = (ofs, ofs + mask_dim)
        ofs += mask_dim
    block["cat"] = (ofs, ofs + len(cat_cols))

    s = cfg.sequence
    return ModelSpec(
        emb_dim=D,
        f_embed=f_embed,
        num_dim=num_dim,
        mask_dim=mask_dim,
        cat_cols=cat_cols,
        cat_groups=groups,
        seq_vocab=int(cfg.model.seq_vocab),
        top_k=int(s.top_k),
        recency_tau=float(s.recency_tau),
        pad_id=int(s.pad_id),
        select_chunk=(int(s.select_chunk) if s.select_chunk else None),
        select_proxy_block=int(s.select_proxy_block),
        select_proxy_candidates=(
            int(s.select_proxy_candidates) if s.select_proxy else 0
        ),
        fused_seq_tables=bool(cfg.model.fused_seq_tables),
        pad_topk=bool(s.pad_topk_to_tile),
        attn_impl=str(cfg.model.attn_impl),
        dropout_impl=str(cfg.model.dropout_impl),
        query_mode=s.query_mode,
        query_key=s.query_key,
        transformer_block=bool(s.transformer_block),
        tfm_n_layers=int(s.tfm.n_layers),
        tfm_n_heads=int(s.tfm.n_heads),
        tfm_mha_dropout=float(s.tfm.mha_dropout),
        tfm_ffn_hidden=int(s.tfm.ffn_hidden),
        tfm_ffn_dropout=float(s.tfm.ffn_dropout),
        tfm_norm=s.tfm.norm,
        tfm_gating=s.tfm.gating,
        tfm_add_pos_bias=bool(s.tfm.add_positional_bias),
        dare_dropout=float(cfg.model.dare_dropout),
        embedding_dropout=float(cfg.model.embedding_dropout),
        qnn_enabled=bool(qa.enabled),
        table_dtype=str(cfg.model.table_dtype),
        qnn=dict(
            heads=int(qa.heads),
            rank=int(qa.rank),
            proj_dim=int(qa.proj_dim),
            mlp_hidden=tuple(qa.mlp_hidden),
            dropout=float(qa.dropout),
            use_se=bool(qa.use_se),
            se_reduction=int(qa.se_reduction),
            use_residual=bool(qa.use_residual),
            norm=qa.norm,
            pair_grouping=qa.pair_grouping,
        ),
        block_slices=block,
        aux_head_weight=float(qa.aux_head_weight),
    )


class GroupedCatEmbedding(nn.Module):
    """Width-grouped categorical embeddings: one flat table + one stacked
    projection per distinct width -> (B, Fc, D) in original column order."""

    groups: Tuple[CatGroup, ...]
    out_dim: int
    emb_init_std: float = 1.0
    dtype: Any = jnp.float32
    # lookup_fn(table, ids) -> rows: explicit sharded exchange for
    # row-sharded cat tables (mesh.cat_sharding: row); plain take else
    lookup_fn: Optional[Any] = None

    @nn.compact
    def __call__(self, X_cat):  # (B, Fc) int
        B = X_cat.shape[0]
        n_cols = sum(len(g.col_idx) for g in self.groups)
        parts = []
        order = []
        for gi, g in enumerate(self.groups):
            table = self.param(
                f"table_{g.d_in}",
                nn.initializers.normal(self.emb_init_std),
                (g.total_rows, g.d_in),
                jnp.float32,
            )
            proj = self.param(
                f"proj_{g.d_in}",
                nn.initializers.lecun_normal(),
                (len(g.col_idx), g.d_in, self.out_dim),
                jnp.float32,
            )
            ids = X_cat[:, np.array(g.col_idx)]  # (B, n_g)
            flat_ids = ids + jnp.asarray(g.offsets, ids.dtype)[None, :]
            take = self.lookup_fn if self.lookup_fn is not None else (
                lambda t, i: jnp.take(t, i, axis=0)
            )
            e = take(table, flat_ids).astype(self.dtype)  # (B,n_g,d_in)
            out = jnp.einsum(
                "bgd,gdo->bgo", e, proj.astype(self.dtype)
            )  # (B, n_g, D)
            parts.append(out)
            order.extend(g.col_idx)
        stacked = jnp.concatenate(parts, axis=1)  # grouped order
        inv = np.empty(n_cols, np.int32)
        inv[np.array(order)] = np.arange(n_cols)
        return stacked[:, inv, :]  # (B, Fc, D) original column order


class CTRModel(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    se_batch_stats: bool = True
    sparse_topk_backward: bool = True
    sparse_tables: bool = False  # see DARE.sparse_tables
    use_pallas_attn: bool = False
    use_pallas_ffn: bool = False
    # measured slower than the XLA einsum path at flagship shapes (the
    # VMEM-fitting blocks are too small); available but off by default
    use_pallas_fm: bool = False
    emb_init_std: float = 1.0
    # explicit sharded-lookup hook for the two DARE tables (see DARE)
    lookup_fn: Optional[Any] = None
    # explicit sharded-lookup hook for row-sharded grouped cat tables
    cat_lookup_fn: Optional[Any] = None
    # pins the select-proxy table replicated under explicit sharding
    replicate_fn: Optional[Any] = None
    # initializer override for the two DARE tables (ops/table_init.py:
    # shard_map chunked draw when row-sharded — bounded init temps)
    table_init_fn: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        sp = self.spec
        D = sp.emb_dim
        X_num = batch["X_num"].astype(self.dtype)
        X_mask = batch["X_mask"].astype(self.dtype)
        X_cat = batch["X_cat"]
        seq = batch["seq"]

        num_e = (
            NumericFeatureEmbedding(sp.num_dim, sp.f_embed, D, dtype=self.dtype, name="num_embed")(X_num)
            if sp.num_dim > 0
            else None
        )
        mask_e = (
            BinaryFeatureEmbedding(sp.mask_dim, sp.f_embed, D, dtype=self.dtype, name="mask_embed")(X_mask)
            if sp.mask_dim > 0
            else None
        )
        cat_e = (
            GroupedCatEmbedding(
                sp.cat_groups, D, emb_init_std=self.emb_init_std, dtype=self.dtype,
                lookup_fn=self.cat_lookup_fn, name="cat_embed"
            )(X_cat)
            if sp.cat_cols
            else None
        )  # (B, Fc, D), pre-dropout (context/query use this, wrapper.py:148-154)
        cat_stack = (
            nn.Dropout(sp.embedding_dropout)(cat_e, deterministic=deterministic)
            if cat_e is not None
            else None
        )

        # ---- context vector (S2/concat query; reference wrapper.py:114-126) ----
        ctx_parts = []
        if num_e is not None:
            ctx_parts.append(num_e.mean(axis=1))
        if mask_e is not None:
            ctx_parts.append(mask_e.mean(axis=1))
        if cat_e is not None:
            ctx_parts.append(cat_e.mean(axis=1))
        else:
            ctx_parts.append(jnp.zeros((X_num.shape[0], D), self.dtype))
        ctx = jnp.concatenate(ctx_parts, axis=1)

        # ---- query (reference wrapper.py:128-136) ----
        def s2():
            h = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="ctx_mlp")(ctx)
            return nn.relu(h)

        if sp.query_mode == "S1":
            q_idx = sp.cat_cols.index(sp.query_key)
            query = cat_e[:, q_idx, :]
        elif sp.query_mode == "S2":
            query = s2()
        else:  # concat = 0.5*(S1 + S2)
            q_idx = sp.cat_cols.index(sp.query_key)
            query = 0.5 * (cat_e[:, q_idx, :] + s2())

        # ---- DARE ----
        table_dtype = jnp.bfloat16 if sp.table_dtype == "bfloat16" else jnp.float32
        u_seq, aux_logit = DARE(
            seq_vocab=sp.seq_vocab,
            emb_dim=D,
            dropout=sp.dare_dropout,
            top_k=sp.top_k,
            recency_tau=sp.recency_tau,
            pad_id=sp.pad_id,
            select_chunk=sp.select_chunk,
            select_proxy_block=sp.select_proxy_block,
            select_proxy_candidates=sp.select_proxy_candidates,
            pad_topk=sp.pad_topk,
            attn_impl=sp.attn_impl,
            dropout_impl=sp.dropout_impl,
            fused_tables=sp.fused_seq_tables,
            transformer_block=sp.transformer_block,
            n_layers=sp.tfm_n_layers,
            n_heads=sp.tfm_n_heads,
            mha_dropout=sp.tfm_mha_dropout,
            ffn_hidden=sp.tfm_ffn_hidden,
            ffn_dropout=sp.tfm_ffn_dropout,
            norm=sp.tfm_norm,
            gating=sp.tfm_gating,
            add_positional_bias=sp.tfm_add_pos_bias,
            emb_init_std=self.emb_init_std,
            sparse_backward=self.sparse_topk_backward,
            sparse_tables=self.sparse_tables,
            use_pallas_attn=self.use_pallas_attn,
            use_pallas_ffn=self.use_pallas_ffn,
            table_dtype=table_dtype,
            dtype=self.dtype,
            lookup_fn=self.lookup_fn,
            replicate_fn=self.replicate_fn,
            table_init_fn=self.table_init_fn,
            name="dare",
        )(seq, query, deterministic=deterministic)

        # ---- head ----
        if sp.qnn_enabled:
            feat_list = [u_seq[:, None, :]]
            if num_e is not None:
                feat_list.append(num_e)
            if mask_e is not None:
                feat_list.append(mask_e)
            if cat_stack is not None:
                feat_list.append(cat_stack)
            xF = jnp.concatenate(feat_list, axis=1)  # (B, F, D)
            logits = QNNAlpha(
                in_feat=sp.n_feat,
                emb_dim=D,
                se_batch_stats=self.se_batch_stats,
                block_slices=sp.block_slices,
                use_pallas=self.use_pallas_fm,
                dtype=self.dtype,
                name="qnn",
                **sp.qnn,
            )(xF, deterministic=deterministic)
        else:
            feats_fc = [u_seq]
            if num_e is not None:
                feats_fc.append(num_e.mean(axis=1))
            if mask_e is not None:
                feats_fc.append(mask_e.mean(axis=1))
            if cat_e is not None:
                feats_fc += [cat_e[:, i, :] for i in range(len(sp.cat_cols))]
            h = jnp.concatenate(feats_fc, axis=1)
            h = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32, name="fc_0")(h)
            h = nn.relu(h)
            h = nn.Dropout(0.1)(h, deterministic=deterministic)
            logits = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="fc_1")(h)[:, 0]

        logits = logits.astype(jnp.float32)
        aux_logit = aux_logit.astype(jnp.float32)
        return logits, nn.sigmoid(logits), aux_logit
