"""Training loop: jitted train step, K-fold driver, eval + calibration.

Reference call stack parity (src/train.py:92-359): StratifiedGroupKFold
with ``max(5, n_splits)`` / shuffle / seed, fold-skip resume, per-epoch
validation with EMA swap-in, optional per-epoch temperature/isotonic
calibration, best-epoch selection on the (calibrated) Score, early
stopping, and per-fold checkpoints.

TPU-first redesign of the hot loop (SURVEY.md §3 hot-loop #2): the
entire step — forward, loss, backward, AdamW update, EMA lerp — is one
jitted XLA program with donated state; the LR schedule is a pure
function of the global step consumed by optax instead of per-step
param-group writes; batches stream in through a background device
prefetcher.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.dataset import ShardCache
from ..data.loader import BatchIterator, DevicePrefetcher
from ..data.sampler import BalancedBatchSampler
from ..eval.calibration import Calibrator
from ..eval.metrics import final_score
from ..models import CTRModel, build_model_spec
from ..utils.log import Logger
from ..utils.seed import set_seed
from .checkpoint import (
    finalize_fold_checkpoint,
    fold_ckpt_exists,
    load_train_state,
    save_fold_checkpoint,
    save_train_state,
)
from .ema import EmaState, ema_params, init_ema, make_ema_mask, update_ema
from .loss import bce_wll_style, logit_l2, pairwise_auc_loss
from .sched import make_lr_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Optional[EmaState]
    step: jnp.ndarray  # int32 global step (1-based after first update)
    table_opt: Any = None  # sparse-mode per-table optimizer state


_EMB_MARKERS = ("emb_att", "emb_rep", "emb_tables", "table_")
# the giant sequence tables that get row-sparse treatment: the fused
# (V, 2D) "emb_tables" (model.fused_seq_tables, default) or the split
# reference-shaped pair
SEQ_TABLES = ("emb_tables", "emb_att", "emb_rep")
SPARSE_EMB_OPTS = ("rowwise_adagrad", "sparse_sgd")


def is_sparse_mode(cfg: Config) -> bool:
    return cfg.train.embedding_optimizer in SPARSE_EMB_OPTS


def _is_embedding_path(path) -> bool:
    name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
    return any(m in name for m in _EMB_MARKERS)


def extract_tables(params):
    """Split the DARE sequence table(s) out of the param tree.
    -> (rest_params, {'emb_tables': ...} or {'emb_att': ..., 'emb_rep': ...})"""
    top = dict(params["params"])
    dare = dict(top["dare"])
    tables = {k: dare.pop(k) for k in SEQ_TABLES if k in dare}
    top["dare"] = dare
    rest = dict(params)
    rest["params"] = top
    return rest, tables


def insert_tables(rest, tables):
    top = dict(rest["params"])
    dare = dict(top["dare"])
    dare.update(tables)
    top["dare"] = dare
    full = dict(rest)
    full["params"] = top
    return full


def make_optimizer(cfg: Config, steps_per_epoch: int):
    """Dense-parameter optimizer.  In sparse mode the returned transform
    covers only the non-table params (tables are updated by
    train/sparse_embed.py) and carries NO clip stage — global-norm
    clipping must see table-row grads too, so the train step scales
    grads manually before tx.update."""
    t = cfg.train
    sparse = is_sparse_mode(cfg)
    schedule = make_lr_schedule(
        t.lr,
        warmup_steps=t.warmup_epochs * steps_per_epoch,
        total_steps=t.epochs * steps_per_epoch,
        cosine=t.cosine,
    )
    # torch AdamW defaults (reference train.py:138)
    dense = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=t.weight_decay)
    if sparse or t.embedding_optimizer == "adamw":
        tx = dense
    else:
        # Dense-mode alternatives for the tables: factored second moments
        # (O(rows+cols) state) or plain SGD.
        if t.embedding_optimizer == "adafactor":
            emb = optax.adafactor(schedule)
        elif t.embedding_optimizer == "sgd":
            emb = optax.sgd(schedule)
        else:
            raise ValueError(f"unknown embedding_optimizer {t.embedding_optimizer}")
        label_fn = lambda params: jax.tree_util.tree_map_with_path(  # noqa: E731
            lambda path, _: "emb" if _is_embedding_path(path) else "dense", params
        )
        tx = optax.multi_transform({"dense": dense, "emb": emb}, label_fn)
    if not sparse and t.grad_clip_norm and t.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), tx)
    return tx, schedule


def use_explicit_exchange(cfg: Config, mesh) -> bool:
    """Explicit shard_map exchange for the DARE tables: on whenever the
    model axis is active and the vocab divides it (otherwise the tables
    fall back to replication / XLA auto-partitioning)."""
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return False
    if cfg.mesh.embedding_sharding != "row":
        return False
    if int(cfg.model.seq_vocab) % mesh.shape["model"]:
        return False
    return bool(cfg.mesh.extra.get("explicit_exchange", True))


def use_device_metrics(cfg: Config) -> bool:
    """eval.device_metrics: None = auto (on for TPU backends, where the
    tie-aware device AP avoids shipping 2M-row folds through sklearn)."""
    v = cfg.eval.device_metrics
    if v is None:
        return jax.default_backend() == "tpu"
    return bool(v)


def jitted_init(model: "CTRModel", key, init_batch):
    """``model.init`` under ``jax.jit``: one fused init program instead
    of op-by-op eager dispatch, which pays one small backend compile per
    primitive shape (~228 s cold at flagship shapes on the tunnel
    backend vs ~15 s fused; docs/ROUND4.md item 4).  Shared by bench.py
    and __graft_entry__ so the init arguments cannot drift."""
    return jax.jit(
        lambda k, b: model.init(k, b, deterministic=True)
    )(key, init_batch)


def build_model(cfg: Config, dims: Dict[str, int], mesh=None) -> CTRModel:
    spec = build_model_spec(cfg, dims)
    use_pallas = cfg.model.use_pallas_attention
    if use_pallas is None:  # auto: fused kernel on TPU backends only
        use_pallas = jax.default_backend() == "tpu"
    use_pallas_ffn = cfg.model.use_pallas_ffn
    if use_pallas_ffn is None:
        use_pallas_ffn = jax.default_backend() == "tpu"
    lookup_fn = None
    replicate_fn = None
    if use_explicit_exchange(cfg, mesh):
        # mesh.exchange selects the sharded-lookup form (VERDICT r2 #3):
        # psum = mask-gather-psum; a2a = DLRM-style id exchange.
        if cfg.mesh.exchange == "a2a":
            from ..parallel.embedding import sharded_embedding_lookup_a2a

            lookup_fn = partial(sharded_embedding_lookup_a2a, mesh=mesh)
        else:
            from ..parallel.embedding import sharded_embedding_lookup

            lookup_fn = partial(sharded_embedding_lookup, mesh=mesh)
        if cfg.sequence.select_proxy:
            # pin the prefilter's proxy REPLICATED: left to GSPMD, the
            # psum mode keeps it row-sharded and all-reduces a full
            # (b, L, D) proxy-score block — ici bytes the small
            # replicated proxy makes unnecessary
            # (tests/test_ici_bytes.py::test_select_proxy_lookup_bytes)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec(None, None))
            replicate_fn = lambda x: jax.lax.with_sharding_constraint(  # noqa: E731
                x, rep
            )
    table_init_fn = None
    if (
        mesh is not None
        and mesh.shape.get("model", 1) > 1
        and cfg.mesh.embedding_sharding == "row"
        and int(cfg.model.seq_vocab) % mesh.shape["model"] == 0
    ):
        from ..ops.table_init import sharded_chunked_normal_init

        # per-shard chunked draw: init temps stay O(one chunk) per
        # device at pod vocabularies; values identical to the 1-device
        # chunked grid (ops/table_init.py header, pod drill evidence).
        # std/dtype read from the SAME sources DARE's in-module
        # fallback uses, so sharded and 1-device inits can never
        # diverge if those defaults move.
        std = float(CTRModel.__dataclass_fields__["emb_init_std"].default)
        tdt = jnp.bfloat16 if str(cfg.model.table_dtype) == "bfloat16" else jnp.float32
        table_init_fn = sharded_chunked_normal_init(std, tdt, mesh)
    cat_lookup_fn = None
    if (
        mesh is not None
        and mesh.shape.get("model", 1) > 1
        and cfg.mesh.cat_sharding == "row"
    ):
        from ..parallel.embedding import sharded_embedding_lookup

        m = mesh.shape["model"]
        for g in spec.cat_groups:
            if g.total_rows % m:
                raise ValueError(
                    f"mesh.cat_sharding: row requires every grouped cat "
                    f"table's rows divisible by the model axis ({m}); "
                    f"group d_in={g.d_in} has {g.total_rows} rows "
                    f"(cols {g.cols}) — adjust hash_buckets/margin or use "
                    "cat_sharding: replicate"
                )
        cat_lookup_fn = partial(sharded_embedding_lookup, mesh=mesh)
    return CTRModel(
        spec=spec,
        dtype=cfg.compute_dtype,
        se_batch_stats=bool(cfg.model.qnn_alpha.se_batch_stats),
        sparse_tables=is_sparse_mode(cfg),
        use_pallas_attn=bool(use_pallas),
        use_pallas_ffn=bool(use_pallas_ffn),
        use_pallas_fm=bool(cfg.model.extra.get("use_pallas_fm", False)),
        lookup_fn=lookup_fn,
        cat_lookup_fn=cat_lookup_fn,
        replicate_fn=replicate_fn,
        table_init_fn=table_init_fn,
    )


def make_base_key(cfg: Config, seed: int):
    """Dropout base key honoring train.rng_impl ('rbg' is the TPU-fast
    generator; threefry matches the JAX default)."""
    if cfg.train.rng_impl and cfg.train.rng_impl != "threefry":
        return jax.random.key(seed, impl=cfg.train.rng_impl)
    return jax.random.PRNGKey(seed)


def ema_filter_for(cfg: Config):
    """EMA name-filter: the configured list, plus the two giant sequence
    tables in sparse mode (their shadow would be stale and 5 GB)."""
    ema_filter = list(cfg.ema.param_filter)
    if is_sparse_mode(cfg):
        ema_filter += [x for x in SEQ_TABLES if x not in ema_filter]
    return ema_filter


def make_train_state(cfg: Config, params, tx):
    """Build the initial TrainState (+ static EMA mask) from freshly
    initialized variables; strips non-param collections and wires the
    sparse-table optimizer state when sparse mode is on."""
    params = {"params": params["params"]} if "params" in params else params
    sparse = is_sparse_mode(cfg)
    ema_mask = make_ema_mask(params, ema_filter_for(cfg)) if cfg.ema.enabled else None
    ema = init_ema(params, ema_mask) if cfg.ema.enabled else None
    if sparse:
        from .sparse_embed import init_rowwise_adagrad

        rest, tables = extract_tables(params)
        opt_state = tx.init(rest)
        if cfg.train.embedding_optimizer == "rowwise_adagrad":
            table_opt = {
                k: init_rowwise_adagrad(v, halves=2 if k == "emb_tables" else 1)
                for k, v in tables.items()
            }
        else:
            table_opt = {}
    else:
        opt_state = tx.init(params)
        table_opt = None
    state = TrainState(params, opt_state, ema, jnp.zeros((), jnp.int32), table_opt)
    return state, ema_mask


def setup_sharded_state(cfg: Config, model: CTRModel, tx, sample, init_key, mesh):
    """Initialize the TrainState DIRECTLY into its mesh shardings.

    The init is traced abstractly first (jax.eval_shape), the sharding
    registry is resolved on the abstract tree, and the real init runs
    under ``jit(out_shardings=...)`` — so the row-sharded embedding
    tables are born sharded and never materialize on one device
    (matters at pod scale: 2 x 10M x 64 per table).

    -> (state, ema_mask, state_sh, params_sh)
    """
    from ..parallel.sharding import param_shardings, state_shardings

    def init_state(key):
        variables = model.init(key, sample, deterministic=True)
        return make_train_state(cfg, variables, tx)[0]

    state_shape = jax.eval_shape(init_state, init_key)
    shard_emb = cfg.mesh.embedding_sharding == "row"
    shard_cat = cfg.mesh.cat_sharding == "row"
    p_sh = param_shardings(
        mesh, state_shape.params, shard_embeddings=shard_emb,
        shard_cat_tables=shard_cat,
    )
    s_sh = state_shardings(mesh, state_shape, p_sh, shard_cat_tables=shard_cat)
    state = jax.jit(init_state, out_shardings=s_sh)(init_key)
    ema_mask = (
        make_ema_mask(state_shape.params, ema_filter_for(cfg))
        if cfg.ema.enabled
        else None
    )
    return state, ema_mask, s_sh, p_sh


def make_train_step(model: CTRModel, tx, cfg: Config, base_key, ema_mask=None,
                    schedule=None, state_sharding=None, mesh=None):
    aux_w = float(cfg.model.qnn_alpha.aux_head_weight)
    ema_cfg = cfg.ema
    loss_cfg = cfg.loss or {}
    # The reference *defines* rank/logit-l2 auxiliaries but their invocation
    # is commented out (train.py:170-183); apply_extra_losses=True opts in.
    apply_extra = bool(loss_cfg.get("apply_extra_losses", False))
    lam_rank = float(loss_cfg.get("lambda_rank", 0.0)) if apply_extra else 0.0
    lam_l2 = float(loss_cfg.get("lambda_logit_l2", 0.0)) if apply_extra else 0.0
    n_neg = int(loss_cfg.get("num_neg_per_pos", 8))
    hard_frac = float(loss_cfg.get("hard_neg_frac", 0.0))
    sparse = is_sparse_mode(cfg)
    clip = float(cfg.train.grad_clip_norm or 0.0)
    wd = float(cfg.train.weight_decay)
    pad_id = int(cfg.sequence.pad_id)
    emb_opt = cfg.train.embedding_optimizer
    if sparse:
        assert schedule is not None, "sparse mode needs the lr schedule"
    # pin the output state to the input's shardings so tables stay
    # row-sharded step over step (no resharding drift); loss sharding is
    # left to XLA (a replicated scalar)
    if state_sharding is not None:
        _jit = partial(
            jax.jit, donate_argnums=(0,), out_shardings=(state_sharding, None)
        )
    else:
        _jit = partial(jax.jit, donate_argnums=(0,))

    def total_loss(z, aux, y, rank_rng, valid=None):
        # ``valid`` masks the padded rows of a final partial batch
        # (train.drop_partial_batch=False, the reference behaviour) —
        # the masked loss equals the reference's smaller-batch loss.
        loss = bce_wll_style(z, y, valid=valid)
        if aux_w > 0:
            loss = loss + aux_w * bce_wll_style(aux, y, valid=valid)
        if lam_rank > 0:
            loss = loss + lam_rank * pairwise_auc_loss(
                z, y, rank_rng, num_neg_per_pos=n_neg, hard_frac=hard_frac,
                valid=valid,
            )
        if lam_l2 > 0:
            if valid is None:
                loss = loss + lam_l2 * logit_l2(z)
            else:
                v = valid.astype(jnp.float32)
                zz = z.astype(jnp.float32) ** 2
                loss = loss + lam_l2 * (
                    jnp.sum(zz * v) / jnp.maximum(jnp.sum(v), 1.0)
                )
        return loss

    def finish(params, opt_state, step, ema, table_opt):
        if ema is not None:
            ema = update_ema(
                ema, params, step,
                base_decay=float(ema_cfg.decay),
                warmup_steps=int(ema_cfg.warmup_steps),
                warmup_type=str(ema_cfg.warmup_type),
                update_after_step=int(ema_cfg.update_after_step),
                update_interval=int(ema_cfg.update_interval),
                mask=ema_mask,
            )
        return TrainState(params, opt_state, ema, step, table_opt)

    if not sparse:

        @_jit
        def train_step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
            y = batch["y"]
            valid = batch.get("valid")
            rng = jax.random.fold_in(base_key, state.step)
            drop_rng, rank_rng = jax.random.split(rng)

            def loss_fn(params):
                z, _, aux = model.apply(
                    params, batch, deterministic=False, rngs={"dropout": drop_rng}
                )
                return total_loss(z, aux, y, rank_rng, valid=valid)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return finish(params, opt_state, state.step + 1, state.ema, None), loss

        return train_step

    # ---- sparse-table mode ----
    from .sparse_embed import RowwiseAdagradState, rowwise_adagrad_update, sparse_sgd_update

    K = min(cfg.sequence.top_k, cfg.sequence.max_len)
    if cfg.sequence.pad_topk_to_tile:
        K = -(-K // 8) * 8  # DARE pads the selected-K dim to the sublane tile
    D = cfg.model.emb_dim
    cdt = cfg.compute_dtype
    exact_dedup = bool(cfg.train.extra.get("exact_dedup", False))
    # explicit owner-masked update on the local table shard (composes
    # with the sharded lookup; parallel/embedding.py) when the model
    # axis is active — results equal the unsharded update exactly
    explicit = use_explicit_exchange(cfg, mesh) and emb_opt == "rowwise_adagrad"
    # Pallas sweep-merge table update (ops/pallas_scatter.py): one
    # aligned read+write pass over both tables instead of the XLA
    # per-row scatter.  Measured on v5e (scripts/tpu_sweep_check.py):
    # 1295 ms/call vs 101 ms for the XLA scatter at flagship shapes —
    # the per-superblock pipeline cost dominates — so "auto" currently
    # resolves to the scatter; the kernel stays opt-in
    # (train.table_update: "sweep") while the block pipeline is tuned.
    tupd = str(cfg.train.extra.get("table_update", "auto"))
    if tupd == "sweep" and exact_dedup:
        raise ValueError(
            "train.table_update: 'sweep' is incompatible with "
            "train.exact_dedup: true (the sweep kernel implements the "
            "streaming scatter-add path) — disable one explicitly"
        )
    use_sweep = (
        emb_opt == "rowwise_adagrad"
        and not explicit
        and tupd == "sweep"
    )

    fused = bool(cfg.model.fused_seq_tables)

    @_jit
    def train_step_sparse(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        y = batch["y"]
        valid = batch.get("valid")
        B = batch["seq"].shape[0]
        rng = jax.random.fold_in(base_key, state.step)
        drop_rng, rank_rng = jax.random.split(rng)
        rest, tables = extract_tables(state.params)
        if fused:
            perts0 = {"dare": {"table_rows": jnp.zeros((B, K, 2 * D), cdt)}}
        else:
            perts0 = {
                "dare": {
                    "att_rows": jnp.zeros((B, K, D), cdt),
                    "rep_rows": jnp.zeros((B, K, D), cdt),
                }
            }

        def loss_fn(rest_params, perts):
            full = insert_tables(rest_params, tables)
            (z, _, aux), vo = model.apply(
                {**full, "perturbations": perts},
                batch,
                deterministic=False,
                rngs={"dropout": drop_rng},
                mutable=["intermediates"],
            )
            inter = vo["intermediates"]["dare"]
            sel_ids = inter["sel_ids"][0]
            # forward-gathered (pad-masked) rows, reused by the sparse
            # optimizer's lazy weight decay (no second row gather);
            # stop_gradient: they enter the update as plain values
            if fused:
                fwd_rows = {"emb_tables": inter["sel_rows"][0]}
            else:
                fwd_rows = {
                    "emb_att": inter["att_rows_fwd"][0],
                    "emb_rep": inter["rep_rows_fwd"][0],
                }
            fwd_rows = jax.lax.stop_gradient(fwd_rows)
            return total_loss(z, aux, y, rank_rng, valid=valid), (sel_ids, fwd_rows)

        (loss, (sel_ids, fwd_rows)), (g_rest, g_perts) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rest, perts0)

        # global-norm clip across dense grads AND table-row grads, matching
        # the reference's clip over all parameters (train.py:193-194)
        if clip > 0:
            gn = optax.global_norm((g_rest, g_perts))
            scale = jnp.where(gn > clip, clip / (gn + 1e-6), 1.0)
            g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)
            g_perts = jax.tree_util.tree_map(lambda g: g * scale, g_perts)

        updates, opt_state = tx.update(g_rest, state.opt_state, rest)
        rest = optax.apply_updates(rest, updates)

        lr_t = schedule(state.step)
        if fused:
            grads_by_table = {"emb_tables": g_perts["dare"]["table_rows"]}
        else:
            grads_by_table = {
                "emb_att": g_perts["dare"]["att_rows"],
                "emb_rep": g_perts["dare"]["rep_rows"],
            }
        table_opt = dict(state.table_opt)
        new_tables = {}
        if use_sweep:
            from ..ops.pallas_scatter import rowwise_adagrad_sweep_update

            names = list(grads_by_table)
            new_ts, new_accs = rowwise_adagrad_sweep_update(
                [tables[n] for n in names],
                [table_opt[n].accum for n in names],
                sel_ids,
                [grads_by_table[n] for n in names],
                lr=lr_t, weight_decay=wd, pad_row=pad_id,
                halves=2 if fused else 1,
            )
            for n, t, a in zip(names, new_ts, new_accs):
                new_tables[n] = t
                table_opt[n] = RowwiseAdagradState(accum=a)
            params = insert_tables(rest, new_tables)
            return finish(params, opt_state, state.step + 1, state.ema, table_opt), loss
        halves = 2 if fused else 1
        for name, g_rows in grads_by_table.items():
            # forward rows are in compute dtype; reuse them for lazy
            # weight decay only when that loses no precision vs a fresh
            # fp32-cast table gather (bf16 table -> bf16 rows = exact;
            # f32 table + bf16 compute would quantize the decay term)
            reuse = (
                fwd_rows[name]
                if jnp.dtype(tables[name].dtype) == jnp.dtype(fwd_rows[name].dtype)
                else None
            )
            if explicit:
                # exact all-gather return unless the user explicitly
                # opts into the capped bucketed form (its hash-uniform
                # owner assumption and overflow-drop semantics are not
                # implied by choosing the a2a LOOKUP)
                gx = cfg.mesh.grad_exchange or "allgather"
                if gx == "a2a":
                    from ..parallel.embedding import (
                        sharded_rowwise_adagrad_update_a2a,
                    )

                    new_tables[name], acc = sharded_rowwise_adagrad_update_a2a(
                        tables[name], table_opt[name].accum, sel_ids, g_rows,
                        mesh, lr=lr_t, weight_decay=wd, pad_row=pad_id,
                        halves=halves,
                        cap_factor=float(
                            cfg.mesh.extra.get("a2a_grad_cap_factor", 2.0)
                        ),
                        debug_overflow=bool(
                            cfg.mesh.extra.get("a2a_grad_debug", False)
                        ),
                        drop_counter="a2a_grad_dropped",
                    )
                else:
                    from ..parallel.embedding import (
                        sharded_rowwise_adagrad_update,
                    )

                    new_tables[name], acc = sharded_rowwise_adagrad_update(
                        tables[name], table_opt[name].accum, sel_ids, g_rows,
                        mesh, lr=lr_t, weight_decay=wd, pad_row=pad_id,
                        exact_dedup=exact_dedup, halves=halves,
                    )
                table_opt[name] = RowwiseAdagradState(accum=acc)
            elif emb_opt == "rowwise_adagrad":
                new_tables[name], table_opt[name] = rowwise_adagrad_update(
                    tables[name], table_opt[name], sel_ids, g_rows,
                    lr=lr_t, weight_decay=wd, pad_row=pad_id,
                    exact_dedup=exact_dedup, halves=halves,
                    rows=reuse,
                )
            else:  # sparse_sgd
                new_tables[name] = sparse_sgd_update(
                    tables[name], sel_ids, g_rows,
                    lr=lr_t, weight_decay=wd, pad_row=pad_id,
                    rows=reuse,
                )
        params = insert_tables(rest, new_tables)
        return finish(params, opt_state, state.step + 1, state.ema, table_opt), loss

    return train_step_sparse


def make_eval_step(model: CTRModel):
    @jax.jit
    def eval_step(params, batch):
        z, p, _ = model.apply(params, batch, deterministic=True)
        return z, p

    return eval_step


def run_validation(
    eval_step, params, loader, device_put=None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (y_true, p_raw, z_raw), padded rows dropped via the valid mask.

    The loop never syncs with the device: per-batch (z, p) stay on device
    (dispatch is async, so forward passes pipeline with host-side batch
    assembly) and ONE ``jax.device_get`` at the end moves everything.
    The reference transfers per batch (train.py:213-225); at 2M-row
    validation folds that serialized device and host every step.
    ``device_put`` optionally stages model inputs (e.g. with the mesh
    batch sharding)."""
    zs, ps, ys, valids = [], [], [], []
    for batch in loader:
        valids.append(np.asarray(batch.pop("valid")).astype(bool))
        if "y" in batch:
            ys.append(np.asarray(batch.pop("y")))
        if device_put is not None:
            batch = device_put(batch)
        z, p = eval_step(params, batch)
        zs.append(z)
        ps.append(p)
    if jax.process_count() > 1:
        # sharded outputs have non-addressable shards; fetch the global
        # values (one collective for the whole epoch)
        from jax.experimental import multihost_utils

        zs, ps = multihost_utils.process_allgather((zs, ps), tiled=True)
    else:
        zs, ps = jax.device_get((zs, ps))
    valid = np.concatenate(valids) if valids else np.zeros(0, bool)
    y = np.concatenate(ys)[valid] if ys else np.zeros(0)
    return (
        y,
        np.concatenate(ps)[valid] if ps else np.zeros(0),
        np.concatenate(zs)[valid] if zs else np.zeros(0),
    )


def train_one_fold(
    cfg: Config,
    fold: int,
    idx_tr: np.ndarray,
    idx_va: np.ndarray,
    manifest_path: str,
    logger: Logger,
    mesh=None,
) -> Dict[str, Any]:
    """-> best-state dict (params/ema/calibrator/score/epoch/global_step)
    (reference train.py:92-317).

    Runs SHARDED over ``mesh`` (built from ``cfg.mesh`` when not passed):
    batch data-parallel over the 'data' axis, embedding tables
    row-sharded over 'model'.  On one device this degenerates to the
    single-chip program with no overhead."""
    from ..parallel.mesh import build_mesh_from_cfg
    from ..parallel.sharding import batch_sharding

    t = cfg.train
    if mesh is None:
        mesh = build_mesh_from_cfg(cfg)
    n_data = mesh.shape["data"]
    if t.batch_size % (n_data or 1):
        raise ValueError(
            f"train.batch_size={t.batch_size} not divisible by mesh data "
            f"axis {n_data} (cfg.mesh={{data: {cfg.mesh.data}, model: "
            f"{cfg.mesh.model}}} over {mesh.size} devices)"
        )
    # the a2a lookup and the a2a grad return jointly partition the
    # batch over BOTH axes: demand divisibility at config time rather
    # than deep inside a shard_map trace error
    if (
        (cfg.mesh.exchange == "a2a" or cfg.mesh.grad_exchange == "a2a")
        and mesh.shape.get("model", 1) > 1
        and t.batch_size % mesh.size
    ):
        raise ValueError(
            f"mesh.exchange/grad_exchange 'a2a' partitions the batch over "
            f"data*model = {mesh.size} devices; train.batch_size="
            f"{t.batch_size} is not divisible by it"
        )
    bshard = batch_sharding(mesh)
    # Multi-host: every process computes the SAME global batch order
    # (samplers are pure functions of seed/fold/epoch), gathers only its
    # own row slice, and global arrays are assembled per batch with
    # jax.make_array_from_process_local_data (data/multihost.py).
    multihost = jax.process_count() > 1
    if multihost:
        from ..data.multihost import MultiHostBatchIterator, make_global_device_put

        bshard = make_global_device_put(mesh, t.batch_size)
    cache = ShardCache(manifest_path)
    y_all = cache.labels()

    if cfg.sampler.balanced:
        sampler = BalancedBatchSampler(
            y_all[idx_tr],
            batch_size=t.batch_size,
            pos_fraction=float(cfg.sampler.pos_fraction),
            replacement=True,
            seed=int(cfg.seed),
            drop_last=True,
            # reference quirk: set_epoch exists but train.py never calls it;
            # we do reseed per epoch unless configured otherwise.
            reseed_each_epoch=bool((cfg.sampler.extra or {}).get("reseed_each_epoch", True)),
        )
        tr_loader = BatchIterator(
            cache, idx_tr, batch_size=t.batch_size, train=True, sampler=sampler
        )
    else:
        tr_loader = BatchIterator(
            cache, idx_tr, batch_size=t.batch_size, train=True, shuffle=True,
            seed=cfg.seed,
            # reference behaviour: the final partial batch is trained on
            # (padded + valid-masked through the static-shape step)
            drop_last=bool(t.drop_partial_batch),
        )
    va_loader = BatchIterator(
        cache, idx_va, batch_size=t.batch_size, train=True, shuffle=False, drop_last=False
    )
    if multihost:
        tr_loader = MultiHostBatchIterator(tr_loader, mesh)
        va_loader = MultiHostBatchIterator(va_loader, mesh)

    model = build_model(cfg, cache.dims, mesh=mesh)
    steps_per_epoch = len(tr_loader)
    tx, schedule = make_optimizer(cfg, steps_per_epoch)

    init_key = jax.random.PRNGKey(cfg.seed + 101 * fold)
    sample = next(iter(BatchIterator(cache, idx_tr[: t.batch_size], batch_size=t.batch_size, train=True)))
    state, ema_mask, s_sh, _ = setup_sharded_state(
        cfg, model, tx, sample, init_key, mesh
    )

    step_key = make_base_key(cfg, cfg.seed + 7919 * fold)
    train_step = make_train_step(
        model, tx, cfg, step_key, ema_mask=ema_mask, schedule=schedule,
        state_sharding=s_sh, mesh=mesh,
    )
    eval_step = make_eval_step(model)

    use_ema_eval = cfg.ema.enabled and cfg.ema.eval_with_ema
    best = {"score": -1e9, "epoch": 0, "global_step": 0, "persisted": False}
    wait = 0
    start_epoch = 1

    exp_dir = cfg.exp_dir()
    state_path = os.path.join(exp_dir, f"fold_{fold}_state.msgpack")
    from .checkpoint import train_state_exists

    resume_skip = 0
    ckpt_every = int(cfg.train.step_checkpoint_interval or 0)
    if cfg.train.step_checkpointing and train_state_exists(state_path):
        target = {
            "state": state, "epoch": 0, "wait": 0, "step_in_epoch": 0,
            "best_score": 0.0, "best_epoch": 0, "best_global_step": 0,
        }
        saved = load_train_state(
            state_path, target, shardings={"state": s_sh, "epoch": None,
                                           "wait": None, "step_in_epoch": None,
                                           "best_score": None,
                                           "best_epoch": None,
                                           "best_global_step": None},
        )
        state = jax.device_put(saved["state"], s_sh)
        sie = int(saved.get("step_in_epoch", 0))
        if sie > 0:
            # mid-epoch save: re-enter the SAME epoch at the saved step;
            # the sampler stream is a pure function of (seed, fold,
            # epoch), so skipping the first `sie` batches reproduces the
            # uninterrupted trajectory bit-exactly
            start_epoch = int(saved["epoch"])
            resume_skip = sie
        else:
            start_epoch = int(saved["epoch"]) + 1
        wait = int(saved["wait"])
        best.update(
            score=float(saved["best_score"]), epoch=int(saved["best_epoch"]),
            global_step=int(saved["best_global_step"]), persisted=True,
        )
        logger.row(
            fold=fold, split="resume", epoch=start_epoch,
            msg=f"in-fold resume (step {resume_skip})" if resume_skip
            else "in-fold resume",
        )

    def _save_state(epoch: int, step_in_epoch: int):
        save_train_state(
            state_path,
            step_state={
                "state": state, "epoch": epoch, "wait": wait,
                "step_in_epoch": step_in_epoch,
                "best_score": best["score"], "best_epoch": best["epoch"],
                "best_global_step": best["global_step"],
            },
        )

    for epoch in range(start_epoch, t.epochs + 1):
        tr_loader.set_epoch(epoch)
        losses = []
        t0 = time.time()
        batch_it = iter(tr_loader)
        skip = resume_skip if epoch == start_epoch else 0
        for _ in range(skip):
            next(batch_it)  # fast-forward the (pure) sampler stream
        step_in_epoch = skip
        for batch in DevicePrefetcher(batch_it, device_put=bshard):
            state, loss = train_step(state, batch)
            losses.append(loss)
            step_in_epoch += 1
            if (
                cfg.train.step_checkpointing
                and ckpt_every > 0
                and step_in_epoch % ckpt_every == 0
                and step_in_epoch < steps_per_epoch
            ):
                _save_state(epoch, step_in_epoch)
        losses = [float(v) for v in jax.device_get(losses)]
        dt = time.time() - t0
        global_step = int(state.step)
        examples = (step_in_epoch - skip) * t.batch_size
        logger.throughput(f"fold{fold}", epoch, examples, dt)
        if cfg.mesh.grad_exchange == "a2a":
            from ..utils.log import riders

            jax.effects_barrier()  # flush the async drop-count callbacks
            a2a_dropped = riders.read_and_reset("a2a_grad_dropped")
            logger.scalars(f"fold{fold}", epoch, a2a_grad_dropped=a2a_dropped)
            if a2a_dropped:
                logger.row(
                    fold=fold, epoch=epoch,
                    warn=(
                        f"a2a grad return dropped {a2a_dropped} unique-id "
                        "gradients this epoch (bucket overflow) — raise "
                        "mesh.extra.a2a_grad_cap_factor or use "
                        "mesh.grad_exchange=allgather"
                    ),
                )

        eval_p = (
            ema_params(state.ema, state.params, ema_mask) if use_ema_eval else state.params
        )
        y_true, p_raw, z_raw = run_validation(
            eval_step, eval_p, va_loader, device_put=bshard
        )
        if use_device_metrics(cfg):
            from ..eval.metrics import final_score_device

            ap, wll, score = final_score_device(
                y_true, p_raw, formula=cfg.eval.score_formula
            )
        else:
            ap, wll, score = final_score(y_true, p_raw, formula=cfg.eval.score_formula)

        cal = None
        ap_cal = wll_cal = score_cal = None
        if cfg.calibration.enabled:
            c = cfg.calibration
            cal = Calibrator(
                method=c.method, lr=c.lr, iters=c.iters,
                clamp_T=c.clamp_T, l2_reg=c.l2_reg, min_iso_nodes=c.min_iso_nodes,
            ).fit(z_raw, y_true)
            p_cal = cal.predict_proba(z_raw)
            ap_cal, wll_cal, score_cal = final_score(
                y_true, p_cal, formula=cfg.eval.score_formula
            )

        lr_now = float(schedule(global_step - 1)) if global_step > 0 else t.lr
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        row = dict(
            fold=fold, epoch=epoch, split="val", loss=round(mean_loss, 6),
            AP=round(ap, 6), WLL=round(wll, 6), Score=round(score, 6),
            lr=f"{lr_now:.3e}", bs=t.batch_size, K=cfg.sequence.top_k,
            tau=cfg.sequence.recency_tau,
        )
        logger.row(**row, eps=f"{examples / max(dt, 1e-9):.0f}/s")
        logger.csv(**row)
        logger.scalars(
            f"fold{fold}", epoch,
            train_loss=mean_loss, val_AP=ap, val_WLL=wll, val_Score=score,
        )
        if cfg.calibration.enabled:
            logger.row(
                fold=fold, epoch=epoch, split="val_cal", loss="--",
                AP=round(ap_cal, 6), WLL=round(wll_cal, 6), Score=round(score_cal, 6),
            )
            logger.csv(
                fold=fold, epoch=epoch, split="val_cal", loss="--",
                AP=ap_cal, WLL=wll_cal, Score=score_cal,
                lr=f"{lr_now:.3e}", bs=t.batch_size, K=cfg.sequence.top_k,
                tau=cfg.sequence.recency_tau,
            )
            logger.scalars(f"fold{fold}", epoch, val_WLL_cal=wll_cal, val_Score_cal=score_cal)

        cur = score_cal if (cfg.calibration.enabled and score_cal is not None) else score
        if cur > best["score"]:
            best = {
                "score": float(cur),
                "epoch": int(epoch),
                "global_step": global_step,
                "persisted": True,
            }
            wait = 0
            # The best payload is written to disk IMMEDIATELY — straight
            # from the device state (row-sharded tables stream out
            # shard-by-shard, checkpoint.py) — instead of the reference's
            # host-RAM best_state copy (train.py:265-273): no 5-25 GB
            # host pull at pod scale, and a crash after this point loses
            # at most one epoch.  The merged EMA weights (exactly what
            # eval used) persist as the 'ema' payload.
            save_fold_checkpoint(
                exp_dir, fold, params=state.params, cfg_dict=cfg.to_dict(),
                best_score=float(cur), epoch=int(epoch),
                global_step=global_step,
                ema_shadow=(
                    ema_params(state.ema, state.params, ema_mask)
                    if state.ema is not None
                    else None
                ),
                calibrator=cal, complete=False,
            )
        else:
            wait += 1

        if cfg.train.step_checkpointing:
            _save_state(epoch, 0)
        if wait >= t.early_stop_patience:
            break

    if cfg.train.step_checkpointing:
        import shutil

        if os.path.exists(state_path):
            os.remove(state_path)
        if os.path.isdir(state_path + ".sharded"):
            shutil.rmtree(state_path + ".sharded")
    return best


def train_main(cfg: Config) -> str:
    """Full K-fold training run; returns the experiment directory
    (reference train.py:319-359).

    Multi-chip/multi-host aware: initializes the distributed runtime
    when launched under a managed pod env, builds the device mesh from
    ``cfg.mesh`` ONCE, and every fold trains sharded over it."""
    from sklearn.model_selection import StratifiedGroupKFold

    from ..parallel.mesh import build_mesh_from_cfg, maybe_initialize_distributed

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    maybe_initialize_distributed()
    mesh = build_mesh_from_cfg(cfg)

    # debug mode (SURVEY §5 "race detection / sanitizers" equivalent):
    # jax_debug_nans recompiles un-jitted on the first non-finite value
    # and points at the producing primitive — the TPU-native stand-in
    # for torch anomaly detection.  Opt-in: it disables donation reuse
    # and slows the step, so never on by default.
    if bool(cfg.extra.get("debug_nans", False)):
        jax.config.update("jax_debug_nans", True)

    os.makedirs(cfg.logging.log_dir, exist_ok=True)
    set_seed(cfg.seed, deterministic=cfg.deterministic)
    exp_dir = cfg.exp_dir()
    logger = Logger(exp_dir, tb=cfg.logging.tb, csv_log=cfg.logging.csv_log)
    logger.row(
        split="mesh",
        msg=f"devices={mesh.size} data={mesh.shape['data']} model={mesh.shape['model']}",
    )

    manifest_path = cfg.data.manifest_train or os.path.join(
        cfg.data.cache_dir, "train", "manifest.json"
    )
    from ..data.dataset import load_labels_groups_for_split

    y, groups = load_labels_groups_for_split(manifest_path)
    n_splits = int(cfg.cv.n_splits)
    effective = max(5, n_splits)
    sgkf = StratifiedGroupKFold(n_splits=effective, shuffle=True, random_state=cfg.seed)

    for fold, (tr, va) in enumerate(sgkf.split(np.zeros_like(y), y, groups)):
        if n_splits == 1 and fold > 0:
            break
        if fold_ckpt_exists(exp_dir, fold):
            logger.row(fold=fold, split="skip", msg="checkpoint exists (resume)")
            continue
        best = train_one_fold(cfg, fold, tr, va, manifest_path, logger, mesh=mesh)
        if best.get("persisted"):
            # the payload was written at the best epoch (no host-RAM best
            # copy exists); stamping meta.json completes the checkpoint
            finalize_fold_checkpoint(
                exp_dir, fold, cfg_dict=cfg.to_dict(), best_score=best["score"],
                epoch=best["epoch"], global_step=best["global_step"],
            )
        else:
            raise RuntimeError(f"fold {fold} produced no best state")
        logger.row(fold=fold, split="done", Score=round(best["score"], 6))
    return exp_dir
