import jax
import jax.numpy as jnp
import numpy as np

from tossctr_tpu.config import Config
from tossctr_tpu.models import CTRModel, build_model_spec
from tossctr_tpu.train.sparse_embed import (
    dedup_rows,
    init_rowwise_adagrad,
    rowwise_adagrad_update,
    sparse_sgd_update,
)


def test_dedup_rows_sums_duplicates():
    ids = jnp.asarray([5, 2, 5, 9, 2, 5], dtype=jnp.int32)
    g = jnp.arange(18, dtype=jnp.float32).reshape(6, 3)
    uids, gu = dedup_rows(ids, g, drop_index=100)
    uids = np.asarray(uids)
    gu = np.asarray(gu)
    want = {2: g[1] + g[4], 5: g[0] + g[2] + g[5], 9: g[3]}
    # padding slots carry distinct out-of-range ids >= drop_index (so the
    # scatter's unique_indices promise holds literally)
    real = uids < 100
    assert sorted(uids[real].tolist()) == [2, 5, 9]
    for u, row in zip(uids[real], gu[real]):
        assert np.allclose(row, np.asarray(want[int(u)]))
    # padding segments carry zero gradient
    assert np.allclose(gu[~real], 0.0)


def test_rowwise_adagrad_matches_manual():
    V, D = 20, 4
    rng = np.random.default_rng(0)
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = np.array([3, 7, 3, 0], np.int32)  # dup id 3, pad id 0
    g = rng.normal(0, 1, (4, D)).astype(np.float32)
    st = init_rowwise_adagrad(jnp.asarray(table))
    new_t, new_st = rowwise_adagrad_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(g),
        lr=0.1, eps=1e-8, weight_decay=0.0, pad_row=0, exact_dedup=True,
    )
    new_t = np.asarray(new_t)
    # manual
    want = table.copy()
    acc = np.zeros(V)
    for rid, grow in [(3, g[0] + g[2]), (7, g[1])]:
        g2 = np.mean(grow**2)
        acc[rid] += g2
        want[rid] -= 0.1 / (np.sqrt(acc[rid]) + 1e-8) * grow
    assert np.allclose(new_t, want, atol=1e-5)
    assert np.allclose(new_t[0], table[0])  # pad row untouched
    untouched = [i for i in range(V) if i not in (3, 7)]
    assert np.allclose(new_t[untouched], table[untouched])
    assert np.allclose(np.asarray(new_st.accum)[[3, 7]], acc[[3, 7]], atol=1e-6)


def test_rowwise_adagrad_scatter_path_unique_ids_matches_exact():
    """Without duplicates, the no-sort scatter path equals exact dedup."""
    V, D = 30, 4
    rng = np.random.default_rng(1)
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = np.array([3, 7, 12, 25], np.int32)
    g = rng.normal(0, 1, (4, D)).astype(np.float32)
    t_e, s_e = rowwise_adagrad_update(
        jnp.asarray(table), init_rowwise_adagrad(jnp.asarray(table)),
        jnp.asarray(ids), jnp.asarray(g), lr=0.1, exact_dedup=True,
    )
    t_s, s_s = rowwise_adagrad_update(
        jnp.asarray(table), init_rowwise_adagrad(jnp.asarray(table)),
        jnp.asarray(ids), jnp.asarray(g), lr=0.1, exact_dedup=False,
    )
    assert np.allclose(np.asarray(t_e), np.asarray(t_s), atol=1e-6)
    assert np.allclose(np.asarray(s_e.accum), np.asarray(s_s.accum), atol=1e-6)


def test_rowwise_adagrad_scatter_path_duplicates_semantics():
    """Duplicates: accumulator sums per-occurrence g^2; each occurrence is
    scaled by the shared post-accumulation denominator."""
    V, D = 10, 2
    table = np.zeros((V, D), np.float32)
    ids = np.array([4, 4], np.int32)
    g = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
    new_t, st = rowwise_adagrad_update(
        jnp.asarray(table), init_rowwise_adagrad(jnp.asarray(table)),
        jnp.asarray(ids), jnp.asarray(g), lr=1.0, eps=0.0, exact_dedup=False,
    )
    acc = 1.0 + 4.0  # mean over D of each occurrence's g^2, summed
    assert np.isclose(float(st.accum[4]), acc)
    want_row = -(1.0 / np.sqrt(acc)) * (g[0] + g[1])
    assert np.allclose(np.asarray(new_t)[4], want_row, atol=1e-6)


def test_rowwise_adagrad_lazy_weight_decay():
    V, D = 10, 2
    table = np.ones((V, D), np.float32)
    st = init_rowwise_adagrad(jnp.asarray(table))
    ids = np.array([4], np.int32)
    g = np.zeros((1, D), np.float32)
    new_t, _ = rowwise_adagrad_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(g),
        lr=0.5, weight_decay=0.1,
    )
    new_t = np.asarray(new_t)
    assert np.allclose(new_t[4], 1.0 * (1 - 0.5 * 0.1))
    assert np.allclose(new_t[5], 1.0)  # untouched rows see no decay (lazy)


def test_sparse_sgd_update():
    V, D = 8, 2
    table = np.zeros((V, D), np.float32)
    ids = np.array([1, 1, 2], np.int32)
    g = np.ones((3, D), np.float32)
    new_t = np.asarray(
        sparse_sgd_update(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(g), lr=0.1)
    )
    assert np.allclose(new_t[1], -0.2)  # duplicate adds twice
    assert np.allclose(new_t[2], -0.1)


# ---- perturbation gradients == dense table-row gradients ----


def _tiny_cfg(emb_opt):
    return Config.from_dict(
        {
            "data": {"cat_cols": ["c1"], "hash_buckets": {"c1": 13}},
            "sequence": {
                "max_len": 12, "top_k": 4, "recency_tau": 8,
                "query_mode": "S1", "query_key": "c1",
                "transformer_block": False, "tfm": {"gating": "softmax"},
            },
            "model": {
                # split tables: this file asserts the split-path
                # semantics (fused parity: tests/test_fused_tables.py)
                "fused_seq_tables": False,
                "emb_dim": 8, "seq_vocab": 40, "dare_dropout": 0.0,
                "cat_embedding_dims": {"c1": 4},
                "qnn_alpha": {"enabled": True, "feature_embed_dim": 4, "heads": 2,
                               "rank": 3, "proj_dim": 6, "mlp_hidden": [16],
                               "dropout": 0.0, "use_se": False,
                               "aux_head_weight": 0.1},
            },
            "train": {"batch_size": 6, "epochs": 1, "embedding_optimizer": emb_opt,
                      "grad_clip_norm": 0.0, "lr": 0.02, "warmup_epochs": 0},
        }
    )


def _batch(cfg, B=6):
    rng = np.random.default_rng(3)
    seq = rng.integers(1, cfg.model.seq_vocab, (B, cfg.sequence.max_len)).astype(np.int32)
    seq[:, :4] = 0
    return {
        "X_num": rng.normal(0, 1, (B, 3)).astype(np.float32),
        "X_mask": np.zeros((B, 3), np.float32),
        "X_cat": rng.integers(0, 13, (B, 1)).astype(np.int32),
        "seq": seq,
        "y": (rng.random(B) < 0.5).astype(np.float32),
    }


def test_pert_grads_equal_dense_table_grads():
    """Scattered perturbation gradients must equal the dense autodiff
    table gradients — the sparse path computes the same math."""
    from tossctr_tpu.train.loss import bce_wll_style

    cfg_d = _tiny_cfg("adamw")
    batch = _batch(cfg_d)
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": cfg_d.sequence.max_len}
    spec = build_model_spec(cfg_d, dims)
    fb = {k: v for k, v in batch.items() if k != "y"}

    dense_model = CTRModel(spec=spec, sparse_tables=False)
    variables = dense_model.init(jax.random.PRNGKey(0), fb, deterministic=True)
    params = {"params": variables["params"]}

    def dense_loss(p):
        z, _, aux = dense_model.apply(p, fb, deterministic=True)
        return bce_wll_style(z, batch["y"]) + 0.1 * bce_wll_style(aux, batch["y"])

    g_dense = jax.grad(dense_loss)(params)
    g_att_dense = np.asarray(g_dense["params"]["dare"]["emb_att"])
    g_rep_dense = np.asarray(g_dense["params"]["dare"]["emb_rep"])

    sparse_model = CTRModel(spec=spec, sparse_tables=True)
    B, K, D = 6, 4, 8
    if cfg_d.sequence.pad_topk_to_tile:
        K = -(-K // 8) * 8  # DARE pads the selected-K dim to the sublane tile
    perts0 = {"dare": {"att_rows": jnp.zeros((B, K, D)), "rep_rows": jnp.zeros((B, K, D))}}

    def sparse_loss(perts):
        (z, _, aux), vo = sparse_model.apply(
            {**params, "perturbations": perts}, fb, deterministic=True,
            mutable=["intermediates"],
        )
        loss = bce_wll_style(z, batch["y"]) + 0.1 * bce_wll_style(aux, batch["y"])
        return loss, vo["intermediates"]["dare"]["sel_ids"][0]

    g_perts, sel_ids = jax.grad(sparse_loss, has_aux=True)(perts0)
    sel = np.asarray(sel_ids).reshape(-1)
    V = cfg_d.model.seq_vocab
    for name, dense in (("att_rows", g_att_dense), ("rep_rows", g_rep_dense)):
        rows = np.asarray(g_perts["dare"][name]).reshape(-1, D)
        scattered = np.zeros((V, D), np.float32)
        np.add.at(scattered, sel, rows)
        scattered[0] = 0.0  # pad row pinned
        assert np.allclose(scattered, dense, atol=1e-5), name


def test_sparse_train_step_runs_and_learns():
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    cfg = _tiny_cfg("rowwise_adagrad")
    cfg.train.extra["grad_clip_norm"] = 0.5
    batch = _batch(cfg)
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    assert model.sparse_tables
    tx, schedule = make_optimizer(cfg, steps_per_epoch=5)
    variables = model.init(jax.random.PRNGKey(0), {k: v for k, v in batch.items() if k != "y"}, deterministic=True)
    state, ema_mask = make_train_state(cfg, variables, tx)
    step = make_train_step(model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask, schedule=schedule)

    att0 = np.asarray(state.params["params"]["dare"]["emb_att"]).copy()
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    att1 = np.asarray(state.params["params"]["dare"]["emb_att"])
    assert losses[-1] < losses[0]
    assert not np.allclose(att0, att1)  # tables ARE training
    assert np.allclose(att1[0], att0[0])  # pad row untouched
    touched = np.unique(np.asarray(batch["seq"]))
    untouched = np.setdiff1d(np.arange(cfg.model.seq_vocab), touched)
    assert np.allclose(att1[untouched], att0[untouched])  # row-sparse
    assert int(state.step) == 8


def test_bf16_tables_and_rbg_rng_train():
    """table_dtype=bfloat16 + rng_impl=rbg: step runs, loss decreases,
    tables stay bf16."""
    import jax.numpy as jnp
    from tossctr_tpu.train.trainer import (
        build_model, make_base_key, make_optimizer, make_train_state, make_train_step,
    )

    cfg = _tiny_cfg("rowwise_adagrad")
    cfg.model.table_dtype = "bfloat16"
    cfg.train.rng_impl = "rbg"
    batch = _batch(cfg)
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=5)
    variables = model.init(
        jax.random.PRNGKey(0), {k: v for k, v in batch.items() if k != "y"},
        deterministic=True,
    )
    assert variables["params"]["dare"]["emb_att"].dtype == jnp.bfloat16
    state, ema_mask = make_train_state(cfg, variables, tx)
    key = make_base_key(cfg, 1)
    step = make_train_step(model, tx, cfg, key, ema_mask=ema_mask, schedule=schedule)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert state.params["params"]["dare"]["emb_att"].dtype == jnp.bfloat16
