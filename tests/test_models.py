import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.config import Config
from tossctr_tpu.models import CTRModel, build_model_spec
from tossctr_tpu.models.feature_embed import NumericFeatureEmbedding
from tossctr_tpu.models.layers import RMSNorm, SEBlock


def _cfg(**over):
    base = {
        "data": {
            "cat_cols": ["gender", "inventory_id", "l_feat_1"],
            "hash_buckets": {"gender": 10, "inventory_id": 50, "l_feat_1": 20},
        },
        "sequence": {
            "max_len": 24,
            "top_k": 6,
            "recency_tau": 8,
            "query_mode": "concat",
            "query_key": "inventory_id",
            "transformer_block": True,
            "tfm": {"n_layers": 2, "n_heads": 2, "ffn_hidden": 32},
        },
        "model": {
            "emb_dim": 16,
            "seq_vocab": 300,
            "cat_embedding_dims": {"gender": 4, "inventory_id": 8, "l_feat_1": 4},
            "qnn_alpha": {
                "enabled": True,
                "feature_embed_dim": 8,
                "heads": 2,
                "rank": 4,
                "proj_dim": 12,
                "mlp_hidden": [32, 16],
                "aux_head_weight": 0.1,
            },
        },
        "train": {"batch_size": 8, "epochs": 1},
    }
    # these tests assert against the reference-shaped split emb_att /
    # emb_rep params (the parity oracle); the fused (V, 2D) layout has
    # its own parity suite in tests/test_fused_tables.py
    base["model"]["fused_seq_tables"] = False

    def deep_update(d, u):
        for k, v in u.items():
            if isinstance(v, dict) and isinstance(d.get(k), dict):
                deep_update(d[k], v)
            else:
                d[k] = v

    deep_update(base, over)
    return Config.from_dict(base)


def _batch(cfg, B=8, seed=0):
    rng = np.random.default_rng(seed)
    dims = {"X_num": 5, "X_mask": 5, "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    seq = rng.integers(1, cfg.model.seq_vocab, (B, dims["seq_len"])).astype(np.int32)
    seq[:, : dims["seq_len"] // 2] = 0
    return dims, {
        "X_num": rng.normal(0, 1, (B, 5)).astype(np.float32),
        "X_mask": (rng.random((B, 5)) < 0.2).astype(np.float32),
        "X_cat": np.stack(
            [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
        ).astype(np.int32),
        "seq": seq,
    }


def _init_apply(cfg, batch_over=None, model_over=None, B=8):
    dims, batch = _batch(cfg, B=B)
    spec = build_model_spec(cfg, dims)
    model = CTRModel(spec=spec, **(model_over or {}))
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    return model, params, batch, out


@pytest.mark.parametrize("qmode", ["S1", "S2", "concat"])
def test_forward_shapes_all_query_modes(qmode):
    cfg = _cfg(sequence={"query_mode": qmode})
    _, _, _, (z, p, aux) = _init_apply(cfg)
    assert z.shape == (8,) and p.shape == (8,) and aux.shape == (8,)
    assert np.all((np.asarray(p) > 0) & (np.asarray(p) < 1))
    assert np.allclose(np.asarray(p), 1 / (1 + np.exp(-np.asarray(z))), atol=1e-5)


def test_qnn_disabled_fallback_mlp():
    cfg = _cfg(model={"qnn_alpha": {"enabled": False}})
    _, params, _, (z, p, aux) = _init_apply(cfg)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("fc_0" in n for n in names)
    assert not any("qnn" in n for n in names)


def test_pair_grouping_block_runs():
    cfg = _cfg(model={"qnn_alpha": {"pair_grouping": "block"}})
    _, _, _, (z, _, _) = _init_apply(cfg)
    assert np.isfinite(np.asarray(z)).all()


def test_relu_gating_and_no_transformer():
    cfg = _cfg(sequence={"transformer_block": False, "tfm": {"gating": "relu"}})
    _, params, _, (z, _, _) = _init_apply(cfg)
    names = [
        "/".join(str(k) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    ]
    assert not any("layer_0" in n for n in names)
    assert np.isfinite(np.asarray(z)).all()


def test_bf16_compute_fp32_params():
    cfg = _cfg()
    _, params, batch, (z, p, _) = _init_apply(cfg, model_over={"dtype": jnp.bfloat16})
    # trainable params fp32 (perturbations follow the compute dtype)
    for leaf in jax.tree_util.tree_leaves(params["params"]):
        assert leaf.dtype == jnp.float32
    assert z.dtype == jnp.float32  # logits upcast at the head


def test_dropout_rng_train_mode_differs():
    cfg = _cfg(model={"embedding_dropout": 0.5, "dare_dropout": 0.5})
    dims, batch = _batch(cfg)
    spec = build_model_spec(cfg, dims)
    model = CTRModel(spec=spec)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    z1, _, _ = model.apply(
        params, batch, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    z2, _, _ = model.apply(
        params, batch, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    zd, _, _ = model.apply(params, batch, deterministic=True)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    assert np.isfinite(np.asarray(zd)).all()


def test_grouped_cat_embedding_order():
    """Grouped-by-width embedding must emit columns in the original
    cat_cols order: permuting a column's ids changes only its slot."""
    cfg = _cfg()
    dims, batch = _batch(cfg)
    spec = build_model_spec(cfg, dims)
    model = CTRModel(spec=spec)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    # S1 query reads cat column index of query_key=inventory_id (idx 1).
    cfg_s1 = _cfg(sequence={"query_mode": "S1"})
    spec_s1 = build_model_spec(cfg_s1, dims)
    m1 = CTRModel(spec=spec_s1)
    p1 = m1.init(jax.random.PRNGKey(0), batch, deterministic=True)
    z_a, _, _ = m1.apply(p1, batch, deterministic=True)
    b2 = dict(batch)
    b2["X_cat"] = batch["X_cat"].copy()
    b2["X_cat"][:, 1] = (batch["X_cat"][:, 1] + 1) % cfg.data.bucket_for("inventory_id")
    z_b, _, _ = m1.apply(p1, b2, deterministic=True)
    assert not np.allclose(np.asarray(z_a), np.asarray(z_b))


def test_gradients_flow_to_all_params():
    cfg = _cfg()
    dims, batch = _batch(cfg)
    spec = build_model_spec(cfg, dims)
    model = CTRModel(spec=spec)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    y = jnp.asarray(np.random.default_rng(0).integers(0, 2, 8).astype(np.float32))

    def loss_fn(p):
        z, _, aux = model.apply(p, batch, deterministic=True)
        return jnp.mean((z - y) ** 2) + 0.1 * jnp.mean((aux - y) ** 2)

    g = jax.grad(loss_fn)(params)
    zero_paths = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        name = "/".join(str(k) for k in path)
        if "emb_att" in name or "emb_rep" in name or "table_" in name:
            continue  # sparse rows: most are zero by design
        if float(jnp.abs(leaf).max()) == 0.0:
            zero_paths.append(name)
    assert zero_paths == [], zero_paths


def test_seq_table_grads_are_row_sparse():
    cfg = _cfg()
    dims, batch = _batch(cfg)
    spec = build_model_spec(cfg, dims)
    model = CTRModel(spec=spec)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    def loss_fn(p):
        z, _, _ = model.apply(p, batch, deterministic=True)
        return jnp.sum(z**2)

    g = jax.grad(loss_fn)(params)
    g_att = np.asarray(g["params"]["dare"]["emb_att"])
    nonzero_rows = np.unique(np.nonzero(np.abs(g_att).sum(1))[0])
    # at most B * K rows touched (sparse backward), and never the pad row
    assert nonzero_rows.size <= 8 * cfg.sequence.top_k
    assert 0 not in nonzero_rows


def test_rmsnorm_matches_reference_math():
    x = np.random.default_rng(0).normal(0, 2, (4, 8)).astype(np.float32)
    m = RMSNorm()
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(p, jnp.asarray(x)))
    want = x * (1.0 / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6))
    assert np.allclose(got, want, atol=1e-5)


def test_se_block_batch_stats_quirk():
    x = np.random.default_rng(0).normal(0, 1, (6, 16)).astype(np.float32)
    m = SEBlock(channels=16, reduction=4, batch_stats=True)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(m.apply(p, jnp.asarray(x)))
    half = np.asarray(m.apply(p, jnp.asarray(x[:3])))
    # batch-mean gating -> same rows give different outputs in different batches
    assert not np.allclose(full[:3], half)
    m2 = SEBlock(channels=16, reduction=4, batch_stats=False)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full2 = np.asarray(m2.apply(p2, jnp.asarray(x)))
    half2 = np.asarray(m2.apply(p2, jnp.asarray(x[:3])))
    assert np.allclose(full2[:3], half2, atol=1e-6)


def test_numeric_embedding_shapes_and_linearity():
    m = NumericFeatureEmbedding(n_features=3, f_embed=4, out_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (5, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    e = m.apply(p, x)
    assert e.shape == (5, 3, 8)
    e2 = m.apply(p, 2 * x)
    b0 = m.apply(p, 0 * x)  # bias-only output
    assert np.allclose(np.asarray(e2 - b0), 2 * np.asarray(e - b0), atol=1e-4)
