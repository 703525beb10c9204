"""The checked-in TPU experiment family (cfgs/*_tpu.yaml) mirrors the
reference experiment lineage (reference cfgs/dare_base.yaml,
v2_0.34397.yaml, v3_k120_s1.yaml, v3_k148_s1.yaml, v4_k120_s1.yaml):
each config must load through the base-include mechanism, carry the
experiment's defining deltas, build a valid ModelSpec, and run one
train step at shrunken shapes.
"""

import os

import numpy as np
import pytest

from tossctr_tpu.config import Config, load_config
from tossctr_tpu.config.schema import deep_merge, load_yaml_with_base

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfgs")

FAMILY = {
    "dare_base_tpu.yaml": dict(
        top_k=80, query_mode="S1", transformer=False, qnn=False,
        batch=16384, n_cat=6,
    ),
    "dare_qnn_next_tpu.yaml": dict(
        top_k=60, query_mode="concat", transformer=True, qnn=True,
        batch=8192, n_cat=35,
    ),
    "v2_tpu.yaml": dict(
        top_k=60, query_mode="concat", transformer=True, qnn=True,
        batch=8192, n_cat=35, epochs=10,
    ),
    "v3_k120_s1_tpu.yaml": dict(
        top_k=120, query_mode="S1", transformer=True, qnn=True,
        batch=8192, n_cat=35, n_layers=4,
    ),
    "v3_k148_s1_tpu.yaml": dict(
        top_k=148, query_mode="S1", transformer=True, qnn=True,
        batch=4096, n_cat=35, n_layers=4, covis=True,
    ),
    "v4_k120_s1_tpu.yaml": dict(
        top_k=120, query_mode="S1", transformer=True, qnn=True,
        batch=8192, n_cat=33, n_layers=4, aux_w=0.15,
    ),
}


def test_deep_merge_semantics():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": 3}
    over = {"b": {"y": 5, "z": 6}, "c": None, "d": 7}
    assert deep_merge(base, over) == {"a": 1, "b": {"x": 1, "y": 5, "z": 6}, "d": 7}


@pytest.mark.parametrize("name", sorted(FAMILY))
def test_family_config_deltas(name):
    cfg = load_config(os.path.join(CFG_DIR, name))
    want = FAMILY[name]
    assert cfg.sequence.top_k == want["top_k"]
    assert cfg.sequence.query_mode == want["query_mode"]
    assert cfg.sequence.transformer_block == want["transformer"]
    assert cfg.model.qnn_alpha.enabled == want["qnn"]
    assert cfg.train.batch_size == want["batch"]
    assert len(cfg.data.cat_cols) == want["n_cat"]
    if "epochs" in want:
        assert cfg.train.epochs == want["epochs"]
    if "n_layers" in want:
        assert cfg.sequence.tfm.n_layers == want["n_layers"]
    if want.get("covis"):
        assert cfg.features["covis"]["enabled"] is True
    if "aux_w" in want:
        assert cfg.model.qnn_alpha.aux_head_weight == want["aux_w"]


def test_v4_removes_columns_everywhere():
    cfg = load_config(os.path.join(CFG_DIR, "v4_k120_s1_tpu.yaml"))
    assert "l_feat_20" not in cfg.data.cat_cols
    assert "l_feat_23" not in cfg.data.cat_cols
    assert cfg.data.remove_cols == ["l_feat_20", "l_feat_23"]
    assert "l_feat_20" not in cfg.model.cat_embedding_dims
    assert cfg.data.bucket_for("inventory_id") >= 2000003
    assert cfg.calibration.extra.get("lambda_mix") == 0.25


def test_dare_base_drops_inherited_embedding_dims():
    cfg = load_config(os.path.join(CFG_DIR, "dare_base_tpu.yaml"))
    assert cfg.model.cat_embedding_dims == {}
    assert cfg.data.bucket_for("inventory_id") >= 2000000


@pytest.mark.parametrize("name", sorted(FAMILY))
def test_family_one_train_step(name):
    """Each family experiment runs one real train step at shrunken
    shapes (tiny vocab/batch/seq so the 10M-row tables do not
    materialize on the test CPU)."""
    import jax

    from tossctr_tpu.models import build_model_spec
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    d = load_yaml_with_base(os.path.join(CFG_DIR, name))
    d = deep_merge(d, {
        "model": {"seq_vocab": 5000, "use_pallas_attention": False},
        "train": {"batch_size": 32},
        "sequence": {"max_len": 24},
        "features": {"covis": {"enabled": False}},
        "mesh": {"data": 1, "model": 1},
    })
    cfg = Config.from_dict(d)
    n_num = 7
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    spec = build_model_spec(cfg, dims)
    assert spec.n_feat == 1 + 2 * n_num + len(cfg.data.cat_cols)

    rng = np.random.default_rng(11)
    B = cfg.train.batch_size
    batch = {
        "X_num": rng.normal(0, 1, (B, n_num)).astype(np.float32),
        "X_mask": np.zeros((B, n_num), np.float32),
        "X_cat": np.stack(
            [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
        ).astype(np.int32),
        "seq": rng.integers(0, cfg.model.seq_vocab, (B, cfg.sequence.max_len)).astype(np.int32),
        "y": (rng.random(B) < 0.3).astype(np.float32),
    }
    model = build_model(cfg, dims)
    tx, schedule = make_optimizer(cfg, 10)
    variables = model.init(
        jax.random.PRNGKey(0),
        {k: v for k, v in batch.items() if k != "y"},
        deterministic=True,
    )
    state, mask = make_train_state(cfg, variables, tx)
    step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=mask, schedule=schedule
    )
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


def test_pod_scale_stretch_one_train_step():
    """The pod-scale stretch config (100M-row tables, B=32768, mesh
    over data x model) builds and runs one step at shrunken shapes —
    the same smoke contract as the reference family."""
    import jax

    from tossctr_tpu.models import build_model_spec
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    d = load_yaml_with_base(os.path.join(CFG_DIR, "pod_scale_stretch.yaml"))
    d = deep_merge(d, {
        "model": {"seq_vocab": 5000, "use_pallas_attention": False},
        "train": {"batch_size": 32},
        "sequence": {"max_len": 24, "top_k": 8},
        "features": {"covis": {"enabled": False}},
        "mesh": {"data": 1, "model": 1},
    })
    cfg = Config.from_dict(d)
    n_num = 7
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    spec = build_model_spec(cfg, dims)
    rng = np.random.default_rng(13)
    B = cfg.train.batch_size
    batch = {
        "X_num": rng.normal(0, 1, (B, n_num)).astype(np.float32),
        "X_mask": np.zeros((B, n_num), np.float32),
        "X_cat": np.stack(
            [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
        ).astype(np.int32),
        "seq": rng.integers(0, cfg.model.seq_vocab, (B, cfg.sequence.max_len)).astype(np.int32),
        "y": (rng.random(B) < 0.3).astype(np.float32),
    }
    model = build_model(cfg, dims)
    tx, schedule = make_optimizer(cfg, 10)
    variables = model.init(
        jax.random.PRNGKey(0),
        {k: v for k, v in batch.items() if k != "y"}, deterministic=True,
    )
    state, mask = make_train_state(cfg, variables, tx)
    step = make_train_step(model, tx, cfg, jax.random.PRNGKey(1),
                           ema_mask=mask, schedule=schedule)
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))
