import glob
import os

import pytest

from tossctr_tpu.config import Config, load_config

REF_CFG_DIR = "/root/reference/cfgs"


def test_defaults_roundtrip():
    cfg = Config()
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.train.batch_size == cfg.train.batch_size
    assert cfg2.sequence.tfm.n_heads == cfg.sequence.tfm.n_heads


def test_from_dict_sections():
    cfg = Config.from_dict(
        {
            "exp_name": "t",
            "seed": 1,
            "data": {"cat_cols": ["a", "b"], "hash_buckets": {"a": 100}},
            "sequence": {"top_k": 10, "query_key": "a", "tfm": {"n_layers": 1}},
            "model": {"emb_dim": 16, "qnn_alpha": {"heads": 2}},
            "train": {"batch_size": 32, "epochs": 1},
            "unknown_section": {"x": 1},
        }
    )
    assert cfg.data.bucket_for("a") == 100
    assert cfg.data.bucket_for("zzz") == 1_000_003
    assert cfg.sequence.tfm.n_layers == 1
    assert cfg.model.qnn_alpha.heads == 2
    assert cfg.extra["unknown_section"] == {"x": 1}


def test_bucket_margin():
    cfg = Config.from_dict(
        {"data": {"hash_buckets": {"a": 100}, "hash_buckets_margin": 500}}
    )
    assert cfg.data.bucket_for("a") == 600


def test_validation_rejects_bad_query_mode():
    with pytest.raises(ValueError):
        Config.from_dict({"sequence": {"query_mode": "S9"}})


def test_validation_rejects_missing_query_key():
    with pytest.raises(ValueError):
        Config.from_dict(
            {"data": {"cat_cols": ["a"]}, "sequence": {"query_mode": "S1", "query_key": "b"}}
        )


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR), reason="reference configs not mounted")
def test_reference_configs_load_unchanged():
    """Every reference experiment YAML must parse into the typed schema."""
    paths = sorted(glob.glob(os.path.join(REF_CFG_DIR, "*.yaml")))
    loaded = 0
    for p in paths:
        if "column_suggestions" in p:
            continue  # schema-report output, not an experiment config
        cfg = load_config(p)
        assert cfg.train.batch_size > 0
        assert cfg.sequence.top_k > 0
        loaded += 1
    assert loaded >= 10


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR), reason="reference configs not mounted")
def test_reference_configs_build_model_specs():
    """Beyond parsing: every reference experiment config must resolve into
    a valid ModelSpec (cat grouping, block slices, qnn wiring)."""
    from tossctr_tpu.models import build_model_spec

    paths = sorted(glob.glob(os.path.join(REF_CFG_DIR, "*.yaml")))
    built = 0
    for p in paths:
        if "column_suggestions" in p:
            continue
        cfg = load_config(p)
        dims = {"X_num": 81, "X_mask": 81, "X_cat": len(cfg.data.cat_cols),
                "seq_len": cfg.sequence.max_len}
        spec = build_model_spec(cfg, dims)
        assert spec.n_feat == 1 + 81 + 81 + len(cfg.data.cat_cols)
        assert sum(len(g.cols) for g in spec.cat_groups) == len(cfg.data.cat_cols)
        # block slices tile the feature range exactly
        ends = sorted(e for _, e in spec.block_slices.values())
        assert ends[-1] == spec.n_feat
        if spec.query_mode in ("S1", "concat"):
            assert spec.query_key in spec.cat_cols
        built += 1
    assert built >= 10
