"""Golden-path integration: synth parquet -> ETL -> train -> infer ->
submission (SURVEY.md §4b; BASELINE.json configs[0-2] at toy scale)."""

import os

import numpy as np
import pytest
import yaml

from tossctr_tpu.config import Config
from tossctr_tpu.data.etl import build_train_and_test
from tossctr_tpu.data.synth import write_synth_train_test


def _small_cfg(root: str) -> Config:
    with open(os.path.join(os.path.dirname(__file__), "..", "cfgs", "synth_small.yaml")) as f:
        d = yaml.safe_load(f)
    d["data"]["train_path"] = os.path.join(root, "train.parquet")
    d["data"]["test_path"] = os.path.join(root, "test.parquet")
    d["data"]["cache_dir"] = os.path.join(root, "cache")
    d["logging"]["log_dir"] = os.path.join(root, "runs")
    d["logging"]["tb"] = False
    d["train"]["batch_size"] = 512
    d["train"]["epochs"] = 2
    d["sequence"]["max_len"] = 32
    d["sequence"]["top_k"] = 8
    d["model"]["emb_dim"] = 16
    d["model"]["qnn_alpha"]["mlp_hidden"] = [64, 32]
    return Config.from_dict(d)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    write_synth_train_test(root, n_train=6000, n_test=1200, seed=3)
    cfg = _small_cfg(root)
    build_train_and_test(cfg)
    from tossctr_tpu.train.trainer import train_main

    exp_dir = train_main(cfg)
    return cfg, exp_dir


def test_training_learns_signal(trained):
    cfg, exp_dir = trained
    import csv

    with open(os.path.join(exp_dir, "train_log.csv")) as f:
        rows = [r for r in csv.DictReader(f) if r["split"] == "val"]
    assert len(rows) == 2
    ap_last = float(rows[-1]["AP"])
    # planted signal: AP must beat the positive-rate baseline clearly
    assert ap_last > 0.11, ap_last
    losses = [float(r["loss"]) for r in rows]
    assert losses[-1] < losses[0]


def test_checkpoint_contract(trained):
    cfg, exp_dir = trained
    from tossctr_tpu.train.checkpoint import list_fold_checkpoints, load_fold_checkpoint

    dirs = list_fold_checkpoints(exp_dir)
    assert len(dirs) == 1  # n_splits: 1 -> fold 0 only of a 5-way split
    ckpt = load_fold_checkpoint(dirs[0])
    assert ckpt["epoch"] >= 1 and ckpt["global_step"] > 0
    assert ckpt["cfg"]["exp_name"] == cfg.exp_name  # self-describing
    assert ckpt["ema"] is not None  # ema enabled in config
    assert ckpt["calibrator"] is not None
    assert "params" in ckpt["params"]  # flax variables dict


def test_fold_skip_resume(trained, capsys):
    cfg, exp_dir = trained
    from tossctr_tpu.train.trainer import train_main

    out = train_main(cfg)  # must skip instantly
    assert out == exp_dir


def test_infer_submission(trained):
    cfg, exp_dir = trained
    from tossctr_tpu.infer.predict import infer_main

    sub = infer_main(cfg)
    with open(sub) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "ID,clicked"
    assert len(lines) == 1201
    ids, ps = [], []
    for ln in lines[1:]:
        i, p = ln.split(",")
        ids.append(i)
        ps.append(float(p))
    assert ids[0].startswith("TEST_")
    assert len(set(ids)) == 1200  # unique, all rows covered
    ps = np.asarray(ps)
    assert (ps > 0).all() and (ps < 1).all()
    assert ps.std() > 1e-4  # not constant


def test_infer_deterministic(trained):
    cfg, exp_dir = trained
    from tossctr_tpu.data.dataset import ShardCache
    from tossctr_tpu.infer.predict import predict_ensemble

    cache = ShardCache(os.path.join(cfg.data.cache_dir, "test", "manifest.json"))
    a = predict_ensemble(cfg, cache)
    b = predict_ensemble(cfg, cache)
    assert np.array_equal(a["probs"], b["probs"])


def test_flagship_combo_end_to_end(tmp_path_factory):
    """The production TPU configuration — fused (V,2D) tables, sparse
    rowwise-adagrad with exact dedup, pallas attention (qkv-fused) and
    the fused block tail — through ETL -> train -> infer on CPU
    (kernels auto-interpret).  Guards the full flagship path, not just
    its pieces."""
    root = str(tmp_path_factory.mktemp("e2e_flagship"))
    write_synth_train_test(root, n_train=3000, n_test=600, seed=11)
    cfg = _small_cfg(root)
    cfg.train.epochs = 1
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.train.extra["exact_dedup"] = True
    cfg.model.fused_seq_tables = True
    cfg.model.use_pallas_attention = True
    cfg.model.use_pallas_ffn = True
    build_train_and_test(cfg)
    from tossctr_tpu.infer.predict import infer_main
    from tossctr_tpu.train.trainer import train_main

    exp_dir = train_main(cfg)
    assert os.path.exists(os.path.join(exp_dir, "ckpt_folds_0", "meta.json"))
    sub = infer_main(cfg)
    with open(sub) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "ID,clicked"
    assert len(lines) == 601
    ps = np.asarray([float(ln.split(",")[1]) for ln in lines[1:]])
    assert np.isfinite(ps).all() and (ps > 0).all() and (ps < 1).all()
