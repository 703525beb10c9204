"""In-fold (epoch-granular) resume — capability the reference lacks."""

import json
import os

import numpy as np
import pytest
import yaml

from tossctr_tpu.config import Config
from tossctr_tpu.data.etl import build_train_and_test
from tossctr_tpu.data.synth import write_synth_train_test


def _cfg(root, epochs):
    with open(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "synth_small.yaml")
    ) as f:
        d = yaml.safe_load(f)
    d["data"].update(
        train_path=os.path.join(root, "train.parquet"),
        test_path=os.path.join(root, "test.parquet"),
        cache_dir=os.path.join(root, "cache"),
    )
    d["logging"].update(log_dir=os.path.join(root, "runs"), tb=False)
    d["train"].update(batch_size=512, epochs=epochs, step_checkpointing=True)
    d["sequence"].update(max_len=16, top_k=4)
    d["model"].update(emb_dim=16)
    d["model"]["qnn_alpha"]["mlp_hidden"] = [32]
    return Config.from_dict(d)


def test_in_fold_resume(tmp_path, monkeypatch):
    root = str(tmp_path)
    write_synth_train_test(root, n_train=3000, n_test=300, seed=13)
    cfg1 = _cfg(root, epochs=1)
    build_train_and_test(cfg1)

    from tossctr_tpu.train import trainer

    # keep the epoch-state file around (simulate a crash after epoch 1:
    # the completion cleanup never runs)
    real_remove = trainer.os.remove
    monkeypatch.setattr(trainer.os, "remove", lambda p: None)
    trainer.train_main(cfg1)
    state_path = os.path.join(cfg1.exp_dir(), "fold_0_state.msgpack")
    assert os.path.exists(state_path)
    # drop the completion marker so the fold is considered unfinished
    meta_path = os.path.join(cfg1.exp_dir(), "ckpt_folds_0", "meta.json")
    real_remove(meta_path)
    monkeypatch.setattr(trainer.os, "remove", real_remove)

    # resume with a larger epoch budget: must continue at epoch 2
    cfg2 = _cfg(root, epochs=3)
    rows = []
    orig_row = trainer.Logger.row
    monkeypatch.setattr(trainer.Logger, "row", lambda self, **kw: rows.append(kw))
    trainer.train_main(cfg2)
    monkeypatch.setattr(trainer.Logger, "row", orig_row)

    resume_rows = [r for r in rows if r.get("split") == "resume"]
    assert resume_rows and resume_rows[0]["epoch"] == 2
    val_epochs = [r["epoch"] for r in rows if r.get("split") == "val"]
    assert val_epochs == [2, 3]  # epoch 1 not re-run
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["epoch"] >= 1 and np.isfinite(meta["score"])
    assert not os.path.exists(state_path)  # cleaned up on completion
