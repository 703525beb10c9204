import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from tossctr_tpu.train.checkpoint import (
    fold_ckpt_exists,
    list_fold_checkpoints,
    load_fold_checkpoint,
    load_train_state,
    save_fold_checkpoint,
    save_train_state,
)


def _params():
    return {
        "params": {
            "dense": {"kernel": jnp.arange(6.0).reshape(2, 3)},
            "dare": {"emb_att": jnp.ones((5, 2))},
        }
    }


def test_fold_checkpoint_roundtrip(tmp_path):
    p = _params()
    d = save_fold_checkpoint(
        str(tmp_path), 0, params=p, cfg_dict={"exp_name": "t", "seed": 1},
        best_score=0.42, epoch=3, global_step=100,
        ema_shadow=jax.tree_util.tree_map(lambda x: x * 2, p),
        calibrator=None,
    )
    assert fold_ckpt_exists(str(tmp_path), 0)
    assert not fold_ckpt_exists(str(tmp_path), 1)
    ck = load_fold_checkpoint(d)
    assert ck["score"] == 0.42 and ck["epoch"] == 3 and ck["global_step"] == 100
    assert ck["cfg"]["exp_name"] == "t"
    np.testing.assert_allclose(
        ck["params"]["params"]["dense"]["kernel"], np.arange(6.0).reshape(2, 3)
    )
    np.testing.assert_allclose(ck["ema"]["params"]["dare"]["emb_att"], 2 * np.ones((5, 2)))


def test_fold_checkpoint_incomplete_not_listed(tmp_path):
    save_fold_checkpoint(
        str(tmp_path), 0, params=_params(), cfg_dict={}, best_score=0.1,
        epoch=1, global_step=1,
    )
    save_fold_checkpoint(
        str(tmp_path), 2, params=_params(), cfg_dict={}, best_score=0.2,
        epoch=1, global_step=1,
    )
    # simulate a crashed write: dir exists, meta.json missing
    os.makedirs(os.path.join(str(tmp_path), "ckpt_folds_1"))
    dirs = list_fold_checkpoints(str(tmp_path))
    assert [os.path.basename(d) for d in dirs] == ["ckpt_folds_0", "ckpt_folds_2"]


def test_step_state_roundtrip(tmp_path):
    """Step-granularity resume (params+opt+ema+step), SURVEY §5."""
    import optax

    p = _params()
    tx = optax.adam(1e-3)
    opt = tx.init(p)
    state = {
        "params": p,
        "opt_state": opt,
        "step": jnp.asarray(17),
        "epoch": 2,
    }
    path = str(tmp_path / "step_state.msgpack")
    save_train_state(path, step_state=state)
    # perturb then restore
    target = {
        "params": jax.tree_util.tree_map(jnp.zeros_like, p),
        "opt_state": tx.init(p),
        "step": jnp.asarray(0),
        "epoch": 0,
    }
    restored = load_train_state(path, target)
    assert int(restored["step"]) == 17 and restored["epoch"] == 2
    np.testing.assert_allclose(
        restored["params"]["params"]["dare"]["emb_att"], np.ones((5, 2))
    )
    # optimizer state trees survive structurally
    chex_leaves = jax.tree_util.tree_leaves(restored["opt_state"])
    assert len(chex_leaves) == len(jax.tree_util.tree_leaves(opt))


def test_infer_multi_fold_ensemble(tmp_path):
    """Two fold checkpoints -> logit_mean / val_weighted ensembling paths."""
    import yaml

    from tossctr_tpu.config import Config
    from tossctr_tpu.data.dataset import ShardCache
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.data.synth import write_synth_train_test
    from tossctr_tpu.infer.predict import predict_ensemble
    from tossctr_tpu.train.trainer import train_main

    root = str(tmp_path)
    write_synth_train_test(root, n_train=3000, n_test=500, seed=11)
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
    d["train"].update(batch_size=512, epochs=1)
    d["sequence"].update(max_len=16, top_k=4)
    d["model"].update(emb_dim=16)
    d["model"]["qnn_alpha"]["mlp_hidden"] = [32]
    cfg = Config.from_dict(d)
    build_train_and_test(cfg)
    exp_dir = train_main(cfg)
    # duplicate fold 0 as fold 1 with a different score
    import json

    src = os.path.join(exp_dir, "ckpt_folds_0")
    dst = os.path.join(exp_dir, "ckpt_folds_1")
    shutil.copytree(src, dst)
    meta = json.load(open(os.path.join(dst, "meta.json")))
    meta["score"] = meta["score"] + 0.1
    json.dump(meta, open(os.path.join(dst, "meta.json"), "w"))

    cache = ShardCache(os.path.join(cfg.data.cache_dir, "test", "manifest.json"))
    out = predict_ensemble(cfg, cache)  # logit_mean over 2 folds
    assert out["probs"].shape == (500,)
    assert np.isfinite(out["probs"]).all()

    cfg.ensemble.method = "val_weighted"
    out2 = predict_ensemble(cfg, cache)
    assert np.isfinite(out2["probs"]).all()
    # identical params in both folds -> ensembles equal single model
    assert np.allclose(out["probs"], out2["probs"], atol=1e-5)


def test_load_migrates_pre_round2_norm_names(tmp_path):
    """Checkpoints written before the norms got explicit names
    (RMSNorm_0/RMSNorm_1 -> norm1/norm2) must still load; the rename
    applies only inside encoder-layer scopes (those with an 'mha'
    sibling), never to QNN's auto-named pre-norm."""
    import numpy as np
    from tossctr_tpu.train.checkpoint import load_pytree, save_pytree

    new_style = {
        "dare": {
            "layer_0": {
                "mha": {"qkv": {"kernel": np.ones((4, 12), np.float32)}},
                "norm1": {"w": np.full((4,), 2.0, np.float32)},
                "norm2": {"w": np.full((4,), 3.0, np.float32)},
            }
        },
        "qnn": {"RMSNorm_0": {"w": np.full((4,), 5.0, np.float32)}},
    }
    # simulate the old on-disk layout
    old_style = {
        "dare": {
            "layer_0": {
                "mha": new_style["dare"]["layer_0"]["mha"],
                "RMSNorm_0": new_style["dare"]["layer_0"]["norm1"],
                "RMSNorm_1": new_style["dare"]["layer_0"]["norm2"],
            }
        },
        "qnn": new_style["qnn"],
    }
    p = str(tmp_path / "params.msgpack")
    save_pytree(p, old_style)
    restored = load_pytree(p, new_style)
    assert np.allclose(restored["dare"]["layer_0"]["norm1"]["w"], 2.0)
    assert np.allclose(restored["dare"]["layer_0"]["norm2"]["w"], 3.0)
    assert np.allclose(restored["qnn"]["RMSNorm_0"]["w"], 5.0)
