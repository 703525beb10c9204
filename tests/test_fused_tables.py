"""Fused (V, 2D) sequence-table layout (model.fused_seq_tables).

The att/rep pair stored lane-fused must be numerically IDENTICAL to the
reference-shaped split tables — same forward, same sparse training
trajectory (per-half AdaGrad accumulators), same pad-row semantics —
while using one gather/scatter for both tables (the TPU point: a row is
exactly one 128-lane tile at D=64, so XLA never relayouts the table;
scripts/tpu_layout_probe.py measurements in docs/DESIGN.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.config import Config
from tossctr_tpu.models import build_model_spec
from tossctr_tpu.models.ctr_model import CTRModel


def _cfg(fused: bool, emb_opt="rowwise_adagrad", **extra_train):
    return Config.from_dict(
        {
            "data": {"cat_cols": ["c1"], "hash_buckets": {"c1": 13}},
            "sequence": {
                "max_len": 12, "top_k": 4, "recency_tau": 8,
                "query_mode": "S1", "query_key": "c1",
                "transformer_block": True,
                "tfm": {"n_layers": 1, "n_heads": 2, "ffn_hidden": 16,
                        "mha_dropout": 0.0, "ffn_dropout": 0.0},
            },
            "model": {
                "fused_seq_tables": fused,
                "emb_dim": 8, "seq_vocab": 40, "dare_dropout": 0.0,
                "use_pallas_attention": False,
                "cat_embedding_dims": {"c1": 4},
                "qnn_alpha": {"enabled": True, "feature_embed_dim": 4, "heads": 2,
                               "rank": 3, "proj_dim": 6, "mlp_hidden": [16],
                               "dropout": 0.0, "use_se": False,
                               "aux_head_weight": 0.1},
            },
            "train": {"batch_size": 6, "epochs": 1,
                      "embedding_optimizer": emb_opt,
                      "grad_clip_norm": 0.5, "lr": 0.02, "warmup_epochs": 0,
                      **extra_train},
            "ema": {"enabled": True, "decay": 0.9},
        }
    )


def _batch(cfg, B=6):
    rng = np.random.default_rng(3)
    seq = rng.integers(1, cfg.model.seq_vocab, (B, cfg.sequence.max_len)).astype(np.int32)
    seq[:, :4] = 0
    seq[1, :] = 0  # fully padded row
    return {
        "X_num": rng.normal(0, 1, (B, 3)).astype(np.float32),
        "X_mask": np.zeros((B, 3), np.float32),
        "X_cat": rng.integers(0, 13, (B, 1)).astype(np.int32),
        "seq": seq,
        "y": (rng.random(B) < 0.5).astype(np.float32),
    }


def _fuse_params(split_variables):
    """Split init -> identical fused init (concat att||rep lane-wise)."""
    import copy

    # drop the split model's perturbation variables (att_rows/rep_rows);
    # the fused model declares its own ("table_rows")
    v = {k: x for k, x in split_variables.items() if k != "perturbations"}
    top = dict(v["params"])
    dare = dict(top["dare"])
    att = dare.pop("emb_att")
    rep = dare.pop("emb_rep")
    dare["emb_tables"] = jnp.concatenate([att, rep], axis=1)
    top["dare"] = dare
    return {**v, "params": top}


def test_fused_forward_matches_split():
    cfg_s, cfg_f = _cfg(False), _cfg(True)
    batch = _batch(cfg_s)
    fb = {k: v for k, v in batch.items() if k != "y"}
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": cfg_s.sequence.max_len}
    m_s = CTRModel(spec=build_model_spec(cfg_s, dims))
    m_f = CTRModel(spec=build_model_spec(cfg_f, dims))
    vs = m_s.init(jax.random.PRNGKey(0), fb, deterministic=True)
    vf = _fuse_params(vs)
    z_s, p_s, a_s = m_s.apply(vs, fb, deterministic=True)
    z_f, p_f, a_f = m_f.apply(vf, fb, deterministic=True)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_f), atol=1e-6)


@pytest.mark.parametrize("emb_opt", ["rowwise_adagrad", "sparse_sgd"])
@pytest.mark.parametrize("exact_dedup", [False, True])
def test_fused_sparse_training_matches_split(emb_opt, exact_dedup):
    """Same init, same batches: the fused sparse trajectory must equal
    the split trajectory — losses and table halves bit-for-bit close."""
    if emb_opt == "sparse_sgd" and exact_dedup:
        pytest.skip("dedup applies to rowwise_adagrad only")
    from tossctr_tpu.train.trainer import (
        make_optimizer, make_train_state, make_train_step,
    )

    extra = {"extra": {"exact_dedup": exact_dedup}} if exact_dedup else {}
    cfgs = {False: _cfg(False, emb_opt, **extra), True: _cfg(True, emb_opt, **extra)}
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": 12}
    batch = _batch(cfgs[False])
    fb = {k: v for k, v in batch.items() if k != "y"}

    results = {}
    vs = None
    for fused in (False, True):
        cfg = cfgs[fused]
        model = CTRModel(
            spec=build_model_spec(cfg, dims), sparse_tables=True,
        )
        tx, schedule = make_optimizer(cfg, steps_per_epoch=5)
        if not fused:
            # host snapshot: the train step donates state buffers, and the
            # fused variant must start from the SAME values afterwards
            vs = jax.device_get(model.init(jax.random.PRNGKey(0), fb, deterministic=True))
            variables = jax.tree_util.tree_map(jnp.asarray, vs)
        else:
            variables = jax.tree_util.tree_map(jnp.asarray, _fuse_params(vs))
        state, mask = make_train_state(cfg, variables, tx)
        step = make_train_step(
            model, tx, cfg, jax.random.PRNGKey(1), ema_mask=mask, schedule=schedule
        )
        losses = []
        for _ in range(5):
            state, loss = step(state, batch)
            losses.append(float(loss))
        results[fused] = (losses, state)

    l_s, st_s = results[False]
    l_f, st_f = results[True]
    np.testing.assert_allclose(l_s, l_f, rtol=1e-5)
    fused_tbl = np.asarray(st_f.params["params"]["dare"]["emb_tables"])
    att_s = np.asarray(st_s.params["params"]["dare"]["emb_att"])
    rep_s = np.asarray(st_s.params["params"]["dare"]["emb_rep"])
    D = att_s.shape[1]
    np.testing.assert_allclose(fused_tbl[:, :D], att_s, atol=1e-5)
    np.testing.assert_allclose(fused_tbl[:, D:], rep_s, atol=1e-5)
    if emb_opt == "rowwise_adagrad":
        acc_f = np.asarray(st_f.table_opt["emb_tables"].accum)
        assert acc_f.shape == (40, 2)
        np.testing.assert_allclose(
            acc_f[:, 0], np.asarray(st_s.table_opt["emb_att"].accum), atol=1e-6
        )
        np.testing.assert_allclose(
            acc_f[:, 1], np.asarray(st_s.table_opt["emb_rep"].accum), atol=1e-6
        )


def test_fused_dense_adamw_matches_split():
    """AdamW is elementwise, so dense-mode fused == split exactly."""
    from tossctr_tpu.train.trainer import (
        make_optimizer, make_train_state, make_train_step,
    )

    cfgs = {f: _cfg(f, emb_opt="adamw") for f in (False, True)}
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": 12}
    batch = _batch(cfgs[False])
    fb = {k: v for k, v in batch.items() if k != "y"}
    out = {}
    vs = None
    for fused in (False, True):
        cfg = cfgs[fused]
        model = CTRModel(spec=build_model_spec(cfg, dims), sparse_tables=False)
        tx, schedule = make_optimizer(cfg, steps_per_epoch=5)
        if not fused:
            vs = jax.device_get(model.init(jax.random.PRNGKey(0), fb, deterministic=True))
            variables = jax.tree_util.tree_map(jnp.asarray, vs)
        else:
            variables = jax.tree_util.tree_map(jnp.asarray, _fuse_params(vs))
        state, mask = make_train_state(cfg, variables, tx)
        step = make_train_step(
            model, tx, cfg, jax.random.PRNGKey(1), ema_mask=mask, schedule=schedule
        )
        for _ in range(3):
            state, loss = step(state, batch)
        out[fused] = (float(loss), state)
    assert abs(out[False][0] - out[True][0]) < 1e-5
    tbl = np.asarray(out[True][1].params["params"]["dare"]["emb_tables"])
    att = np.asarray(out[False][1].params["params"]["dare"]["emb_att"])
    np.testing.assert_allclose(tbl[:, :8], att, atol=1e-5)


def test_fused_ema_mask_excludes_table():
    from tossctr_tpu.train.trainer import ema_filter_for

    cfg = _cfg(True)
    assert "emb_tables" in ema_filter_for(cfg)


def test_fused_streaming_select_consistent():
    """select_chunk composes with fused tables."""
    cfg_f = _cfg(True)
    dims = {"X_num": 3, "X_mask": 3, "X_cat": 1, "seq_len": 12}
    batch = _batch(cfg_f)
    fb = {k: v for k, v in batch.items() if k != "y"}
    m = CTRModel(spec=build_model_spec(cfg_f, dims))
    v = m.init(jax.random.PRNGKey(0), fb, deterministic=True)
    z0, _, _ = m.apply(v, fb, deterministic=True)

    cfg_c = _cfg(True)
    cfg_c.sequence.select_chunk = 5
    mc = CTRModel(spec=build_model_spec(cfg_c, dims))
    z1, _, _ = mc.apply(v, fb, deterministic=True)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)
