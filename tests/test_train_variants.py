"""Training-loop variants: balanced sampler, covis features, extra
losses, competition score formula (BASELINE.json configs[3] shapes)."""

import os

import numpy as np
import pytest
import yaml

from tossctr_tpu.config import Config
from tossctr_tpu.data.synth import write_synth_train_test


def _base_cfg(root, **over):
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

    def deep(dd, u):
        for k, v in u.items():
            if isinstance(v, dict) and isinstance(dd.get(k), dict):
                deep(dd[k], v)
            else:
                dd[k] = v

    deep(d, over)
    return Config.from_dict(d)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("variants"))
    write_synth_train_test(root, n_train=4000, n_test=400, seed=31)
    return root


def test_balanced_sampler_training(data_root):
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.train.trainer import train_main

    cfg = _base_cfg(
        data_root,
        exp_name="bal",
        sampler={"type": "balanced", "pos_fraction": 0.5},
    )
    build_train_and_test(cfg)
    exp_dir = train_main(cfg)
    assert os.path.exists(os.path.join(exp_dir, "ckpt_folds_0", "meta.json"))
    # balanced batches halve the effective train set per epoch but the
    # loss should be near ln(2) scale (50:50 batches), not the base rate
    import csv

    with open(os.path.join(exp_dir, "train_log.csv")) as f:
        rows = [r for r in csv.DictReader(f) if r["split"] == "val"]
    assert 0.3 < float(rows[-1]["loss"]) < 1.2


def test_covis_to_training_chain(data_root):
    """BASELINE configs[3]: covis features -> cache join -> training."""
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.features.covis import CovisConfig, build_covis_features
    from tossctr_tpu.train.trainer import train_main

    cfg = _base_cfg(data_root, exp_name="covis_train")
    cfg.data.cache_dir = os.path.join(data_root, "cache_covis")
    ccfg = CovisConfig(
        targets=["inventory_id"], seq_top_k=8, n_folds=5,
        group_key="inventory_id", time_key="day_of_week", composite_group=True,
        out_dir=os.path.join(data_root, "covis"),
    )
    build_covis_features(cfg.data.train_path, cfg.data.test_path, ccfg)
    cfg.features = {"covis": {"out_dir": ccfg.out_dir}}
    build_train_and_test(cfg)
    import json

    man = json.load(open(os.path.join(cfg.data.cache_dir, "train", "manifest.json")))
    assert any(c.startswith("covis_") for c in man["num_cols"])
    exp_dir = train_main(cfg)
    assert os.path.exists(os.path.join(exp_dir, "ckpt_folds_0", "meta.json"))


def test_extra_losses_step(data_root):
    """loss.apply_extra_losses wires pairwise-AUC + logit-L2 into the step."""
    import jax

    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    cfg = _base_cfg(data_root, exp_name="xloss")
    cfg.loss = {
        "apply_extra_losses": True,
        "lambda_rank": 0.3,
        "lambda_logit_l2": 0.01,
        "num_neg_per_pos": 4,
    }
    rng = np.random.default_rng(0)
    B = 64
    batch = {
        "X_num": rng.normal(0, 1, (B, 5)).astype(np.float32),
        "X_mask": np.zeros((B, 5), np.float32),
        "X_cat": np.stack(
            [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
        ).astype(np.int32),
        "seq": rng.integers(1, cfg.model.seq_vocab, (B, 16)).astype(np.int32),
        "y": (rng.random(B) < 0.3).astype(np.float32),
    }
    dims = {"X_num": 5, "X_mask": 5, "X_cat": len(cfg.data.cat_cols), "seq_len": 16}
    model = build_model(cfg, dims)
    tx, schedule = make_optimizer(cfg, 10)
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), {k: v for k, v in batch.items() if k != "y"}, deterministic=True)
    # the first step donates its state (aliasing variables' buffers);
    # keep an independent copy for the second model
    variables2 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
    state, mask = make_train_state(cfg, variables, tx)
    step = make_train_step(model, tx, cfg, jax.random.PRNGKey(1), ema_mask=mask, schedule=schedule)
    state, loss_with = step(state, batch)

    cfg2 = _base_cfg(data_root, exp_name="xloss2")
    model2 = build_model(cfg2, dims)
    tx2, schedule2 = make_optimizer(cfg2, 10)
    state2, mask2 = make_train_state(cfg2, variables2, tx2)
    step2 = make_train_step(model2, tx2, cfg2, jax.random.PRNGKey(1), ema_mask=mask2, schedule=schedule2)
    state2, loss_without = step2(state2, batch)
    assert float(loss_with) > float(loss_without)  # extra penalties add


def test_competition_score_formula(data_root):
    from tossctr_tpu.eval.metrics import final_score

    y = np.array([1, 0, 1, 0, 0, 0])
    p = np.array([0.8, 0.2, 0.7, 0.3, 0.1, 0.4])
    ap, wll, s_ref = final_score(y, p, formula="reference")
    _, _, s_comp = final_score(y, p, formula="competition")
    assert abs(s_ref - (0.5 * ap + 0.5 * wll)) < 1e-12
    assert abs(s_comp - (0.5 * ap + 0.5 / (1 + wll))) < 1e-12

def test_sweep_table_update_matches_scatter(data_root):
    """train.table_update: sweep (Pallas, interpret on CPU) must produce
    the same training trajectory as the XLA scatter path."""
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    rng = np.random.default_rng(5)
    B = 64
    states, losses = [], []
    for mode in ("sweep", "scatter"):
        cfg = _base_cfg(
            data_root,
            exp_name=f"tupd_{mode}",
            train={"embedding_optimizer": "rowwise_adagrad",
                   "extra": {"table_update": mode}},
        )
        batch = {
            "X_num": rng.normal(0, 1, (B, 5)).astype(np.float32),
            "X_mask": np.zeros((B, 5), np.float32),
            "X_cat": np.stack(
                [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
            ).astype(np.int32),
            "seq": rng.integers(0, cfg.model.seq_vocab, (B, 16)).astype(np.int32),
            "y": (rng.random(B) < 0.3).astype(np.float32),
        }
        rng = np.random.default_rng(5)  # same batches for both modes
        dims = {"X_num": 5, "X_mask": 5, "X_cat": len(cfg.data.cat_cols), "seq_len": 16}
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
        ls = []
        for _ in range(3):
            state, loss = step(state, batch)
            ls.append(float(loss))
        states.append(state)
        losses.append(ls)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    d0, d1 = (s.params["params"]["dare"] for s in states)
    ta0 = d0.get("emb_tables", d0.get("emb_att"))
    ta1 = d1.get("emb_tables", d1.get("emb_att"))
    np.testing.assert_allclose(np.asarray(ta0), np.asarray(ta1), atol=1e-5)


def test_sweep_with_exact_dedup_raises(data_root):
    """table_update 'sweep' implements the streaming scatter-add path;
    combining it with exact_dedup must fail loudly instead of silently
    ignoring the sweep kernel."""
    import jax
    import pytest

    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    cfg = _base_cfg(data_root, exp_name="sweepconflict")
    cfg.train.embedding_optimizer = "rowwise_adagrad"  # sparse mode
    cfg.train.extra["table_update"] = "sweep"
    cfg.train.extra["exact_dedup"] = True
    cfg.model.sparse_tables = True
    dims = {"X_num": 5, "X_mask": 5, "X_cat": len(cfg.data.cat_cols),
            "seq_len": 16}
    model = build_model(cfg, dims)
    tx, schedule = make_optimizer(cfg, 10)
    batch = {
        "X_num": np.zeros((8, 5), np.float32),
        "X_mask": np.zeros((8, 5), np.float32),
        "X_cat": np.zeros((8, len(cfg.data.cat_cols)), np.int32),
        "seq": np.ones((8, 16), np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    state, mask = make_train_state(cfg, variables, tx)
    with pytest.raises(ValueError, match="incompatible"):
        make_train_step(model, tx, cfg, jax.random.PRNGKey(1),
                        ema_mask=mask, schedule=schedule)
