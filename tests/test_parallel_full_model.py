"""Full-CTRModel multi-device parity (SURVEY.md §4d, VERDICT r1 #3).

Trains the flagship model (tiny shapes) for several steps on a
1-device mesh and on the 8-virtual-device (4 data x 2 model) mesh —
same seeds, same batches — through the PRODUCTION path
(setup_sharded_state + make_train_step with pinned shardings), and
asserts the loss trajectories and final parameters agree to float
tolerance, in BOTH table modes (dense AdamW and row-sparse AdaGrad).

Also runs `train_main` end-to-end on a `mesh: {data: 4, model: 2}`
config, proving the real CLI entry point trains sharded.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N_STEPS = 6


def _make_batches(cfg, n_num, n_steps):
    from __graft_entry__ import _batch_for

    rng_seed = 0
    batches = []
    for s in range(n_steps):
        b = _batch_for(cfg, n_num, cfg.train.batch_size, with_labels=True)
        # vary batches across steps deterministically
        r = np.random.default_rng(100 + s)
        b["y"] = (r.random(cfg.train.batch_size) < 0.1).astype(np.float32)
        b["seq"] = r.integers(
            0, cfg.model.seq_vocab, b["seq"].shape
        ).astype(np.int32)
        b["seq"][:, : b["seq"].shape[1] // 4] = 0
        batches.append(b)
    return batches


def _run(n_devices, model_axis, sparse, batches, exchange="psum",
         cat_sharding="replicate", grad_exchange=None):
    from __graft_entry__ import _flagship_cfg
    from tossctr_tpu.parallel.mesh import build_mesh
    from tossctr_tpu.parallel.sharding import batch_sharding
    from tossctr_tpu.train.trainer import (
        build_model,
        make_optimizer,
        make_train_step,
        setup_sharded_state,
    )

    cfg, n_num = _flagship_cfg(tiny=True)
    if sparse:
        cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.mesh.exchange = exchange
    cfg.mesh.cat_sharding = cat_sharding
    if grad_exchange:
        cfg.mesh.grad_exchange = grad_exchange
    devices = jax.devices()[:n_devices]
    mesh = build_mesh(data=n_devices // model_axis, model=model_axis, devices=devices)
    dims = {
        "X_num": n_num,
        "X_mask": n_num,
        "X_cat": len(cfg.data.cat_cols),
        "seq_len": cfg.sequence.max_len,
    }
    model = build_model(cfg, dims, mesh=mesh)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=10)
    sample = {k: v for k, v in batches[0].items() if k != "y"}
    state, ema_mask, s_sh, _ = setup_sharded_state(
        cfg, model, tx, sample, jax.random.PRNGKey(0), mesh
    )
    step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
        schedule=schedule, state_sharding=s_sh, mesh=mesh,
    )
    bshard = batch_sharding(mesh)
    losses = []
    for b in batches:
        state, loss = step(state, bshard(dict(b)))
        losses.append(float(loss))
    params = jax.device_get(state.params)
    return losses, params


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_full_model_1dev_vs_8dev_parity(sparse):
    from __graft_entry__ import _flagship_cfg

    cfg, n_num = _flagship_cfg(tiny=True)
    batches = _make_batches(cfg, n_num, N_STEPS)

    losses_1, params_1 = _run(1, 1, sparse, batches)
    losses_8, params_8 = _run(8, 2, sparse, batches)

    assert np.allclose(losses_1, losses_8, atol=5e-4), (losses_1, losses_8)
    flat_1 = jax.tree_util.tree_leaves(params_1)
    flat_8 = jax.tree_util.tree_leaves(params_8)
    for a, b in zip(flat_1, flat_8):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


@pytest.mark.parametrize("model_axis", [2, 4])
@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_full_model_a2a_exchange_parity(sparse, model_axis):
    """mesh.exchange: a2a — the DLRM-style id-exchange lookup routed
    through config (VERDICT r2 #3) must produce the same training
    trajectory as the 1-device program, at model=2 AND model=4."""
    from __graft_entry__ import _flagship_cfg

    cfg, n_num = _flagship_cfg(tiny=True)
    batches = _make_batches(cfg, n_num, 3)

    losses_1, params_1 = _run(1, 1, sparse, batches)
    # grad_exchange="a2a": the bucketed gradient return (an explicit
    # opt-in) must hold the same 1-device trajectory parity as the
    # default all-gather form
    losses_8, params_8 = _run(8, model_axis, sparse, batches, exchange="a2a",
                              grad_exchange="a2a" if sparse else None)

    assert np.allclose(losses_1, losses_8, atol=5e-4), (losses_1, losses_8)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_cat_table_row_sharded_exchange_parity():
    """mesh.cat_sharding: row — grouped cat tables row-sharded with the
    explicit psum exchange (VERDICT r2 weak #7): same trajectory as the
    1-device program, and the tables actually live P('model', None)."""
    from __graft_entry__ import _flagship_cfg
    from jax.sharding import PartitionSpec as P

    cfg, n_num = _flagship_cfg(tiny=True)
    batches = _make_batches(cfg, n_num, 3)

    losses_1, params_1 = _run(1, 1, True, batches)
    losses_8, params_8 = _run(8, 2, True, batches, cat_sharding="row")
    assert np.allclose(losses_1, losses_8, atol=5e-4), (losses_1, losses_8)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_cat_table_sharding_specs():
    """Default replicate: cat tables P(); row mode: P('model', None)."""
    from __graft_entry__ import _flagship_cfg
    from jax.sharding import PartitionSpec as P
    from tossctr_tpu.parallel.mesh import build_mesh
    from tossctr_tpu.parallel.sharding import param_shardings
    from tossctr_tpu.train.trainer import build_model, make_optimizer

    cfg, n_num = _flagship_cfg(tiny=True)
    mesh = build_mesh(data=4, model=2)
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims, mesh=mesh)
    b = _make_batches(cfg, n_num, 1)[0]
    params = jax.eval_shape(
        lambda k: model.init(k, {kk: vv for kk, vv in b.items() if kk != "y"},
                             deterministic=True),
        jax.random.PRNGKey(0),
    )
    for shard_cat, want in [(False, P()), (True, P("model", None))]:
        sh = param_shardings(mesh, params["params"], shard_cat_tables=shard_cat)
        cat = sh["cat_embed"]
        specs = {k: v.spec for k, v in cat.items() if k.startswith("table_")}
        assert specs and all(s == want for s in specs.values()), (shard_cat, specs)


def test_cat_row_sharding_rejects_indivisible_rows():
    from __graft_entry__ import _flagship_cfg
    from tossctr_tpu.parallel.mesh import build_mesh
    from tossctr_tpu.train.trainer import build_model

    cfg, n_num = _flagship_cfg(tiny=True)
    cfg.data.hash_buckets["gender"] = 17  # group rows become odd
    cfg.mesh.cat_sharding = "row"
    mesh = build_mesh(data=4, model=2)
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    with pytest.raises(ValueError, match="divisible"):
        build_model(cfg, dims, mesh=mesh)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_train_main_sharded_end_to_end(tmp_path, sparse):
    """`python -m tossctr_tpu.train` semantics on a 4x2 mesh: the real
    entry point must train sharded, write a valid fold checkpoint, and
    log finite metrics."""
    import yaml

    from tossctr_tpu.config import Config
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.data.synth import write_synth_train_test
    from tossctr_tpu.train.checkpoint import list_fold_checkpoints
    from tossctr_tpu.train.trainer import train_main

    root = str(tmp_path)
    write_synth_train_test(root, n_train=3000, n_test=500, seed=5)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "synth_small.yaml")
    ) as f:
        d = yaml.safe_load(f)
    d["exp_name"] = f"mesh42_{'sparse' if sparse else 'dense'}"
    d["data"]["train_path"] = os.path.join(root, "train.parquet")
    d["data"]["test_path"] = os.path.join(root, "test.parquet")
    d["data"]["cache_dir"] = os.path.join(root, "cache")
    d["logging"]["log_dir"] = os.path.join(root, "runs")
    d["logging"]["tb"] = False
    d["train"]["batch_size"] = 256
    d["train"]["epochs"] = 1
    d["sequence"]["max_len"] = 32
    d["sequence"]["top_k"] = 8
    d["model"]["emb_dim"] = 16
    d["model"]["qnn_alpha"]["mlp_hidden"] = [32, 16]
    d["mesh"] = {"data": 4, "model": 2}
    if sparse:
        d["train"]["embedding_optimizer"] = "rowwise_adagrad"
    cfg = Config.from_dict(d)
    build_train_and_test(cfg)
    exp_dir = train_main(cfg)
    ckpts = list_fold_checkpoints(exp_dir)
    assert len(ckpts) == 1, ckpts
    import csv

    with open(os.path.join(exp_dir, "train_log.csv")) as f:
        rows = [r for r in csv.DictReader(f) if r["split"] == "val"]
    assert rows and np.isfinite(float(rows[-1]["Score"]))

    # pod-scale state contract (VERDICT r2 #4): the row-sharded tables
    # were saved shard-by-shard (sharded payload, no legacy msgpack) ...
    assert os.path.exists(os.path.join(ckpts[0], "params", "index.json"))
    assert not os.path.exists(os.path.join(ckpts[0], "params.msgpack"))
    with open(os.path.join(ckpts[0], "params", "index.json")) as f:
        idx = json.load(f)
    tbl_entries = [v for k, v in idx.items() if "emb_tables" in k or "emb_att" in k]
    assert tbl_entries and all(e["kind"] == "sharded" for e in tbl_entries)

    # ... and inference restores them INTO the mesh and ensembles
    from tossctr_tpu.infer.predict import infer_main

    sub = infer_main(cfg)
    with open(sub) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "ID,clicked" and len(lines) == 501
    probs = np.array([float(ln.split(",")[1]) for ln in lines[1:]])
    assert np.isfinite(probs).all() and (probs > 0).all() and (probs < 1).all()


def test_batch_size_mesh_divisibility_error(tmp_path):
    from __graft_entry__ import _flagship_cfg
    from tossctr_tpu.train.trainer import train_one_fold
    from tossctr_tpu.parallel.mesh import build_mesh

    cfg, _ = _flagship_cfg(tiny=True)
    cfg.train.batch_size = 30  # not divisible by 4
    mesh = build_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="not divisible"):
        train_one_fold(cfg, 0, np.arange(10), np.arange(10), "none", None, mesh=mesh)


def test_a2a_grad_drop_counter_reaches_train_logs(tmp_path):
    """VERDICT r4 #5 'Done' bar: bucket-overflow gradient drops must be
    visible through the PRODUCTION train loop — a forced-overflow
    cap_factor must surface as a console warn row and drain the host
    rider counter (not only fire inside the update fn)."""
    import yaml

    from tossctr_tpu.config import Config
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.data.synth import write_synth_train_test
    from tossctr_tpu.train.trainer import train_one_fold
    from tossctr_tpu.utils.log import Logger, riders

    root = str(tmp_path)
    write_synth_train_test(root, n_train=2000, n_test=200, seed=11)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "synth_small.yaml")
    ) as f:
        d = yaml.safe_load(f)
    d["exp_name"] = "a2a_drop_counter"
    d["data"]["train_path"] = os.path.join(root, "train.parquet")
    d["data"]["test_path"] = os.path.join(root, "test.parquet")
    d["data"]["cache_dir"] = os.path.join(root, "cache")
    d["logging"] = {"log_dir": os.path.join(root, "runs"), "tb": False}
    d["train"]["batch_size"] = 256
    d["train"]["epochs"] = 1
    d["train"]["embedding_optimizer"] = "rowwise_adagrad"
    d["sequence"]["max_len"] = 32
    d["sequence"]["top_k"] = 8
    d["model"]["emb_dim"] = 16
    d["model"]["qnn_alpha"]["mlp_hidden"] = [32, 16]
    d["calibration"] = {"enabled": False}
    d["mesh"] = {"data": 4, "model": 2, "exchange": "a2a",
                 "grad_exchange": "a2a",
                 # far below the safe 2.0 -> guaranteed bucket overflow
                 "extra": {"a2a_grad_cap_factor": 0.05}}
    with pytest.warns(UserWarning, match="a2a_grad_dropped"):
        cfg = Config.from_dict(d)

    manifest, _ = build_train_and_test(cfg)
    rows = []

    class CapturingLogger(Logger):
        def row(self, **kw):
            rows.append(kw)
            super().row(**kw)

    logger = CapturingLogger(os.path.join(root, "runs", "cap"), tb=False)
    n = 2000
    idx = np.arange(n)
    train_one_fold(cfg, 0, idx[: int(n * 0.8)], idx[int(n * 0.8):],
                   manifest, logger, mesh=None)
    warns = [r for r in rows if "a2a grad return dropped" in str(r.get("warn", ""))]
    assert warns, rows
    # the loop drained the counter
    assert riders.read_and_reset("a2a_grad_dropped") == 0
