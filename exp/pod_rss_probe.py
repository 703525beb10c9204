"""Bisect the pod-drill host-RSS spike (VERDICT r3 weak #6: 16.76 GB
peak at a 0.51 GB table on the 8-virtual-device mesh).

Phases marked: backend init / model+optimizer build / sharded state init
/ train-step compile+run / sharded checkpoint write / restore.
Run:  python exp/pod_rss_probe.py [--vocab 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss():
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=2_000_000)
    ap.add_argument("--mesh-data", type=int, default=4)
    ap.add_argument("--mesh-model", type=int, default=2)
    ap.add_argument("--out", default="/tmp/pod_rss_probe")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np

    from tossctr_tpu.config import Config
    from tossctr_tpu.parallel.mesh import build_mesh_from_cfg
    from tossctr_tpu.parallel.sharding import batch_sharding
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_step, setup_sharded_state,
    )

    marks = {"import": rss()}
    cfg = Config.from_dict(
        {
            "exp_name": "pod_rss_probe",
            "seed": 777,
            "amp": "none",
            "data": {"cat_cols": ["gender", "inventory_id"],
                     "hash_buckets": {"gender": 11, "inventory_id": 1009}},
            "sequence": {"max_len": 64, "top_k": 16, "recency_tau": 512,
                         "query_mode": "S1", "query_key": "inventory_id",
                         "transformer_block": True,
                         "tfm": {"n_layers": 2, "n_heads": 4, "ffn_hidden": 128}},
            "model": {"emb_dim": 64, "seq_vocab": args.vocab,
                      "table_dtype": "bfloat16",
                      "qnn_alpha": {"enabled": True, "heads": 2, "rank": 4,
                                    "proj_dim": 32, "mlp_hidden": [64, 32],
                                    "aux_head_weight": 0.15}},
            "train": {"batch_size": 512, "epochs": 1, "lr": 5e-4,
                      "warmup_epochs": 1, "grad_clip_norm": 0.5,
                      "embedding_optimizer": "rowwise_adagrad"},
            "ema": {"enabled": False},
            "cv": {"n_splits": 1, "group_key": "inventory_id"},
            "mesh": {"data": args.mesh_data, "model": args.mesh_model},
        }
    )
    mesh = build_mesh_from_cfg(cfg)
    n_num = 6
    dims = {"X_num": n_num, "X_mask": n_num, "X_cat": 2, "seq_len": 64}
    model = build_model(cfg, dims, mesh=mesh)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=10)
    marks["build"] = rss()

    rng = np.random.default_rng(0)
    B = cfg.train.batch_size
    batch = {
        "X_num": rng.normal(0, 1, (B, n_num)).astype(np.float32),
        "X_mask": (rng.random((B, n_num)) < 0.2).astype(np.float32),
        "X_cat": np.stack([rng.integers(0, 11, B), rng.integers(0, 1009, B)], 1).astype(np.int32),
        "seq": rng.integers(0, cfg.model.seq_vocab, (B, 64)).astype(np.int32),
        "y": (rng.random(B) < 0.1).astype(np.float32),
    }
    t0 = time.time()
    state, ema_mask, s_sh, _ = setup_sharded_state(
        cfg, model, tx, {k: v for k, v in batch.items() if k != "y"},
        jax.random.PRNGKey(0), mesh,
    )
    jax.block_until_ready(state.params)
    marks["state_init"] = rss()
    marks["state_init_s"] = round(time.time() - t0, 1)

    step = make_train_step(model, tx, cfg, jax.random.PRNGKey(1),
                           ema_mask=ema_mask, schedule=schedule,
                           state_sharding=s_sh, mesh=mesh)
    bshard = batch_sharding(mesh)
    t0 = time.time()
    state, loss = step(state, bshard(batch))
    print("loss", float(loss))
    marks["first_step"] = rss()
    marks["first_step_s"] = round(time.time() - t0, 1)

    state, loss = step(state, bshard(batch))
    float(loss)
    marks["second_step"] = rss()

    from tossctr_tpu.train.checkpoint import save_fold_checkpoint
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    save_fold_checkpoint(
        args.out, 0,
        params=state.params, cfg_dict={},
        best_score=0.0, epoch=1, global_step=2,
    )
    marks["ckpt"] = rss()
    marks["ckpt_s"] = round(time.time() - t0, 1)
    print(json.dumps(marks, indent=2))


if __name__ == "__main__":
    main()
