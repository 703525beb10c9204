"""Pod-scale state drill (VERDICT r2 #4 'Done' criterion).

Runs the pod_scale_stretch table size — a 100M-row, (100M, 128) bf16
fused sequence table, 25.6 GB — through the FULL state lifecycle on the
8-virtual-device mesh (4 data x 2 model):

    sharded init -> train (row-sparse updates) -> sharded fold
    checkpoint (shard-by-shard, no full-table host pull) -> restore
    into mesh shardings -> sharded inference -> submission.csv

and logs peak host RSS, per-device table bytes, checkpoint size, and
phase timings.  Sequence/batch shapes are kept small (the drill proves
STATE handling at scale, not step speed); the table is full-size.

Usage:  python scripts/pod_scale_drill.py [--vocab 100000000] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual devices timeshare this host's few cores; XLA:CPU's default
# 20 s / 40 s collective-rendezvous timeouts fire spuriously when a
# device thread is starved mid-epoch at the 25.6 GB table size (the
# thread arrives, just late).  Must be set before the first jax import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_collective_timeout_seconds" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_timeout_seconds=3600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def dir_gb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=100_000_000)
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--out", default="/tmp/pod_drill")
    ap.add_argument("--keep", action="store_true")
    # On the virtual-CPU mesh every data-axis replica is a REAL host-RAM
    # copy of the table (real pods replicate across distinct HBMs), so
    # the full-size drill runs model=8/data=1: one copy of the 25.6 GB
    # table, sharded 8 ways.  Smaller vocabs default to the 4x2 mesh.
    ap.add_argument("--mesh-data", type=int, default=None)
    ap.add_argument("--mesh-model", type=int, default=None)
    ap.add_argument("--rss-budget-gb", type=float, default=None,
                    help="assert peak host RSS stays below this")
    ap.add_argument("--device", action="store_true",
                    help="run on the REAL chip (mesh 1x1) and record "
                         "jax.local_devices()[0].memory_stats() per phase "
                         "(VERDICT r4 #7: ground the donation-aliasing "
                         "claim with device, not host, peak bytes). "
                         "Pair with --vocab 10000000 on a single v5e.")
    args = ap.parse_args()
    if args.device:
        args.mesh_model = args.mesh_data = 1
    if args.mesh_model is None:
        args.mesh_model = 8 if args.vocab >= 50_000_000 else 2
    if args.mesh_data is None:
        args.mesh_data = 8 // args.mesh_model

    import jax

    if not args.device:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    else:
        from tossctr_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    def dev_mem() -> dict:
        try:
            st = jax.local_devices()[0].memory_stats() or {}
            return {
                "bytes_in_use_gb": round(st.get("bytes_in_use", 0) / 1e9, 3),
                "peak_bytes_in_use_gb": round(
                    st.get("peak_bytes_in_use", 0) / 1e9, 3),
            }
        except Exception as e:  # noqa: BLE001 — backend may not expose stats
            return {"unavailable": str(e)[:120]}

    from tossctr_tpu.config import Config
    from tossctr_tpu.data.etl import build_train_and_test
    from tossctr_tpu.data.synth import write_synth_train_test
    from tossctr_tpu.infer.predict import infer_main
    from tossctr_tpu.train.trainer import train_main

    log = {"vocab": args.vocab, "phases": {}}

    t0 = time.time()
    root = args.out
    # the drill must exercise the FULL lifecycle: a leftover fold
    # checkpoint from an aborted run would fold-skip the train phase
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    write_synth_train_test(root, n_train=args.rows, n_test=2_000, seed=7)
    cfg = Config.from_dict(
        {
            "exp_name": "pod_drill",
            "seed": 777,
            "amp": "none",
            "data": {
                "train_path": os.path.join(root, "train.parquet"),
                "test_path": os.path.join(root, "test.parquet"),
                "cache_dir": os.path.join(root, "cache"),
                "cat_cols": ["gender", "age_group", "inventory_id",
                             "day_of_week", "hour"],
                "hash_buckets": {"inventory_id": 1009, "gender": 11,
                                 "age_group": 13, "day_of_week": 11, "hour": 29},
                "num_patterns": ["feat_*", "history_*"],
                "shard_rows": 10_000,
            },
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
                      "embedding_optimizer": "rowwise_adagrad",
                      "early_stop_patience": 99},
            "ema": {"enabled": False},
            "calibration": {"enabled": False},
            "cv": {"n_splits": 1, "group_key": "inventory_id"},
            "mesh": {"data": args.mesh_data, "model": args.mesh_model},
            "eval": {"device_metrics": False},
            "logging": {"log_dir": os.path.join(root, "runs"), "tb": False},
        }
    )
    build_train_and_test(cfg)
    log["phases"]["etl_s"] = round(time.time() - t0, 1)
    log["rss_gb_after_etl"] = round(rss_gb(), 2)

    if args.device:
        log["device_mem_after_etl"] = dev_mem()
    t0 = time.time()
    exp_dir = train_main(cfg)
    log["phases"]["train_s"] = round(time.time() - t0, 1)
    log["rss_gb_after_train"] = round(rss_gb(), 2)
    if args.device:
        log["device_mem_after_train"] = dev_mem()
    # free train-side device buffers (virtual CPU devices ARE host RAM)
    # before inference restores its own copy of the table
    import gc

    gc.collect()
    try:
        import jax as _jax

        _jax.clear_caches()
    except Exception:  # noqa: BLE001
        pass
    gc.collect()

    ckpt = os.path.join(exp_dir, "ckpt_folds_0")
    sharded_idx = os.path.join(ckpt, "params", "index.json")
    if os.path.exists(sharded_idx):
        with open(sharded_idx) as f:
            idx = json.load(f)
        tbl = next(v for k, v in idx.items() if "emb_tables" in k)
        log["table"] = {
            "shape": tbl["shape"], "dtype": tbl["dtype"],
            "global_gb": round(tbl["shape"][0] * tbl["shape"][1] * 2 / 1e9, 2),
            "shard_rows": tbl["rows"],
            "per_device_gb": round(
                (tbl["rows"][0][1] - tbl["rows"][0][0]) * tbl["shape"][1] * 2 / 1e9, 2
            ),
        }
        log["checkpoint_format"] = "sharded"
    else:
        # mesh 1x1 (--device): the plain single-payload format is the
        # correct one — record it; multi-device meshes must still use
        # the sharded payload
        assert args.mesh_model * args.mesh_data == 1, (
            "fold checkpoint must use the sharded payload on a real mesh"
        )
        log["table"] = {
            "shape": [args.vocab, 128], "dtype": "bfloat16",
            "global_gb": round(args.vocab * 128 * 2 / 1e9, 2),
        }
        log["checkpoint_format"] = "plain-msgpack (mesh 1x1)"
    log["checkpoint_gb"] = round(dir_gb(ckpt), 2)

    t0 = time.time()
    sub = infer_main(cfg)
    log["phases"]["infer_s"] = round(time.time() - t0, 1)
    log["rss_gb_peak"] = round(rss_gb(), 2)
    if args.device:
        log["device_mem_after_infer"] = dev_mem()
    with open(sub) as f:
        n_lines = sum(1 for _ in f)
    log["submission_rows"] = n_lines - 1
    assert n_lines == 2_001, n_lines

    log["mesh"] = {"data": args.mesh_data, "model": args.mesh_model}
    if args.rss_budget_gb:
        log["rss_budget_gb"] = args.rss_budget_gb
        log["rss_within_budget"] = bool(
            log["rss_gb_peak"] <= args.rss_budget_gb
        )
    print(json.dumps(log, indent=2))
    out_json = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs",
        "POD_DRILL_DEVICE.json" if args.device else "POD_DRILL.json",
    )
    with open(out_json, "w") as f:
        json.dump(log, f, indent=2)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print(f"# wrote {out_json}")
    if args.rss_budget_gb:
        assert log["rss_within_budget"], (
            f"peak RSS {log['rss_gb_peak']} GB exceeds the "
            f"{args.rss_budget_gb} GB budget"
        )


if __name__ == "__main__":
    main()
