"""Compiler memory analysis of the flagship train step (VERDICT r4 #7).

The axon tunnel device returns no allocator stats
(`memory_stats() == {}` — docs/POD_DRILL_DEVICE.json), so the
donation-aliasing claim is grounded with the compiler's own
accounting: `compiled.memory_analysis()` reports argument / output /
temp / alias bytes for the EXACT program the chip runs.  Donation
aliasing holds iff alias bytes ~= the donated state size (the output
state reuses the input buffers, so peak device memory is
state + temps + batch, NOT 2x state).

Usage: python exp/step_memory_analysis.py [--select-proxy/--no-select-proxy]
Writes docs/STEP_MEMORY.json.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--select-proxy", action=argparse.BooleanOptionalAction,
                    default=True)
    args_in = ap.parse_args()

    import jax

    from tossctr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import bench as bench_mod
    from tossctr_tpu.train.trainer import (
        build_model, jitted_init, make_optimizer, make_train_state,
        make_train_step,
    )

    args = argparse.Namespace(
        batch=8192, vocab=10_000_000, seq_len=400, top_k=60, num_feats=82,
        amp="bf16", emb_opt="rowwise_adagrad", ema_tables=False, rng="rbg",
        exact_dedup=False, table_dtype="bfloat16", attn_impl="packed",
        select_proxy=args_in.select_proxy, select_proxy_candidates=128,
    )
    cfg = bench_mod.build_cfg(args)
    n_num = args.num_feats
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    rng = np.random.default_rng(0)
    batch = bench_mod.synth_batch(cfg, n_num, rng)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=1000)
    init_batch = {k: v[:256] for k, v in batch.items() if k != "y"}
    variables = jitted_init(model, jax.random.PRNGKey(0), init_batch)
    state, ema_mask = make_train_state(cfg, variables, tx)
    step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
        schedule=schedule,
    )
    compiled = step.lower(state, jax.device_put(batch)).compile()
    ma = compiled.memory_analysis()
    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(state)
    )
    batch_bytes = sum(v.nbytes for v in batch.values())
    rec = {
        "select_proxy": bool(args_in.select_proxy),
        "state_gb": round(state_bytes / 1e9, 3),
        "batch_mb": round(batch_bytes / 1e6, 1),
        "argument_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "output_gb": round(ma.output_size_in_bytes / 1e9, 3),
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        "peak_live_gb_upper": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             - ma.alias_size_in_bytes + ma.temp_size_in_bytes) / 1e9, 3),
        "generated_code_mb": round(
            ma.generated_code_size_in_bytes / 1e6, 1),
        "note": (
            "alias bytes ~= output state size proves donation aliasing: "
            "the new state reuses the old state's buffers, so live "
            "device bytes = args + temps, not 2x state"
        ),
    }
    out = os.path.join(REPO, "docs", "STEP_MEMORY.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec, indent=2))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
