"""Scaling bench: examples/sec + ms/step of the sharded train step
across mesh shapes (VERDICT r1 weak #7 / BASELINE.md north star:
>=85% examples/s scaling efficiency).

Runs the SAME production machinery as the train CLI — setup_sharded_state
+ make_train_step with pinned shardings — over a list of (data, model)
mesh shapes and reports, per shape: ms/step, examples/sec, scaling
efficiency vs the first shape, and a bytes-moved roofline estimate for
the dominant memory streams.  On this machine the multi-device meshes
are virtual CPU devices (xla_force_host_platform_device_count-style) so
the absolute numbers are not TPU numbers — the harness itself is
device-agnostic and runs unchanged on a real pod slice.

Usage:
  python bench_scaling.py --meshes 1x1,2x1,4x1,4x2,8x1 --preset tiny
  python bench_scaling.py --meshes 1x1 --preset flagship   # real chip
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_meshes(s):
    out = []
    for part in s.split(","):
        d, m = part.lower().split("x")
        out.append((int(d), int(m)))
    return out


def a2a_grad_cap(n_local: int, model_axis: int, cap_factor: float = 2.0) -> int:
    """The static bucket cap of the bucketed grad return — mirrors
    parallel/embedding.sharded_rowwise_adagrad_update_a2a exactly."""
    cap = -(-max(1, int(cap_factor * n_local)) // model_axis)
    return max(8, -(-cap // 8) * 8)


def exchange_bytes(cfg, data_axis: int, model_axis: int, exchange: str) -> dict:
    """Analytic per-device ICI bytes per step for the two sharded-lookup
    exchanges and the two sparse-grad returns.

    COMPILER-VERIFIED (VERDICT r4 #9 / tests/test_ici_bytes.py): every
    term below is asserted against the collectives XLA actually emits
    in the compiled sharded train step on an 8-virtual-device mesh.
    Three corrections vs the round-4 hand-math: (1) the fused (V, 2D)
    table moves 2D-wide rows for the scoring pass (the att half alone
    is not separable from the lane-fused layout), (2) the recompute leg
    is ONE K-row lookup of the fused table (not 2K D-wide lookups), and
    (3) there is NO backward a2a leg — table row-gradients exit through
    the perturbation trick and travel via ``grad_exchange``, so the
    old ``*2`` doubling was wrong.

    psum (mask-gather-psum): batch partitioned over 'data' only; each
    model shard reduces the full (B/d, rows, width) block — bytes are
    independent of m (ring factor 2(m-1)/m aside).
    a2a (id exchange): batch partitioned over BOTH axes; send ids +
    receive rows, bytes grow with m via the static worst-case pad.
    """
    B = cfg.train.batch_size
    L = cfg.sequence.max_len
    K = min(cfg.sequence.top_k, L)
    D = cfg.model.emb_dim
    tb = 2 if str(cfg.model.table_dtype).startswith("bf") else 4
    cot = 2 if cfg.amp in ("bf16", "fp16") else 4  # cotangent dtype
    fused = bool(cfg.model.fused_seq_tables)
    # hierarchical prefilter (sequence.select_proxy): the FULL-L scoring
    # leg gathers from the small REPLICATED proxy — no exchange — and
    # only the C2 candidate rows ride the sharded lookup.  A large ICI
    # win on top of the single-chip one: the exchanged row count drops
    # from L+K to C2+K per example (e.g. 400+60 -> 128+60 at flagship).
    proxy_c2 = 0
    if getattr(cfg.sequence, "select_proxy", False):
        proxy_c2 = min(int(cfg.sequence.select_proxy_candidates), L)
    score_rows = proxy_c2 if 0 < proxy_c2 < L else L
    score_w = (2 * D if fused else D) * tb   # bytes/row, scoring leg
    rec_ids = K if fused else 2 * K          # recompute lookup count
    rec_bytes = K * 2 * D * tb               # same total either layout
    m, d = model_axis, data_axis
    if m <= 1:
        return {"exchange": exchange, "ici_bytes_per_device": 0}
    if exchange == "psum":
        b = B // d
        blocks = b * (score_rows * score_w + rec_bytes)
        bytes_dev = int(2 * (m - 1) / m * blocks)
    else:
        b = B // (d * m)
        ids = b * (score_rows + rec_ids) * 4
        rows = b * (score_rows * score_w + rec_bytes)
        bytes_dev = int(m * (ids + rows))
    # ---- sparse-update gradient return (mesh.grad_exchange) ----
    # row width W = 2D lane-fused (split layout: D x 2 tables, same)
    W = 2 * D
    # allgather: every device receives the GLOBAL per-occurrence
    # (ids, grads) stream in the cotangent dtype via a data-axis
    # all-gather, plus a model-axis leg (B/d items) when the batch is
    # jointly partitioned (exchange=a2a)
    grad_allgather = int(B * K * (4 + W * cot))
    if exchange == "a2a":
        grad_allgather += int(B // d * K * (4 + W * cot))
    # a2a (cap_factor c=2): deduped fp32 payloads; the all_to_all moves
    # m*cap items, the data-axis all_gather of the filtered buckets
    # receives d*m*cap items.  Win over the all-gather form is
    # (m/c) * item_ag/item_a2a — compiler-counted m/2 at fp32
    # cotangents (break-even m=2) and ~m/4 at bf16 (break-even near
    # m=4); the published number a2a_win_x below is cfg-exact.
    item = 4 + W * 4
    cap = a2a_grad_cap(B * K // (d * m), m)
    grad_a2a = int(m * cap * item + d * m * cap * item)
    out_extra = {}
    if 0 < proxy_c2 < L:
        # per-step model-axis all-gather that replicates the block-mean
        # proxy (result bytes; trainer.build_model pins it replicated)
        C = cfg.model.seq_vocab // max(1, cfg.sequence.select_proxy_block)
        out_extra["proxy_build_allgather_bytes"] = int(C * D * tb)
    return {
        "exchange": exchange,
        "ici_bytes_per_device": bytes_dev,
        **out_extra,
        "grad_return_bytes_per_device": {
            "allgather": grad_allgather,
            "a2a": grad_a2a,
            "a2a_win_x": round(grad_allgather / max(1, grad_a2a), 2),
        },
    }


def roofline_bytes(cfg, n_num: int) -> dict:
    """Per-step bytes of the dominant memory streams (estimates)."""
    B = cfg.train.batch_size
    L = cfg.sequence.max_len
    K = min(cfg.sequence.top_k, L)
    D = cfg.model.emb_dim
    V = cfg.model.seq_vocab
    tb = 2 if str(cfg.model.table_dtype).startswith("bf") else 4
    sparse = cfg.train.embedding_optimizer in ("rowwise_adagrad", "sparse_sgd")
    streams = {
        # full-L att gather + K-row att/rep recompute gathers
        "select_gather": B * (L + 2 * K) * D * tb,
        # row updates: sweep = read+write both tables; dense = 3x param
        # stream (grad + read + write) on 2 tables
        "table_update": (4 * V * D * tb) if sparse else (6 * V * D * 4),
        "batch_io": B * (L * 4 + 2 * n_num * 4),
    }
    streams["total"] = sum(streams.values())
    return streams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="1x1,2x1,4x1,4x2,8x1")
    ap.add_argument("--preset", default="tiny", choices=["tiny", "flagship"])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--emb-opt", default="rowwise_adagrad")
    ap.add_argument("--exchange", default="psum", choices=["psum", "a2a", "both"],
                    help="sharded-lookup exchange(s) to bench on model>1 meshes")
    ap.add_argument("--tpu", action="store_true",
                    help="use the real accelerator backend (default: "
                         "virtual CPU devices sized to the largest mesh)")
    args = ap.parse_args()

    meshes = parse_meshes(args.meshes)
    max_dev = max(d * m for d, m in meshes)

    import jax

    if not args.tpu:
        # virtual CPU devices for mesh shapes beyond this host's chips;
        # must be pinned BEFORE the first backend touch
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(max_dev, 1))

    from __graft_entry__ import _batch_for, _flagship_cfg
    from tossctr_tpu.parallel.mesh import build_mesh
    from tossctr_tpu.parallel.sharding import batch_sharding
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_step, setup_sharded_state,
    )

    results = []
    runs = []
    for (dd, mm) in meshes:
        exchanges = ["psum"]
        if mm > 1:
            exchanges = ["psum", "a2a"] if args.exchange == "both" else [args.exchange]
        for ex in exchanges:
            runs.append((dd, mm, ex))
    for (dd, mm, exch) in runs:
        n = dd * mm
        devices = jax.devices()[:n]
        if len(devices) < n:
            print(f"# skip {dd}x{mm}: only {len(devices)} devices")
            continue
        mesh = build_mesh(data=dd, model=mm, devices=devices)
        cfg, n_num = _flagship_cfg(tiny=(args.preset == "tiny"))
        cfg.train.embedding_optimizer = args.emb_opt
        cfg.mesh.exchange = exch
        # global batch scales with the data axis (weak scaling: fixed
        # per-device batch, the pod-training regime)
        base_bs = cfg.train.batch_size
        cfg.train.batch_size = base_bs * dd
        dims = {"X_num": n_num, "X_mask": n_num,
                "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
        model = build_model(cfg, dims, mesh=mesh)
        batch = _batch_for(cfg, n_num, cfg.train.batch_size, with_labels=True)

        tx, schedule = make_optimizer(cfg, steps_per_epoch=100)
        state, ema_mask, s_sh, _ = setup_sharded_state(
            cfg, model, tx, {k: v for k, v in batch.items() if k != "y"},
            jax.random.PRNGKey(0), mesh,
        )
        step = make_train_step(
            model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
            schedule=schedule, state_sharding=s_sh, mesh=mesh,
        )
        batch_dev = batch_sharding(mesh)(batch)

        t0 = time.time()
        state, loss = step(state, batch_dev)
        float(loss)  # hard sync: block_until_ready is unreliable on the tunnel backend
        compile_s = time.time() - t0
        for _ in range(args.warmup):
            state, loss = step(state, batch_dev)
        float(loss)  # hard sync
        t0 = time.time()
        for _ in range(args.steps):
            state, loss = step(state, batch_dev)
        float(loss)  # hard sync
        dt = time.time() - t0
        ms = dt / args.steps * 1e3
        eps = args.steps * cfg.train.batch_size / dt
        results.append({
            "mesh": f"{dd}x{mm}", "devices": n, "batch": cfg.train.batch_size,
            "ms_per_step": round(ms, 2), "eps": round(eps, 1),
            "eps_per_device": round(eps / n, 1),
            "compile_s": round(compile_s, 1),
            "loss": round(float(loss), 4),
            **exchange_bytes(cfg, dd, mm, exch),
        })
        print(f"# {dd}x{mm} [{exch}]: {ms:.1f} ms/step  {eps:,.0f} eps "
              f"({eps / n:,.0f}/device)  compile {compile_s:.0f}s  "
              f"ici={results[-1]['ici_bytes_per_device'] / 1e6:.1f} MB/dev/step")

    if results:
        base = results[0]
        for r in results:
            # weak-scaling efficiency: per-device throughput vs the
            # first (reference) mesh shape
            r["scaling_efficiency"] = round(
                r["eps_per_device"] / base["eps_per_device"], 4
            )
        cfg, n_num = _flagship_cfg(tiny=(args.preset == "tiny"))
        roof = roofline_bytes(cfg, n_num)
        print(json.dumps({
            "metric": "scaling",
            "preset": args.preset,
            "results": results,
            "roofline_bytes_per_step_1dev": roof,
        }))


if __name__ == "__main__":
    main()
