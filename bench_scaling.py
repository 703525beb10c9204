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


def exchange_bytes(cfg, data_axis: int, model_axis: int, exchange: str) -> dict:
    """Analytic per-device ICI bytes per step for the two sharded-lookup
    exchanges (forward; backward doubles the activation streams).

    psum (mask-gather-psum): each model shard produces the full local
    activation block and reduces it over the 'model' axis — bytes are
    independent of model-axis size (the scalable-at-small-m form).
    a2a (id exchange): ids are bucketed with a static worst-case pad of
    the full local id count per destination, so bytes grow with m —
    but only id+row payloads move, no dense reduction.
    """
    B = cfg.train.batch_size
    L = cfg.sequence.max_len
    K = min(cfg.sequence.top_k, L)
    D = cfg.model.emb_dim
    tb = 2 if str(cfg.model.table_dtype).startswith("bf") else 4
    m = model_axis
    if m <= 1:
        return {"exchange": exchange, "ici_bytes_per_device": 0}
    lookups = L + 2 * K  # scoring pass + att/rep K-row recompute
    if exchange == "psum":
        b_local = B // data_axis
        # ring all-reduce of the (b_local, lookups, D) block: 2*(m-1)/m
        bytes_dev = int(2 * (m - 1) / m * b_local * lookups * D * tb)
    else:
        n_local = (B // (data_axis * m)) * lookups
        # send ids (m*n ints) + receive rows (m*n*D) + reverse leg
        bytes_dev = int(m * n_local * (4 + D * tb) * 2)
    # ---- sparse-update gradient return (mesh.grad_exchange) ----
    # row width W = 2D for the lane-fused table; fp32 after local dedup
    W = 2 * D
    item = 4 + W * 4
    # allgather: every device receives the GLOBAL per-occurrence
    # (ids, grads) stream — grads still in the bf16 cotangent dtype
    grad_allgather = int(B * K * (4 + W * 2))
    # a2a (cap_factor c=2): the all_to_all moves c*n_local_upd items
    # per device, the data-axis all_gather of the filtered buckets
    # receives c*B*K/m items — fp32 deduped payloads, so the win over
    # the bf16 all-gather is ~m/4 (break-even near model=4)
    c = 2.0
    n_upd = B * K // (data_axis * m)
    grad_a2a = int(c * n_upd * item + c * B * K / m * item)
    return {
        "exchange": exchange,
        "ici_bytes_per_device": bytes_dev,
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
