"""Where do the 478 cold-compile seconds go? (VERDICT r3 #4)

Phases timed separately on the flagship bench program:
  * trace+lower of the train step (host-side, backend-independent)
  * XLA+Mosaic compile of the lowered module (remote_compile helper)
  * model.init execution (its own compile + run)
plus a census of the custom calls in the lowered HLO: how many Mosaic
kernels the module contains and how many are DISTINCT payloads —
identical payloads should hit the Mosaic compile cache.

Run: python exp/compile_time_probe.py [--fresh] (--fresh clears the
persistent XLA cache first so the compile is genuinely cold).
"""

from __future__ import annotations

import argparse
import collections
import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--skip-exec", action="store_true",
                    help="lower+compile only (no init/step execution)")
    args = ap.parse_args()

    if args.fresh:
        shutil.rmtree(os.path.expanduser("~/.cache/tossctr_jax"),
                      ignore_errors=True)

    import jax

    from tossctr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as benchmod

    class A:
        batch = 8192; vocab = 10_000_000; seq_len = 400; top_k = 60
        num_feats = 82; amp = "bf16"; emb_opt = "rowwise_adagrad"
        ema_tables = False; rng = "rbg"; exact_dedup = True
        table_dtype = "bfloat16"; attn_impl = "packed"

    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_state, make_train_step,
    )

    cfg = benchmod.build_cfg(A)
    n_num = A.num_feats
    dims = {"X_num": n_num, "X_mask": n_num, "X_cat": len(cfg.data.cat_cols),
            "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    rng = np.random.default_rng(0)
    batch = benchmod.synth_batch(cfg, n_num, rng)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=1000)

    t0 = time.time()
    init_batch = {k: v[:256] for k, v in batch.items() if k != "y"}
    variables = jax.eval_shape(
        lambda k: model.init(k, init_batch, deterministic=True),
        jax.random.PRNGKey(0),
    )
    print(f"init eval_shape: {time.time()-t0:.1f}s", flush=True)

    if not args.skip_exec:
        t0 = time.time()
        variables = model.init(jax.random.PRNGKey(0), init_batch,
                               deterministic=True)
        jax.block_until_ready(variables)
        print(f"init exec: {time.time()-t0:.1f}s", flush=True)

    state_shape_only = args.skip_exec
    state, ema_mask = make_train_state(cfg, variables, tx) if not state_shape_only else (None, None)
    if state_shape_only:
        return

    train_step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
        schedule=schedule,
    )
    batch_dev = jax.device_put(batch)

    t0 = time.time()
    lowered = train_step.lower(state, batch_dev)
    t_lower = time.time() - t0
    print(f"trace+lower: {t_lower:.1f}s", flush=True)

    # custom-call census on the lowered stablehlo
    txt = lowered.as_text()
    calls = collections.Counter()
    payloads = collections.Counter()
    for line in txt.splitlines():
        if "stablehlo.custom_call" in line or "mhlo.custom_call" in line:
            # crude name extraction
            name = "?"
            if "call_target_name" in line:
                seg = line.split("call_target_name")[1]
                name = seg.split('"')[1] if '"' in seg else "?"
            calls[name] += 1
            payloads[hashlib.md5(line.encode()).hexdigest()[:12]] += 1
    print(f"custom calls: {sum(calls.values())} total, "
          f"{len(payloads)} distinct payload lines", flush=True)
    for name, cnt in calls.most_common(12):
        print(f"  {cnt:3d} x {name}", flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"backend compile: {t_compile:.1f}s", flush=True)

    t0 = time.time()
    state2, loss = compiled(state, batch_dev)
    print(f"step1 exec: {time.time()-t0:.1f}s loss={float(loss):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
