"""Per-op device traces of the two rowwise-adagrad paths + an honest
scatter-set measurement (the earlier chained scatter-set hit a fixed
point and was memoized by the tunnel at 0.05 ms).

Emits top ops per variant so we can see what the exact_dedup path's
66 ms actually consists of, and whether sorted+unique scatter-SET is
near-DMA-speed in context.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.train.sparse_embed import (
        RowwiseAdagradState, rowwise_adagrad_update,
    )
    from tossctr_tpu.utils.trace import find_trace_file, load_device_events

    V, W = 10_000_000, 128
    B, K = 8192, 60
    N = B * K
    rng = np.random.default_rng(0)

    table = jax.random.normal(jax.random.PRNGKey(0), (V, W), jnp.bfloat16) * 0.01
    jax.block_until_ready(table)
    accum = jnp.zeros((V, 2), jnp.float32)
    ids = jnp.asarray(rng.integers(1, V, N).astype(np.int32))
    g = jnp.asarray(rng.normal(0, 1e-3, (N, W)).astype(np.float32)).astype(jnp.bfloat16)

    def trace(name, step, state, iters=8):
        state = step(state)
        jax.block_until_ready(state)
        tdir = f"/tmp/upd_trace_{name}"
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                state = step(state)
            jax.block_until_ready(state)
        tp = find_trace_file(tdir)
        evs = load_device_events(tp)
        agg = {}
        for e in evs:
            nm = e.get("name", "?")
            a = e.get("args", {})
            key = (str(a.get("hlo_category", "")), nm)
            agg[key] = agg.get(key, 0.0) + e.get("dur", 0.0)
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
        tot = sum(v for _, v in agg.items()) / 1000 / iters
        print(f"--- {name}: total device {tot:.2f} ms/iter")
        for (cat, nm), us in rows:
            print(f"  {us/1000/iters:7.2f} ms [{cat}] {nm}", flush=True)
        return state

    for exact in (False, True):
        @jax.jit
        def step(st, exact=exact):
            t, a = st
            t2, s2 = rowwise_adagrad_update(
                t, RowwiseAdagradState(accum=a), ids, g,
                lr=1e-3, pad_row=0, exact_dedup=exact, halves=2,
            )
            return (t2, s2.accum)

        trace("exact" if exact else "default", step, (table, accum))

    # honest scatter-set: update values vary with a carried counter so
    # no (program, input) pair ever repeats
    uids = jnp.asarray(np.sort(rng.choice(V, N, replace=False)).astype(np.int32))

    @jax.jit
    def sc_set(st):
        t, i = st
        vals = (g.astype(jnp.float32) * (1.0 + i * 1e-6)).astype(t.dtype)
        return (t.at[uids].set(vals, indices_are_sorted=True,
                               unique_indices=True), i + 1)

    trace("set_sorted_unique", sc_set, (table, jnp.float32(0)))

    @jax.jit
    def sc_add_sorted(st):
        t, i = st
        vals = (g.astype(jnp.float32) * (1.0 + i * 1e-6)).astype(t.dtype)
        return (t.at[uids].add(vals, indices_are_sorted=True,
                               unique_indices=True), i + 1)

    trace("add_sorted_unique", sc_add_sorted, (table, jnp.float32(0)))


if __name__ == "__main__":
    main()
