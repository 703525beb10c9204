"""TPU probe: rowwise-adagrad update-path variants at flagship shapes.

The round-2 trace bills table_update at 55.4 ms/step: 35.3 ms for the
(V,128) bf16 row scatter-add + 20.0 ms for the (V,2) f32 accumulator
scatter-add (ids identical, both per-row latency-bound).  Candidates:

  A. default no-sort path (2 scatter-adds + 1 gather)   [shipping]
  B. exact_dedup path (sort + segment ops + 2 sorted/unique
     scatter-SETs) — does indices_are_sorted+unique make XLA's row
     scatter cheap enough to pay for the sort?
  C. raw jnp.sort / argsort of the 491k int32 ids (the dedup tax)
  D. single scatter-add alone, sorted vs unsorted ids (does
     indices_are_sorted help at all?)

All timings chained (state feeds the next call) — unchained timings
through the axon tunnel are memoized and meaningless.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.train.sparse_embed import (
        RowwiseAdagradState, rowwise_adagrad_update,
    )

    V, W = 10_000_000, 128
    B, K = 8192, 60
    N = B * K
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    table = jax.random.normal(jax.random.PRNGKey(0), (V, W), jnp.bfloat16) * 0.01
    jax.block_until_ready(table)
    print(f"table init: {time.perf_counter() - t0:.1f}s", flush=True)
    accum = jnp.zeros((V, 2), jnp.float32)
    ids = jnp.asarray(rng.integers(1, V, N).astype(np.int32))
    g = jnp.asarray(rng.normal(0, 1e-3, (N, W)).astype(np.float32))

    def chain(name, step, state, iters=10):
        state = step(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state)
        jax.block_until_ready(state)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
              flush=True)

    for exact in (False, True):
        @jax.jit
        def step(st, exact=exact):
            t, a = st
            t2, s2 = rowwise_adagrad_update(
                t, RowwiseAdagradState(accum=a), ids, g,
                lr=1e-3, pad_row=0, exact_dedup=exact, halves=2,
            )
            return (t2, s2.accum)

        chain(f"{'B. exact_dedup' if exact else 'A. default'} full update",
              step, (table, accum))

    @jax.jit
    def sort_step(x):
        return jnp.sort((x * 1664525 + 12345) % V)

    chain("C1. jnp.sort 491k int32", sort_step, ids)

    @jax.jit
    def argsort_step(x):
        y = (x * 1664525 + 12345) % V
        order = jnp.argsort(y)
        return y[order]

    chain("C2. argsort+take 491k int32", argsort_step, ids)

    ids_sorted = jnp.sort(ids)
    for name, idx, hint in (
        ("D1. scatter-add unsorted", ids, False),
        ("D2. scatter-add sorted+hint", ids_sorted, True),
    ):
        @jax.jit
        def sc(t, idx=idx, hint=hint):
            return t.at[idx].add(g.astype(t.dtype), indices_are_sorted=hint)

        chain(name, sc, table)

    # D3: scatter-SET with sorted+unique hints (what exact_dedup emits)
    uids = jnp.asarray(np.sort(rng.choice(V, N, replace=False)).astype(np.int32))

    @jax.jit
    def sc_set(t):
        return t.at[uids].set(
            g.astype(t.dtype), indices_are_sorted=True, unique_indices=True
        )

    chain("D3. scatter-set sorted+unique", sc_set, table)


if __name__ == "__main__":
    main()
