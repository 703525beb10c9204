"""Locate the small-source gather cliff and test repeated-index
behaviour (follow-up to exp/gather_cost_fn_probe.py).

Findings so far (v5e, chained, value-fetch synced): N=3.28M row gather
costs 42 ms from a 10M- or 1M-row bf16 (.,128) table but only ~13 ms
from 131k/16k/2k-row tables; index ORDER is irrelevant.  Questions:
  1. Where between 131k and 1M does the cliff sit? (262k/512k/768k)
  2. Is it the SOURCE size or the TOUCHED row set?  Gather from the
     (10M, 128) table with ids confined to [0, 131072) answers it —
     fast => a frequency-sorted vocab layout alone fixes skewed
     traffic; slow => the dedup path must physically compact unique
     rows into a small buffer.
  3. Narrow bf16 (., 64) source (the att half): byte-proportional?
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 8192 * 400
    ITERS = 6
    rng = np.random.default_rng(1)

    def bench(name, fn, ids, table, mod):
        st = fn(ids, table, mod)
        int(st[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st = fn(st, table, mod)
        int(st[0])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name}: {dt:.2f} ms/call", flush=True)

    def dep_of(rows):
        return jnp.minimum(rows[:, 0].astype(jnp.int32), 0)

    @jax.jit
    def g_rows(ids, t, mod):
        rows = jnp.take(t, ids, axis=0)
        return (ids + 1 + dep_of(rows)) % mod

    # 1. the cliff
    for Vp in (262_144, 524_288, 786_432):
        t = jnp.asarray(
            np.abs(rng.normal(0, 1, (Vp, 128))).astype(np.float32), jnp.bfloat16
        )
        ids = jnp.asarray(rng.integers(1, Vp - 20, N).astype(np.int32))
        mod = jnp.int32(Vp - 20)
        jax.block_until_ready((t, ids))
        bench(f"take N=3.28M from ({Vp:>9,}, 128) bf16", g_rows, ids, t, mod)
        del t, ids

    # 2. big source, small touched set
    t = jnp.asarray(
        np.abs(rng.normal(0, 1, (10_000_000, 128))).astype(np.float32),
        jnp.bfloat16,
    )
    for touched in (131_072, 1_000_000):
        ids = jnp.asarray(rng.integers(1, touched - 20, N).astype(np.int32))
        mod = jnp.int32(touched - 20)
        jax.block_until_ready((t, ids))
        bench(
            f"take N=3.28M from (10M, 128) ids<{touched:>9,}",
            g_rows, ids, t, mod,
        )
        del ids
    del t

    # 3. narrow bf16 source
    t = jnp.asarray(
        np.abs(rng.normal(0, 1, (131_072, 64))).astype(np.float32), jnp.bfloat16
    )
    ids = jnp.asarray(rng.integers(1, 131_072 - 20, N).astype(np.int32))
    mod = jnp.int32(131_072 - 20)
    jax.block_until_ready((t, ids))
    bench("take N=3.28M from (  131,072,  64) bf16", g_rows, ids, t, mod)


if __name__ == "__main__":
    main()
