"""Map the TPU gather cost function: rows fetched x source-table size.

exp/sorted_gather_probe.py established that index ORDER does not change
the big scoring gather's cost (42.2 ms unsorted vs 42.8 sorted for
3.28M rows from a (10M, 128) bf16 table; indices_are_sorted=True 43.5)
— the gather engine is a flat per-row pipeline, so a
unique->gather->inverse-index dedup (VERDICT r3 #1) only wins if
gathering from a SMALLER source is cheaper per row (the inverse
expansion is itself an N-row gather from the compacted unique buffer).
This probe measures:

  * take of N=3.28M rows from (V', 128) bf16 tables, V' from 10M down
    to 2048 (the smallest fit entirely in VMEM-scale footprints),
  * the same from (V', 64) fp32 (narrow-row cost),
  * an element gather (N,) fp32 (the scalar inverse-index form),
  * the (B*K)=524k selected-row gather from (10M, 128).

Chained (each iteration's ids depend on the previous result) and
synced by a VALUE fetch — block_until_ready lies on the tunnel backend.
Tables are passed as jit ARGUMENTS (a closure capture bakes 2.56 GB of
constants into the module and stalls compilation).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 8192 * 400
    ITERS = 6
    rng = np.random.default_rng(0)

    def bench(name, fn, ids, table):
        st = fn(ids, table)
        int(st[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st = fn(st, table)
        int(st[0])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name}: {dt:.2f} ms/call", flush=True)

    def dep_of(rows):
        return jnp.minimum(rows[:, 0].astype(jnp.int32), 0)

    @jax.jit
    def g_rows(ids, t):
        V = t.shape[0]
        rows = jnp.take(t, ids, axis=0)
        return (ids + 1 + dep_of(rows)) % (V - 20)

    @jax.jit
    def g_elems(ids, t):
        V = t.shape[0]
        x = jnp.take(t, ids, axis=0)
        return (ids + 1 + jnp.minimum(x.astype(jnp.int32), 0)) % (V - 20)

    for Vp in (10_000_000, 1_000_000, 131_072, 16_384, 2_048):
        t = jnp.asarray(
            np.abs(rng.normal(0, 1, (Vp, 128))).astype(np.float32), jnp.bfloat16
        )
        ids = jnp.asarray(rng.integers(1, Vp - 20, N).astype(np.int32))
        jax.block_until_ready((t, ids))
        bench(f"take N=3.28M from ({Vp:>10,}, 128) bf16", g_rows, ids, t)
        del t, ids

    for Vp in (10_000_000, 131_072):
        t = jnp.asarray(np.abs(rng.normal(0, 1, (Vp, 64))).astype(np.float32))
        ids = jnp.asarray(rng.integers(1, Vp - 20, N).astype(np.int32))
        jax.block_until_ready((t, ids))
        bench(f"take N=3.28M from ({Vp:>10,},  64) fp32", g_rows, ids, t)
        del t, ids

    v = jnp.asarray(np.abs(rng.normal(0, 1, (1_000_000,))).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 1_000_000 - 20, N).astype(np.int32))
    jax.block_until_ready((v, ids))
    bench("take N=3.28M elements from (1M,) fp32", g_elems, ids, v)
    del v, ids

    t = jnp.asarray(
        np.abs(rng.normal(0, 1, (10_000_000, 128))).astype(np.float32),
        jnp.bfloat16,
    )
    ids = jnp.asarray(
        rng.integers(1, 10_000_000 - 20, 8192 * 64).astype(np.int32)
    )
    jax.block_until_ready((t, ids))
    bench("take N=524k  from (10,000,000, 128) bf16", g_rows, ids, t)


if __name__ == "__main__":
    main()
