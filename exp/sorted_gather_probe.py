"""Probe: does index SORTEDNESS change the cost of the big scoring
gather (3.28M rows from the (10M, 128) bf16 fused table)?

DESIGN.md calls the 39.7 ms scoring gather a random-row-access floor.
Uniform ids at B*L=3.28M over 10M rows average ~5.2 ids per (16,128)
bf16 tile: if the DMA path coalesces *adjacent* gather rows that live
in the same HBM tile, a sorted-id gather should approach the
distinct-tile byte bound (~2.5 GB -> ~3-4 ms at 819 GB/s) instead of
paying the per-row amplified fetch.  If it does, the scoring pass can
become sort -> gather -> dot -> sort-back, gated on the cost of a
global 3.3M-element sort.

Chaining idiom (see exp/packed_row_probe.py): the tunnel memoizes /
skips work whose outputs are never consumed, so the NEXT iteration's
ids must DEPEND on this iteration's gather result through a term XLA
cannot constant-fold.  The table is abs(normal): min(row0_int, 0) is 0
at runtime but not provably so at compile time, and ids+1+0 keeps
sorted ids sorted.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, L, V = 8192, 400, 10_000_000
    N = B * L
    ITERS = 8
    rng = np.random.default_rng(0)
    print("staging table...", flush=True)
    t = jnp.asarray(np.abs(rng.normal(0, 1, (V, 128))).astype(np.float32),
                    jnp.bfloat16)
    ids_np = rng.integers(1, V - 2 * ITERS - 2, N).astype(np.int32)
    ids = jnp.asarray(ids_np)
    ids_sorted = jnp.asarray(np.sort(ids_np))
    jax.block_until_ready((t, ids, ids_sorted))
    print("staged", flush=True)

    def dep_of(rows):
        # >= 0 at runtime (table is abs()), opaque to the compiler
        return jnp.minimum(rows[:, 0].astype(jnp.int32), 0)

    @jax.jit
    def g_take(ids, t):
        rows = jnp.take(t, ids, axis=0)
        return ids + 1 + dep_of(rows)

    @jax.jit
    def g_sorted_flag(ids, t):
        rows = jax.lax.gather(
            t, ids[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 128),
            indices_are_sorted=True, unique_indices=False,
        )
        return ids + 1 + dep_of(rows)

    @jax.jit
    def sort_chain(ids):
        pos = jnp.arange(N, dtype=jnp.int32)
        s, p = jax.lax.sort((ids, pos), dimension=0, num_keys=1)
        dep = jnp.minimum(s[0] - 1, 0)  # ids >= 1 at runtime
        return ids + 1 + dep + jnp.minimum(p[0], 0) * 0

    def bench(name, step, state, iters=ITERS):
        print(f"compiling {name}...", flush=True)
        st = step(state)
        int(st[0])  # value fetch: block_until_ready lies on the tunnel backend
        t0 = time.perf_counter()
        for _ in range(iters):
            st = step(st)
        int(st[0])  # drains the whole dependent chain
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms/call", flush=True)

    bench("take_unsorted", lambda s: g_take(s, t), ids)
    bench("take_sorted", lambda s: g_take(s, t), ids_sorted)
    bench("gather_sorted_flag", lambda s: g_sorted_flag(s, t), ids_sorted)
    bench("sort_3.3M_ids+pos", sort_chain, ids)


if __name__ == "__main__":
    main()
