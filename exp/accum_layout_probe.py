"""TPU probe: per-row scatter/gather cost of the (V,2) f32 adagrad
accumulator under different storage shapes.

The exact-dedup trace shows the accumulator dominating: 19.6 ms
scatter-set + 6.0 ms gather, with XLA picking a {0,1:T(2,128)} layout
(V minor!) for the (10M, 2) f32 array — every row update straddles two
tiles.  Candidates, all carrying the same information:

  A. (V, 2) f32 as-is                         [shipping]
  B. (V, 8) f32 zero-padded rows (320 MB)     — does a wider row get a
     row-major layout and cheaper RMW?
  C. (V, 128) bf16... skipped (precision)
  D. two separate (V,) f32 arrays, one scatter each
  E. (V, 2) f32 but updates applied at UNSORTED ids (scatter-add) —
     the no-sort path's cost for reference

Chained honestly (a carried counter varies every update value).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    V = 10_000_000
    N = 8192 * 60
    rng = np.random.default_rng(0)
    uids = jnp.asarray(np.sort(rng.choice(V, N, replace=False)).astype(np.int32))
    ids_u = jnp.asarray(rng.integers(1, V, N).astype(np.int32))
    g2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))

    def chain(name, step, state, iters=10):
        state = step(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state)
        jax.block_until_ready(state)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
              flush=True)

    # A. (V,2) set at sorted-unique ids + gather
    acc2 = jnp.zeros((V, 2), jnp.float32)

    @jax.jit
    def step_a(st):
        a, i = st
        vals = jnp.take(a, uids, axis=0) + g2 * (1.0 + i * 1e-6)
        return (a.at[uids].set(vals, indices_are_sorted=True,
                               unique_indices=True), i + 1)

    chain("A. (V,2) f32 gather+set", step_a, (acc2, jnp.float32(0)))

    # B. (V,8) f32 padded rows
    acc8 = jnp.zeros((V, 8), jnp.float32)
    g8 = jnp.pad(g2, ((0, 0), (0, 6)))

    @jax.jit
    def step_b(st):
        a, i = st
        vals = jnp.take(a, uids, axis=0) + g8 * (1.0 + i * 1e-6)
        return (a.at[uids].set(vals, indices_are_sorted=True,
                               unique_indices=True), i + 1)

    chain("B. (V,8) f32 gather+set", step_b, (acc8, jnp.float32(0)))

    # D. two (V,) f32 arrays
    a0 = jnp.zeros((V,), jnp.float32)
    a1 = jnp.zeros((V,), jnp.float32)

    @jax.jit
    def step_d(st):
        x0, x1, i = st
        v0 = jnp.take(x0, uids) + g2[:, 0] * (1.0 + i * 1e-6)
        v1 = jnp.take(x1, uids) + g2[:, 1] * (1.0 + i * 1e-6)
        return (
            x0.at[uids].set(v0, indices_are_sorted=True, unique_indices=True),
            x1.at[uids].set(v1, indices_are_sorted=True, unique_indices=True),
            i + 1,
        )

    chain("D. 2x (V,) f32 gather+set", step_d, (a0, a1, jnp.float32(0)))

    # E. (V,2) unsorted scatter-add (no-sort path shape)
    @jax.jit
    def step_e(st):
        a, i = st
        return (a.at[ids_u].add(g2 * (1.0 + i * 1e-6)), i + 1)

    chain("E. (V,2) f32 unsorted add", step_e, (acc2, jnp.float32(0)))

    # F. (V,8) unsorted scatter-add
    @jax.jit
    def step_f(st):
        a, i = st
        return (a.at[ids_u].add(g8 * (1.0 + i * 1e-6)), i + 1)

    chain("F. (V,8) f32 unsorted add", step_f, (acc8, jnp.float32(0)))


if __name__ == "__main__":
    main()
