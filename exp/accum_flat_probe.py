"""TPU probe: the (V,2) f32 adagrad accumulator as a FLAT (2V,) array
with 2-element window gather/scatter at offsets 2*id.

Rationale: XLA lays the (10M,2) f32 array out V-minor ({0,1}), so each
row RMW straddles two tiles (~20-25 ms for 491k rows in every 2-D
variant probed, exp/accum_layout_probe.py).  A 1-D operand has a
linear layout — a 2-element window at 2*id touches ONE tile.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    V = 10_000_000
    N = 8192 * 60
    rng = np.random.default_rng(0)
    uids = np.sort(rng.choice(V, N, replace=False)).astype(np.int32)
    starts = jnp.asarray((2 * uids.astype(np.int64)).astype(np.int32))[:, None]
    g2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))

    acc = jnp.zeros((2 * V,), jnp.float32)

    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    sdn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )

    def chain(name, step, state, iters=10):
        state = step(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state)
        jax.block_until_ready(state)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
              flush=True)

    @jax.jit
    def step_rmw(st):
        a, i = st
        rows = jax.lax.gather(
            a, starts, gdn, slice_sizes=(2,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        vals = rows + g2 * (1.0 + i * 1e-6)
        a = jax.lax.scatter(
            a, starts, vals, sdn, indices_are_sorted=True,
            unique_indices=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return (a, i + 1)

    chain("flat (2V,) window gather+set", step_rmw, (acc, jnp.float32(0)))

    @jax.jit
    def step_set_only(st):
        a, i = st
        vals = g2 * (1.0 + i * 1e-6)
        a = jax.lax.scatter(
            a, starts, vals, sdn, indices_are_sorted=True,
            unique_indices=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return (a, i + 1)

    chain("flat (2V,) window set only", step_set_only, (acc, jnp.float32(0)))

    @jax.jit
    def step_gather_only(st):
        a, i = st
        rows = jax.lax.gather(
            a, starts, gdn, slice_sizes=(2,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return (a + rows.sum() * 1e-20, i + 1)

    chain("flat (2V,) window gather only", step_gather_only,
          (acc, jnp.float32(0)))


if __name__ == "__main__":
    main()
