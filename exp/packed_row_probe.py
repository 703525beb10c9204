"""TPU probe: does widening table rows past one 128-lane tile change
per-row gather/scatter cost?

Motivation: the (V,2) f32 adagrad accumulator costs ~20-25 ms/step in
every standalone layout probed (exp/accum_layout_probe.py,
exp/accum_flat_probe.py) because sub-tile row RMWs pay full-tile
traffic plus per-row latency.  If per-row cost is width-independent
even ACROSS the 128-lane tile boundary, the accumulator can ride the
table's own rows: fused table (V, 128) bf16 + accum f32x2 bitcast to
4 bf16 lanes = (V, 132), one gather and one scatter for everything.

Measures, chained so the tunnel cannot memoize:
  gather  3.3M rows (the scoring gather)  at widths 128 / 132 / 256
  gather  491k sorted-unique rows          at widths 128 / 132 / 256
  scatter 491k sorted-unique rows (set)    at widths 128 / 132 / 256
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    V = 10_000_000
    BL = 8192 * 400
    N = 8192 * 60
    rng = np.random.default_rng(0)
    ids_big = jnp.asarray(rng.integers(1, V, BL).astype(np.int32))
    uids = jnp.asarray(np.sort(rng.choice(V, N, replace=False)).astype(np.int32))

    def chain(name, step, state, iters=8):
        state = step(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state)
        jax.block_until_ready(state)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms", flush=True)

    for W in (128, 132, 256):
        # Each step's OUTPUT must differ from the last (ids rotate by
        # +1 mod V; scatter values carry a counter): this environment's
        # remote tunnel memoizes executions whose inputs repeat, so a
        # fixed-point chain times ~0.03 ms regardless of work.  The
        # gather result feeds the next ids via a term XLA cannot fold
        # (min(row, 0) on a non-constant table parameter), and the
        # scatter donates its argument (true in-place RMW cost).
        @jax.jit
        def g_any(ids, t):
            rows = jnp.take(t, ids, axis=0)
            dep = jnp.minimum(rows[:, :1].astype(jnp.int32).reshape(-1), 0)
            return (ids + 1 + dep) % jnp.int32(V)

        @partial(jax.jit, donate_argnums=0)
        def s_small(st, uids=uids, W=W):
            t, i = st
            upd = jnp.full((N, W), 0.5, jnp.bfloat16) + i.astype(jnp.bfloat16)
            return (
                t.at[uids].set(
                    upd, mode="drop", unique_indices=True, indices_are_sorted=True
                ),
                i + 1e-6,
            )

        t = jnp.zeros((V, W), jnp.bfloat16)
        chain(f"gather 3.3M x (V,{W})", lambda ids, t=t: g_any(ids, t), ids_big)
        chain(f"gather 491k x (V,{W})", lambda ids, t=t: g_any(ids, t), uids)
        chain(f"scatter-set 491k x (V,{W})", s_small, (t, jnp.float32(0)))
        del t


if __name__ == "__main__":
    main()
