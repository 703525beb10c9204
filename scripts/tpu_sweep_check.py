"""On-TPU numerics + timing check for ops/pallas_scatter.sweep_rows_add.

Run on the real chip (default backend):  python scripts/tpu_sweep_check.py
Timing notes: unchained repeated calls through the axon tunnel are
memoized — the timing loop chains each call's output into the next.
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.pallas_scatter import sweep_rows_add

    print("backend:", jax.default_backend())

    # --- numerics: small table, duplicates + out-of-range sentinels ---
    rng = np.random.default_rng(0)
    V, D, N = 100_000, 64, 8192
    for dtype in (jnp.bfloat16, jnp.float32):
        tabs = [jnp.asarray(rng.normal(0, 1, (V, D)), dtype) for _ in range(2)]
        ids = rng.integers(0, V, N).astype(np.int32)
        ids[:100] = ids[0]  # hot row
        ids[100:110] = V + 7  # drop sentinel (out of range)
        deltas = [jnp.asarray(rng.normal(0, 0.01, (N, D)), jnp.float32) for _ in range(2)]
        ids_j = jnp.asarray(ids)

        got = sweep_rows_add(tabs, ids_j, deltas, superblock=4096)
        jax.block_until_ready(got)

        keep = ids < V
        for t in range(2):
            ref = np.array(tabs[t], np.float32, copy=True)
            d = np.asarray(deltas[t].astype(tabs[t].dtype), np.float32)
            np.add.at(ref, ids[keep], d[keep])
            err = np.abs(np.asarray(got[t], np.float32) - ref).max()
            tol = 0.05 if dtype == jnp.bfloat16 else 1e-5
            status = "OK" if err < tol else "FAIL"
            print(f"  {np.dtype(dtype).name} table {t}: max_err={err:.5f} {status}")
            assert err < tol, (dtype, t, err)

    # --- timing at flagship scale: 2 x (10M, 64) bf16, 245k update rows ---
    V, D, N = 10_000_000, 64, 245_760
    ids_j = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    deltas = [jnp.asarray(rng.normal(0, 1e-4, (N, D)), jnp.float32) for _ in range(2)]

    # tables donated: in the trainer the step donates TrainState, so the
    # kernel's input_output_aliases update in place; without donation XLA
    # copies 2.56 GB per call and the chain OOMs HBM
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_sweep(tabs, ids, deltas):
        out = sweep_rows_add(list(tabs), ids, list(deltas), superblock=2048)
        return tuple(out), ids + 1  # chain ids so calls aren't memoized

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_scatter(tabs, ids, deltas):
        out = tuple(t.at[ids].add(d.astype(t.dtype)) for t, d in zip(tabs, deltas))
        return out, ids + 1

    for name, fn in (("sweep", step_sweep), ("xla_scatter", step_scatter)):
        t0 = time.time()
        cur = tuple(
            jnp.zeros((V, D), jnp.bfloat16) + jnp.float32(i + 1) for i in range(2)
        )
        jax.block_until_ready(cur)
        print(f"{name}: table init {time.time()-t0:.1f}s")
        t0 = time.time()
        cur, cur_ids = fn(cur, ids_j, tuple(deltas))
        jax.block_until_ready(cur)
        print(f"{name}: compile+1 {time.time()-t0:.1f}s")
        t0 = time.time()
        cur_ids = cur_ids % V
        n_it = 10
        for _ in range(n_it):
            cur, cur_ids = fn(cur, cur_ids % V, tuple(deltas))
        jax.block_until_ready(cur)
        dt = (time.time() - t0) / n_it * 1e3
        print(f"{name}: {dt:.1f} ms/call (2 tables, chained)")
        del cur, cur_ids


if __name__ == "__main__":
    main()
