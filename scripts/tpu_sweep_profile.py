"""Profile the sweep kernel call on the real chip: which op eats the
1295 ms/call — the Pallas kernel itself or the surrounding sort/pack?
Also sweeps the superblock size to see if cost scales with grid steps.
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.pallas_scatter import sweep_rows_add
    from tossctr_tpu.utils.trace import find_trace_file, top_ops

    rng = np.random.default_rng(0)
    V, D, N = 10_000_000, 64, 245_760
    ids_j = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    deltas = [jnp.asarray(rng.normal(0, 1e-4, (N, D)), jnp.float32) for _ in range(2)]

    for sb in (2048, 8192, 32768):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def step(tabs, ids, deltas, sb):
            out = sweep_rows_add(list(tabs), ids, list(deltas), superblock=sb)
            return tuple(out), ids + 1

        cur = tuple(
            jnp.zeros((V, D), jnp.bfloat16) + jnp.float32(i + 1) for i in range(2)
        )
        jax.block_until_ready(cur)
        t0 = time.time()
        cur, cur_ids = step(cur, ids_j, tuple(deltas), sb)
        jax.block_until_ready(cur)
        print(f"sb={sb}: compile+1 {time.time()-t0:.1f}s")
        n_it = 4
        do_trace = sb == int(sys.argv[1]) if len(sys.argv) > 1 else (sb == 2048)
        if do_trace:
            jax.profiler.start_trace("/tmp/sweep_trace")
        t0 = time.time()
        for _ in range(n_it):
            cur, cur_ids = step(cur, cur_ids % V, tuple(deltas), sb)
        jax.block_until_ready(cur)
        dt = (time.time() - t0) / n_it * 1e3
        if do_trace:
            jax.profiler.stop_trace()
        print(f"sb={sb}: {dt:.1f} ms/call")
        del cur, cur_ids

    tp = find_trace_file("/tmp/sweep_trace")
    if tp:
        for name, ms in top_ops(tp, 12):
            print(f"  {ms / 4:9.2f} ms/call  {name[:110]}")


if __name__ == "__main__":
    main()
