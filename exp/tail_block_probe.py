"""TPU probe: fused block-tail cost vs row-block size.

The tail kernel runs over N = B*Kp = 524288 rows at flagship shapes
with block_n=512 (grid 1024 fwd / 2048 bwd) — mostly launch overhead:
the per-block working set is < 2 MB.  With the per-kernel VMEM raise
(ops/_vmem.py) much larger row blocks fit; this sweeps them.

Sync idiom: value-fetch (block_until_ready can return early on the
tunnel backend); marginal cost between two iteration counts.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.pallas_ffn import fused_block_tail

    N, D, F = 8192 * 64, 64, 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32)).astype(jnp.bfloat16)
    o = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32)).astype(jnp.bfloat16)
    wout = jnp.asarray(rng.normal(0, 0.05, (D, D)).astype(np.float32))
    bout = jnp.zeros((D,), jnp.float32)
    wn1 = jnp.ones((D,), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (D, F)).astype(np.float32))
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, D)).astype(np.float32))
    b2 = jnp.zeros((D,), jnp.float32)
    wn2 = jnp.ones((D,), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    g = jnp.ones((N, D), jnp.bfloat16)

    def marginal(name, fn, state, lo=3, hi=9):
        totals = {}
        for iters in (lo, hi):
            st = fn(state)
            _ = np.asarray(st[:1, :1])
            t0 = time.perf_counter()
            for _ in range(iters):
                st = fn(st)
            _ = np.asarray(st[:1, :1])
            totals[iters] = time.perf_counter() - t0
        ms = (totals[hi] - totals[lo]) / (hi - lo) * 1e3
        print(f"{name}: {ms:.2f} ms", flush=True)

    for bn in (512, 1024, 2048, 4096, 8192, 16384):
        def fwd(xs, bn=bn):
            y = fused_block_tail(xs, o, wout, bout, wn1, w1, b1, w2, b2,
                                 wn2, seed, 0.1, bn, False, "hw")
            return (y * 0.001 + xs).astype(xs.dtype)

        def fwdbwd(xs, bn=bn):
            def loss(xx):
                y = fused_block_tail(xx, o, wout, bout, wn1, w1, b1, w2,
                                     b2, wn2, seed, 0.1, bn, False, "hw")
                return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

            _, dx = jax.value_and_grad(loss)(xs)
            return (dx * 0.001 + xs).astype(xs.dtype)

        print(f"== block_n {bn} (grid fwd {N // bn}, bwd {N // max(8, bn // 2)})")
        try:
            marginal("  fwd    ", jax.jit(fwd), x)
            marginal("  fwd+bwd", jax.jit(fwdbwd), x)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
