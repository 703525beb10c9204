"""TPU probe: how much of the attention/FFN kernel time is the
counter-hash dropout mask?

Times the fused kernels at flagship shapes with dropout_p=0.1 (hash
runs in fwd AND is regenerated in bwd) vs dropout_p=0.0 (no mask at
all).  The delta is the UPPER BOUND of what a hardware-PRNG mask
(pltpu.prng_random_bits, ~2 ops/elem vs ~15) can recover.

Run: python exp/dropout_cost_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops import pallas_attention as pa
    from tossctr_tpu.ops import pallas_ffn as pf

    B, K, D, H, F = 8192, 64, 64, 8, 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32)).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (D, 3 * D)).astype(np.float32))
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (K, K)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    g = jnp.ones((B, K, D), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (D, F)).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, D)).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.float32)
    xf = x.reshape(B * K, D)
    gf = g.reshape(B * K, D)

    def chain(name, fn, state, iters=10):
        state = fn(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = fn(state)
        jax.block_until_ready(state)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:.3f} ms", flush=True)
        return ms

    for p in (0.1, 0.0):
        def attn_fwd(xs, p=p):
            return (pa.fused_mha_qkv(xs, wqkv, bqkv, bias, seed, H,
                                     dropout_p=p, block_b=512) * 0.001 + xs
                    ).astype(xs.dtype)

        def attn_fb(xs, p=p):
            def loss(xx):
                return jnp.sum(
                    pa.fused_mha_qkv(xx, wqkv, bqkv, bias, seed, H,
                                     dropout_p=p, block_b=512
                                     ).astype(jnp.float32)
                    * g.astype(jnp.float32))
            dx = jax.grad(loss)(xs)
            return (dx * 0.001 + xs).astype(xs.dtype)

        def ffn_fb(xs, p=p):
            def loss(xx):
                return jnp.sum(
                    pf.fused_ffn(xx, w1, b1, w2, b2, seed, p
                                 ).astype(jnp.float32)
                    * gf.astype(jnp.float32))
            dx = jax.grad(loss)(xs)
            return (dx * 0.001 + xs).astype(xs.dtype)

        print(f"== dropout_p = {p}")
        chain("  attn fwd    ", jax.jit(attn_fwd), x)
        chain("  attn fwd+bwd", jax.jit(attn_fb), x)
        chain("  ffn  fwd+bwd", jax.jit(ffn_fb), xf)


if __name__ == "__main__":
    main()
