"""Where do the packed-attention ms go?  Chained fwd+bwd timings at
flagship shapes for: p=0.1 (production), p=0.0 (no dropout hash), and
forward-only — separates MXU dots from VPU softmax/mask overhead."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.pallas_attention import fused_mha

    B, K, D, H = 8192, 60, 64, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.5, (K, K)).astype(np.float32), jnp.bfloat16)
    seed = jnp.asarray([7], jnp.int32)
    jax.block_until_ready((q, k, v, bias))

    def timeit(name, st, x0):
        cur = st(x0)
        jax.block_until_ready(cur)
        n, t0 = 20, time.time()
        for _ in range(n):
            cur = st(cur)
        jax.block_until_ready(cur)
        print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms/iter", flush=True)

    for p in (0.1, 0.0):
        def loss(q, p=p):
            o = fused_mha(q, k, v, bias, seed, H, p, 32, False, "packed")
            return (o.astype(jnp.float32) ** 2).mean()

        timeit(f"fwd+bwd p={p}",
               jax.jit(lambda x, p=p: x - 1e-3 * jax.grad(
                   lambda y: loss(y, p))(x).astype(x.dtype)), q)
        timeit(f"fwd-only p={p}",
               jax.jit(lambda x, p=p: 0.999 * x + 1e-3 * fused_mha(
                   x, k, v, bias, seed, H, p, 32, False, "packed"
               ).astype(x.dtype)), q)


if __name__ == "__main__":
    main()
