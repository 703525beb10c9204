"""Device check: packed vs loop fused-MHA kernels at flagship shapes
(B=8192, K=60, D=64, H=8) — compiled numerics agreement + chained
fwd+bwd timing."""

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

    # compiled numerics: packed vs loop on a slice, p=0 and p>0
    for p in (0.0, 0.1):
        a = np.asarray(
            fused_mha(q[:512], k[:512], v[:512], bias, seed, H, p, 32, False, "loop")
        ).astype(np.float32)
        b = np.asarray(
            fused_mha(q[:512], k[:512], v[:512], bias, seed, H, p, 32, False, "packed")
        ).astype(np.float32)
        print(f"p={p}: packed-vs-loop maxdiff {np.abs(a-b).max():.4f}", flush=True)

    for impl in ("loop", "packed"):
        def loss(q):
            o = fused_mha(q, k, v, bias, seed, H, 0.1, 64, False, impl)
            return (o.astype(jnp.float32) ** 2).mean()

        st = jax.jit(lambda x: x - 1e-3 * jax.grad(loss)(x).astype(x.dtype))
        cur = st(q)
        jax.block_until_ready(cur)
        n, t0 = 20, time.time()
        for _ in range(n):
            cur = st(cur)
        jax.block_until_ready(cur)
        print(f"{impl}: {(time.time()-t0)/n*1e3:.2f} ms/iter (fwd+bwd, 1 layer)",
              flush=True)


if __name__ == "__main__":
    main()
