"""Device validation of the fused FFN kernel: compiled numerics vs the
jnp oracle at flagship shapes, then chained timing vs the XLA FFN.

Chained runs (each call consumes the previous output) because unchained
timings through this machine's tunnel are memoized (memory:
axon-tpu-environment)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.pallas_ffn import ffn_reference, fused_ffn

    N, D, F = 8192 * 60, 64, 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.3, (D, F)).astype(np.float32), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.1, (F,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (F, D)).astype(np.float32), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    jax.block_until_ready((x, w1, b1, w2, b2))

    # ---- compiled numerics on a small slice ----
    xs = x[:4096]
    got = np.asarray(fused_ffn(xs, w1, b1, w2, b2, seed, 0.0)).astype(np.float32)
    want = np.asarray(ffn_reference(xs, w1, b1, w2, b2)).astype(np.float32)
    print("fwd maxdiff:", np.abs(got - want).max(), flush=True)

    def loss_fused(x, w1, b1, w2, b2):
        return (fused_ffn(x, w1, b1, w2, b2, seed, 0.0).astype(jnp.float32) ** 2).mean()

    def loss_ref(x, w1, b1, w2, b2):
        return (ffn_reference(x, w1, b1, w2, b2).astype(jnp.float32) ** 2).mean()

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(xs, w1, b1, w2, b2)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(xs, w1, b1, w2, b2)
    for a, b, nm in zip(gf, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-6, np.abs(b).max())
        print(f"grad {nm}: maxdiff {np.abs(a-b).max():.3e} rel {np.abs(a-b).max()/scale:.3e}",
              flush=True)

    # ---- chained fwd+bwd timing: pallas vs xla ----
    def step(fn):
        def s(x):
            l, g = jax.value_and_grad(lambda xx: fn(xx, w1, b1, w2, b2))(x)
            return x - 1e-3 * g.astype(x.dtype)
        return jax.jit(s)

    for name, fn in [("xla", loss_ref), ("pallas", loss_fused)]:
        st = step(fn)
        cur = st(x)
        jax.block_until_ready(cur)
        n = 20
        t0 = time.time()
        for _ in range(n):
            cur = st(cur)
        jax.block_until_ready(cur)
        print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms/iter (fwd+bwd+axpy)",
              flush=True)


if __name__ == "__main__":
    main()
