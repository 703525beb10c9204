"""Device check: qkv-fused vs Dense+packed attention at flagship shapes
(B=8192, K=60, D=64, H=8) — compiled numerics + chained fwd+bwd layer
timing (includes the projection and its glue, which is the point)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.models.layers import MultiHeadSelfAttention

    B, K, D, H = 8192, 60, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, 1, K, K)).astype(np.float32),
                       jnp.bfloat16)
    jax.block_until_ready((x, bias))

    mods = {
        "fused_qkv": MultiHeadSelfAttention(D, H, 0.1, use_pallas=True,
                                            fuse_qkv=True, dtype=jnp.bfloat16),
        "dense+mha": MultiHeadSelfAttention(D, H, 0.1, use_pallas=True,
                                            fuse_qkv=False, dtype=jnp.bfloat16),
    }
    params = mods["dense+mha"].init(
        jax.random.PRNGKey(0), x, attn_bias=bias, deterministic=True
    )

    outs = {}
    for name, m in mods.items():
        y = m.apply(params, x[:512], attn_bias=bias, deterministic=True)
        outs[name] = np.asarray(y).astype(np.float32)
    print("deterministic maxdiff:",
          np.abs(outs["fused_qkv"] - outs["dense+mha"]).max(), flush=True)

    for name, m in mods.items():
        def loss(x):
            y = m.apply(params, x, attn_bias=bias, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
            return (y.astype(jnp.float32) ** 2).mean()

        st = jax.jit(lambda z: z - 1e-3 * jax.grad(loss)(z).astype(z.dtype))
        cur = st(x)
        jax.block_until_ready(cur)
        n, t0 = 20, time.time()
        for _ in range(n):
            cur = st(cur)
        jax.block_until_ready(cur)
        print(f"{name}: {(time.time() - t0) / n * 1e3:.2f} ms/iter "
              f"(proj+attn+out fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
