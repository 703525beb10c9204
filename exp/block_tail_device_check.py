"""Device check: fused block-tail vs separate kernels at flagship shapes
(one full DARE encoder layer fwd+bwd, B=8192, K=60, D=64, H=8, F=384)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.models.layers import DAREEncoderLayer

    B, K, D, H, F = 8192, 60, 64, 8, 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32), jnp.bfloat16)
    jax.block_until_ready(x)
    kw = dict(d_model=D, n_heads=H, mha_dropout=0.1, ffn_hidden=F,
              ffn_dropout=0.1, max_len=K, dtype=jnp.bfloat16)
    mods = {
        "fused_block": DAREEncoderLayer(**kw, use_pallas_attn=True,
                                        use_pallas_ffn=True),
        "separate":    DAREEncoderLayer(**kw, use_pallas_attn=True,
                                        use_pallas_ffn=True,
                                        fuse_block=False),
    }
    params = mods["fused_block"].init(jax.random.PRNGKey(0), x,
                                      deterministic=True)

    ys = {
        name: np.asarray(
            m.apply(params, x[:512], deterministic=True)
        ).astype(np.float32)
        for name, m in mods.items()
    }
    print("deterministic maxdiff:",
          np.abs(ys["fused_block"] - ys["separate"]).max(), flush=True)

    for name, m in mods.items():
        p = params

        def loss(x, m=m, p=p):
            yy = m.apply(p, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(7)})
            return (yy.astype(jnp.float32) ** 2).mean()

        st = jax.jit(lambda z, loss=loss: z - 1e-3 * jax.grad(loss)(z).astype(z.dtype))
        cur = st(x)
        jax.block_until_ready(cur)
        n, t0 = 20, time.time()
        for _ in range(n):
            cur = st(cur)
        jax.block_until_ready(cur)
        print(f"{name}: {(time.time() - t0) / n * 1e3:.2f} ms/iter "
              f"(full layer fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
