"""Probe: does the axon tunnel honor --xla_tpu_scoped_vmem_limit_kib?

Compiles the packed attention forward at a block size measured to need
16.82 MB scoped VMEM (> default 16 MB).  Success under the raised flag
means bigger kernel blocks are available on this backend.
"""

import os

# NOTE: --xla_tpu_scoped_vmem_limit_kib in XLA_FLAGS is FATAL on the
# client-side parser (parse_flags_from_env F-check) — it is a
# libtpu-side flag and must go through LIBTPU_INIT_ARGS only.
os.environ["LIBTPU_INIT_ARGS"] = (
    os.environ.get("LIBTPU_INIT_ARGS", "")
    + " --xla_tpu_scoped_vmem_limit_kib=65536"
)
os.environ["TOSSCTR_ATTN_SCORE_BUDGET_MB"] = "4"

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

    import time

    def loss(q):
        o = fused_mha(q, k, v, bias, seed, H, 0.1, 512, False, "packed")
        return (o.astype(jnp.float32) ** 2).mean()

    st = jax.jit(lambda x: x - 1e-3 * jax.grad(loss)(x).astype(x.dtype))
    cur = st(q)
    jax.block_until_ready(cur)
    print("compiled OK at block_b=512 request (vmem flag honored)", flush=True)
    n, t0 = 20, time.time()
    for _ in range(n):
        cur = st(cur)
    jax.block_until_ready(cur)
    print(f"packed big-block: {(time.time()-t0)/n*1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
