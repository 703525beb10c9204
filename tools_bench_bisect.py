"""One-off: bisect the train step into phases on the real TPU to find the
pathological component. Not part of the framework."""

import time

import numpy as np


def timeit(f, *a, n=5, label=""):
    import jax

    t0 = time.time()
    r = f(*a)
    jax.block_until_ready(r)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"{label:34s} compile={compile_t:7.1f}s  run={dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    B, L, K, D, V = 4096, 400, 60, 64, 10_000_000
    rng = np.random.default_rng(0)
    table = jax.jit(lambda k: jax.random.normal(k, (V, D), jnp.float32))(jax.random.PRNGKey(0))
    jax.block_until_ready(table)
    seq = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    q = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))

    # 1. plain row gather (B,L) from 10M x 64
    timeit(jax.jit(lambda t, s: jnp.take(t, s, axis=0).sum()), table, seq, label="gather (B,L,D) fp32")
    tb16 = table.astype(jnp.bfloat16)
    timeit(jax.jit(lambda t, s: jnp.take(t, s, axis=0).sum()), tb16, seq, label="gather (B,L,D) bf16")

    # 2. gather + score + topk (the selection pass)
    def select(t, s, qq):
        att = jnp.take(t, s, axis=0).astype(jnp.bfloat16)
        sc = jnp.einsum("bld,bd->bl", att, qq.astype(jnp.bfloat16))
        sc = jnp.where(s == 0, -1e9, sc)
        v, i = jax.lax.top_k(sc, K)
        return v.sum() + i.sum()

    timeit(jax.jit(select), table, seq, q, label="gather+score+topk")

    # 3. topk alone
    sc = jnp.asarray(rng.normal(0, 1, (B, L)).astype(np.float32))
    timeit(jax.jit(lambda s: jax.lax.top_k(s, K)[0].sum()), sc, label="top_k alone")

    # 4. backward: scatter-add grads into the table (K rows/example)
    ids_k = jnp.asarray(rng.integers(1, V, (B, K)).astype(np.int32))

    def loss_gather(t):
        e = jnp.take(t, ids_k, axis=0).astype(jnp.bfloat16)
        return (e.astype(jnp.float32) ** 2).sum()

    timeit(jax.jit(jax.grad(loss_gather)), table, label="grad of (B,K) gather (dense out)")

    # 5. adafactor update on the table
    import optax

    tx = optax.adafactor(1e-3)
    opt_state = tx.init(table)

    g = jax.jit(jax.grad(loss_gather))(table)
    jax.block_until_ready(g)

    @jax.jit
    def upd(t, os_, gg):
        u, os2 = tx.update(gg, os_, t)
        return optax.apply_updates(t, u), os2

    timeit(upd, table, opt_state, g, label="adafactor update 10Mx64")

    # 6. global-norm clip over the table grad
    timeit(jax.jit(lambda gg: optax.global_norm(gg)), g, label="global_norm 10Mx64")

    # 7. QNN cross einsums at F=121
    F, H, R, P = 121, 6, 16, 192
    z = jnp.asarray(rng.normal(0, 1, (B, F, D)).astype(np.float32)).astype(jnp.bfloat16)
    U = jnp.asarray(rng.normal(0, 0.02, (H, D, R)).astype(np.float32)).astype(jnp.bfloat16)
    Vv = jnp.asarray(rng.normal(0, 0.02, (H, R, P)).astype(np.float32)).astype(jnp.bfloat16)

    def cross(z, U, Vv):
        A = jnp.einsum("bfd,hdr->bhfr", z, U)
        s = A.sum(2)
        quad = s * s - (A * A).sum(2)
        return jnp.einsum("bhr,hrp->bhp", quad, Vv).sum()

    timeit(jax.jit(cross), z, U, Vv, label="fm_cross fwd")
    timeit(jax.jit(jax.grad(cross)), z, U, Vv, label="fm_cross grad")

    # 8. transformer-ish MHA over K tokens x3 layers is small; skip.


if __name__ == "__main__":
    main()
