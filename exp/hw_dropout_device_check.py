"""TPU device check: hardware-PRNG dropout (dropout_impl="hw").

The hw mask cannot be reproduced in numpy, so validation works by
DUMPING the mask with a sibling Pallas kernel that calls the same
``_hw_keep`` helper at the same (seed, tag, row0) coordinates and block
structure as the packed attention / FFN kernels, then checking:

1. fused_mha(impl=packed, dropout_impl=hw) forward == jnp oracle with
   the dumped mask;
2. custom-vjp gradients == jnp autodiff through the masked oracle
   (this also proves the backward kernel — which runs at a DIFFERENT
   batch block — regenerates the identical mask);
3. forward output is bit-identical across batch-block sizes;
4. same for fused_ffn's hidden-unit mask;
5. the keep rate matches 1-p.

Run on the TPU host: python exp/hw_dropout_device_check.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tossctr_tpu.ops import pallas_attention as pa
    from tossctr_tpu.ops import pallas_ffn as pf

    assert jax.default_backend() == "tpu", "device check needs the TPU"

    B, K, D, H = 64, 12, 16, 8
    p = 0.3
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (K, K)).astype(np.float32))
    seed = jnp.asarray([1234], jnp.int32)
    g = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))

    Kp = pa._round_up(K, 8)
    G = pa._head_group(H, Kp)
    bb = pa._hw_block(pa._adaptive_block_packed(64, B, Kp, G))

    # ---- dump the packed-geometry keep mask --------------------------------
    def dump_kernel(seed_ref, o_ref):
        i = pl.program_id(0)
        for gi in range(H // G):
            o_ref[:, gi * G * Kp:(gi + 1) * G * Kp, :] = pa._hw_keep(
                (bb, G * Kp, Kp), p, seed_ref[0], jnp.int32(gi * G), i * bb
            )

    keep = pl.pallas_call(
        dump_kernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (bb, H * Kp, Kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H * Kp, Kp), jnp.float32),
    )(seed)
    keep = np.asarray(keep).reshape(B, H, Kp, Kp)[:, :, :K, :K]
    rate = (keep > 0).mean()
    print(f"attention keep rate: {rate:.4f} (expect ~{1-p})")
    assert abs(rate - (1 - p)) < 0.02

    def oracle(qq, kk, vv):
        dh = D // H

        def heads(t):
            return t.reshape(B, K, H, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qq), heads(kk), heads(vv)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
        logits = logits + bias[None, None]
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w = w * jnp.asarray(keep)
        o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(qq.dtype), vh)
        return o.transpose(0, 2, 1, 3).reshape(B, K, D)

    fused = lambda qq, kk, vv: pa.fused_mha(
        qq, kk, vv, bias, seed, H, p, 64, False, "packed", "hw"
    )
    out_f = jax.jit(fused)(q, k, v)
    out_o = jax.jit(oracle)(q, k, v)
    d = float(jnp.max(jnp.abs(out_f - out_o)))
    print(f"fwd maxdiff vs masked oracle: {d:.2e}")
    assert d < 2e-3

    loss_f = lambda qq, kk, vv: jnp.sum(fused(qq, kk, vv) * g)
    loss_o = lambda qq, kk, vv: jnp.sum(oracle(qq, kk, vv) * g)
    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, go):
        gd = float(jnp.max(jnp.abs(a - b)))
        print(f"grad d{name} maxdiff: {gd:.2e}")
        assert gd < 5e-3, name

    # ---- block-size invariance ---------------------------------------------
    out_small = jax.jit(
        lambda qq, kk, vv: pa.fused_mha(
            qq, kk, vv, bias, seed, H, p, 8, False, "packed", "hw"
        )
    )(q, k, v)
    assert bool(jnp.all(out_small == out_f)), "block-size invariance broken"
    print("fwd bit-identical across batch blocks: ok")

    # ---- FFN hidden mask -----------------------------------------------------
    N, F = 128, 256
    x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.1, (D, F)).astype(np.float32))
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (F, D)).astype(np.float32))
    b2 = jnp.zeros((D,), jnp.float32)
    # the dump must reseed at the same granularity fused_ffn computes
    # (gcd of its fwd/bwd row blocks)
    chunk = pf._ffn_hw_chunk(512, N)
    bn = chunk

    def ffn_dump(seed_ref, o_ref):
        i = pl.program_id(0)
        o_ref[...] = pa._hw_keep((bn, F), p, seed_ref[0], jnp.int32(0),
                                 i * bn, chunk)

    fkeep = pl.pallas_call(
        ffn_dump,
        grid=(N // bn,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((bn, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
    )(seed)
    y_f = jax.jit(
        lambda xx: pf.fused_ffn(xx, w1, b1, w2, b2, seed, p, 512, False, "hw")
    )(x)
    y_o = pf.ffn_reference(x, w1, b1, w2, b2, keep=fkeep)
    d = float(jnp.max(jnp.abs(y_f - y_o)))
    print(f"ffn fwd maxdiff vs masked oracle: {d:.2e}")
    assert d < 2e-3
    gx_f = jax.jit(jax.grad(
        lambda xx: jnp.sum(pf.fused_ffn(xx, w1, b1, w2, b2, seed, p, 512,
                                        False, "hw") ** 2)
    ))(x)
    gx_o = jax.jit(jax.grad(
        lambda xx: jnp.sum(pf.ffn_reference(xx, w1, b1, w2, b2, keep=fkeep) ** 2)
    ))(x)
    d = float(jnp.max(jnp.abs(gx_f - gx_o)))
    print(f"ffn grad dx maxdiff: {d:.2e}")
    assert d < 5e-3
    print("ALL HW-DROPOUT DEVICE CHECKS PASSED")


if __name__ == "__main__":
    main()
