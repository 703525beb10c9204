"""TPU probe: fused attention fwd/bwd cost vs batch-block size.

The packed kernel sizes its batch block from a per-score-tensor VMEM
budget (ops/pallas_attention._score_budget_bytes, default 1 MB -> bb=32
at flagship shapes).  The round-2 budget shows attention at 47 ms/step
(3 layers, fwd 5.6 + bwd 10.1 each); this probe measures whether larger
blocks (fewer grid launches, longer matmul pipelines) buy anything once
the scoped-VMEM limit is raised.

Run:  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python exp/attn_budget_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    B, K, D, H = 8192, 60, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32)).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (D, 3 * D)).astype(np.float32))
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (K, K)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    g = jnp.ones((B, K, D), jnp.bfloat16)

    def chain(name, fn, state, lo=3, hi=9):
        # block_until_ready can return early on the tunnel backend:
        # sync by FETCHING a value, and report the marginal cost between
        # two iteration counts so warmup/dispatch cancels out.
        totals = {}
        for iters in (lo, hi):
            st = fn(state)
            _ = np.asarray(st[:1, :1, :1])
            t0 = time.perf_counter()
            for _ in range(iters):
                st = fn(st)
            _ = np.asarray(st[:1, :1, :1])
            totals[iters] = time.perf_counter() - t0
        ms = (totals[hi] - totals[lo]) / (hi - lo) * 1e3
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    from tossctr_tpu.ops import pallas_attention as pa

    for mb in (1, 2, 4, 8):
        # the budget env var is read at TRACE time (inside
        # _adaptive_block_packed); each loop traces fresh jits.
        # TOSSCTR_PALLAS_VMEM_MB (ops/_vmem.py) raises Mosaic's 16 MB
        # scoped-VMEM ceiling per kernel, which is what rejected bb>=64
        # in round 2 — the axon backend takes no global XLA flag, but
        # pltpu.CompilerParams(vmem_limit_bytes=...) works per-call.
        os.environ.setdefault("TOSSCTR_PALLAS_VMEM_MB", "100")
        os.environ["TOSSCTR_ATTN_SCORE_BUDGET_MB"] = str(mb)

        impl = os.environ.get("TOSSCTR_PROBE_IMPL", "packed")

        def fwd(xs, pa=pa, impl=impl):
            return pa.fused_mha_qkv(xs, wqkv, bqkv, bias, seed, H,
                                    dropout_p=0.1, block_b=512, impl=impl,
                                    dropout_impl="hw")

        def fwdbwd(xs, pa=pa, impl=impl):
            def loss(xx):
                return jnp.sum(
                    pa.fused_mha_qkv(xx, wqkv, bqkv, bias, seed, H,
                                     dropout_p=0.1, block_b=512, impl=impl,
                                     dropout_impl="hw").astype(jnp.float32)
                    * g.astype(jnp.float32)
                )

            l, dx = jax.value_and_grad(loss)(xx := xs)
            return (dx * 0.001 + xx).astype(xs.dtype)

        f_fwd = jax.jit(lambda xs, pa=pa: (fwd(xs) * 0.001 + xs).astype(xs.dtype))
        f_fb = jax.jit(fwdbwd)
        from tossctr_tpu.ops.pallas_attention import (
            _adaptive_block_packed, _head_group, _round_up,
        )
        Kp = _round_up(K, 8)
        G = _head_group(H, Kp)
        bb = _adaptive_block_packed(512, B, Kp, G)
        print(f"== budget {mb} MB  (G={G}, Kp={Kp}, bb_fwd={bb}, bb_bwd={max(1, bb // 2)})")
        try:
            chain("  fwd       ", f_fwd, x)
            chain("  fwd+bwd   ", f_fb, x)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
