"""Hierarchical (proxy-prefilter) selection — device cost probe.

VERDICT r4 #8: with HLO-level overlap refuted (exp/overlap_probe.py)
the only remaining lever on the 39.8 ms scoring gather is issuing
fewer slow-regime indices.  The r4 gather cost function says a gather
whose operand fits in VMEM costs ~4.3 ns/row vs 12.8 ns from HBM — so
score all L positions against a small PROXY table (block-means of the
att table; cluster(id) = id // block is pure arithmetic on the hashed
ids), keep the top C2 candidates per row, and run the exact gather +
score only on B*C2 rows.

This probe measures the full pipeline end-to-end at flagship shapes
(B=8192, L=400, K=60, fused (10M, 128) bf16 table) BEFORE any model
integration:

  dense   : gather(B*L x 128-wide) + einsum + variadic sort  (today)
  hier    : proxy build (block-mean read of the att half)
            + proxy score (B*L gather from (156k, 64) bf16, sub-cliff)
            + top-C2 + exact gather (B*C2 x 128) + exact score + top-K

Semantics note: hier returns the exact-score top-k OF the candidate
set — identical to dense whenever the true top-K survives the proxy
prefilter.  Quality delta is a separate parity leg; this probe is
pure device time.  Chained + value-fetch synced; big operands ride as
jit arguments (closure constants stall the tunnel compile).
"""

import time

import numpy as np

V = 10_000_000
D = 64          # att half width
W = 128         # fused row width
B = 8192
L = 400
K = 60
BLOCK = 64      # ids per proxy cluster
C2 = 128        # candidates kept by the prefilter
ITERS = 8
C = V // BLOCK  # 156_250 clusters -> (C, 64) bf16 = 20 MB, sub-cliff


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    Vp = C * BLOCK  # 10,000,000 exactly divides by 64? use V - V%BLOCK

    @jax.jit
    def make_data(key):
        ks = jax.random.split(key, 3)
        table = jax.random.normal(ks[0], (Vp, W), dtype=jnp.bfloat16)
        ids = jax.random.randint(ks[1], (B, L), 0, Vp, dtype=jnp.int32)
        query = jax.random.normal(ks[2], (B, D), dtype=jnp.bfloat16)
        return table, ids, query

    table, ids0, query = make_data(jax.random.PRNGKey(0))
    jax.block_until_ready(table)
    print(f"data ready; V'={Vp} C={C}", flush=True)

    decay = jnp.log(jnp.exp(-(L - 1 - jnp.arange(L, dtype=jnp.float32))
                            / 256.0) + 1e-8).astype(jnp.bfloat16)

    def chain(x, ids):
        bump = jnp.min(x).astype(jnp.int32) & 0
        return (ids + 1 + bump) % (Vp - 7)

    # ---- today's dense path (cost model of ops/topk_select.py) ----
    @jax.jit
    def f_dense(ids, tbl, q):
        att = jnp.take(tbl, ids.reshape(-1), axis=0).reshape(B, L, W)[..., :D]
        s = jnp.einsum("bld,bd->bl", att, q) + decay[None, :]
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        _, idx_s, ids_s = jax.lax.sort(
            (-s, pos, ids), dimension=-1, num_keys=1, is_stable=True)
        vals = -(-s)  # keep s alive
        return chain(s, ids), jnp.sum(ids_s[:, :K]) + jnp.sum(idx_s[:, :K])

    # ---- proxy build alone ----
    @jax.jit
    def f_proxy_build(ids, tbl):
        p = tbl.reshape(C, BLOCK, W)[:, :, :D].astype(jnp.float32).mean(1)
        p = p.astype(jnp.bfloat16)
        return chain(p.astype(jnp.float32), ids), jnp.sum(
            p[0].astype(jnp.float32))

    # ---- full hierarchical path ----
    # Optimized ops, matching the production select (topk_select.py):
    # ONE variadic stable sort per stage (lax.top_k with k=128 costs
    # >10 ms; the sort is 2.1 ms and carries pos+ids as payloads, so
    # candidate ids need no gather), decay via arithmetic not gathers.
    def hier(ids, tbl, q, with_build):
        if with_build:
            proxy = tbl.reshape(C, BLOCK, W)[:, :, :D].astype(
                jnp.float32).mean(1).astype(jnp.bfloat16)
        else:
            proxy = tbl[:C, :D]  # stand-in resident proxy (same shapes)
        ps = jnp.take(proxy, (ids // BLOCK).reshape(-1), axis=0)
        ps = ps.reshape(B, L, D)
        s1 = jnp.einsum("bld,bd->bl", ps, q) + decay[None, :]
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        _, cpos, cids = jax.lax.sort(
            (-s1, pos, ids), dimension=-1, num_keys=1, is_stable=True)
        cpos, cids = cpos[:, :C2], cids[:, :C2]            # candidates
        att = jnp.take(tbl, cids.reshape(-1), axis=0)
        att = att.reshape(B, C2, W)[..., :D]
        s2 = jnp.einsum("bcd,bd->bc", att, q)
        # decay at candidate positions, arithmetically (log_decay_at)
        s2 = s2 + jnp.log(
            jnp.exp(-(L - 1 - cpos.astype(jnp.bfloat16)) / 256.0) + 1e-8)
        _, spos, sids = jax.lax.sort(
            (-s2, cpos, cids), dimension=-1, num_keys=1, is_stable=True)
        sel_ids = sids[:, :K]
        return s2, jnp.sum(sel_ids) + jnp.sum(spos[:, :K])

    @jax.jit
    def f_proxy_score(ids, tbl, q):
        proxy = tbl[:C, :D]
        ps = jnp.take(proxy, (ids // BLOCK).reshape(-1), axis=0)
        ps = ps.reshape(B, L, D)
        s1 = jnp.einsum("bld,bd->bl", ps, q) + decay[None, :]
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        _, cpos, cids = jax.lax.sort(
            (-s1, pos, ids), dimension=-1, num_keys=1, is_stable=True)
        return chain(s1.astype(jnp.float32), ids), \
            jnp.sum(cids[:, :C2]) + jnp.sum(cpos[:, :C2])

    @jax.jit
    def f_exact_cand(ids, tbl, q):
        cids = ids[:, :C2]  # stand-in candidate set, same shapes
        att = jnp.take(tbl, cids.reshape(-1), axis=0)
        att = att.reshape(B, C2, W)[..., :D]
        s2 = jnp.einsum("bcd,bd->bc", att, q)
        _, sids = jax.lax.sort(
            (-s2, cids), dimension=-1, num_keys=1, is_stable=True)
        return chain(s2.astype(jnp.float32), ids), jnp.sum(sids[:, :K])

    @jax.jit
    def f_hier_nobuild(ids, tbl, q):
        s2, out = hier(ids, tbl, q, with_build=False)
        return chain(s2.astype(jnp.float32), ids), out

    @jax.jit
    def f_hier_build(ids, tbl, q):
        s2, out = hier(ids, tbl, q, with_build=True)
        return chain(s2.astype(jnp.float32), ids), out

    @jax.jit
    def f_noop(ids):
        return ids + 1, jnp.sum(ids[0, :4])

    def bench(name, f, *extra):
        a1, v = f(ids0, *extra)
        float(v)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a1, v = f(a1, *extra)
        float(v)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:28s}: {dt:8.2f} ms", flush=True)
        return dt

    t0_ = bench("noop (dispatch floor)", f_noop)
    t_d = bench("dense select (today)", f_dense, table, query)
    t_pb = bench("proxy build alone", f_proxy_build, table)
    bench("proxy score+sort alone", f_proxy_score, table, query)
    bench(f"exact on {C2} cands alone", f_exact_cand, table, query)
    t_h0 = bench("hier select (proxy ready)", f_hier_nobuild, table, query)
    t_h1 = bench("hier select (+build)", f_hier_build, table, query)

    print(f"\nabove-floor: dense={t_d - t0_:.2f}  "
          f"hier={t_h0 - t0_:.2f} (+build {t_h1 - t0_:.2f}, "
          f"build alone {t_pb - t0_:.2f})")
    print(f"projected step delta: {(t_d - t_h1):+.2f} ms "
          f"(build every step) / {(t_d - t_h0):+.2f} ms (amortized)")


if __name__ == "__main__":
    main()
