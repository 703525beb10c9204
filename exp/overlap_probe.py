"""Does the TPU overlap a latency-bound embedding gather with MXU work?

VERDICT r4 weak#1 / next#1: the 180 ms step's per-op floors were summed
serially, but a step is not obligated to run them serially — IF the chip
(or XLA's scheduler) can co-schedule the 39.8 ms latency-bound scoring
gather with MXU-heavy Mosaic kernels, a 2-way microbatched step could
hide one microbatch's gathers under the other's attention/FFN.

This probe answers the question directly.  Three jitted programs:

  * ``gather_only``  — the scoring pass shape-for-shape: a (B*L,) row
    gather from the (10M, 64) bf16 att table fused into the query dot
    (ops/topk_select.py:176-178).  ~40 ms at B=8192, L=400.
  * ``mxu_only``     — a chain of bf16 (8192, 1024)x(1024, 1024)
    matmuls with a cheap nonlinearity between, calibrated to roughly
    the same wall time.  Pure MXU+HBM-streaming work, no gathers.
  * ``both``         — the SAME two computations in ONE program with
    zero data dependence between them (separate inputs, tuple output).

If wall(both) ~= max(wall(gather), wall(mxu)) the chip co-schedules and
the microbatch pipeline is worth building; if ~= sum(...), XLA:TPU runs
independent HLO ops serially on the core and "per-op floors sum" IS a
step-time bound.  A fourth program interleaves the gather in L-chunks
with the matmul chain at the HLO level to give the scheduler explicit
interleaving opportunities, in case monolithic ops serialize trivially.

Timing per the repo convention (docs/DESIGN.md): chained iterations —
every iteration's inputs depend on the previous outputs — synced by a
VALUE fetch, because block_until_ready can return early on the tunnel
backend.  All big operands ride as jit ARGUMENTS (a closure capture
bakes the 1.28 GB table into the module as a constant and stalls the
tunnel compile — the gather_cost_fn_probe lesson) and are generated
ON DEVICE (host->device through the tunnel is slow).  Run from the
repo root (axon plugin registration).
"""

import time

import numpy as np

V = 10_000_000
D = 64
B = 8192
L = 400
MM_N = 2048          # matmul width: one (B,2048)x(2048,2048) ~ 0.7 ms
MAX_K = 256          # chain-length ceiling (same weight reused)
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    @jax.jit
    def make_data(key):
        ks = jax.random.split(key, 5)
        table = jax.random.normal(ks[0], (V, D), dtype=jnp.bfloat16)
        ids = jax.random.randint(ks[1], (B, L), 0, V, dtype=jnp.int32)
        query = jax.random.normal(ks[2], (B, D), dtype=jnp.bfloat16)
        x = jax.random.normal(ks[3], (B, MM_N), dtype=jnp.bfloat16)
        # ONE weight, reused: the relu between reps keeps XLA from
        # folding the chain, and x changes every rep
        w = jax.random.normal(ks[4], (MM_N, MM_N), dtype=jnp.bfloat16) * 0.02
        return table, ids, query, x, w

    table, ids0, query, x0, w0 = make_data(jax.random.PRNGKey(0))
    jax.block_until_ready(table)
    print("data ready (on device)", flush=True)

    def gather_score(ids, tbl, q):
        """The scoring pass: fused row-gather + dot (topk_select.py)."""
        att = jnp.take(tbl, ids.reshape(-1), axis=0).reshape(B, L, D)
        return jnp.einsum("bld,bd->bl", att, q)

    def next_ids(s, ids):
        # data-dependent, nearly-free chaining: each iteration re-runs
        # the gather at shifted ids
        bump = jnp.min(s).astype(jnp.int32) & 0  # 0, but data-dependent
        return (ids + 1 + bump) % (V - 7)

    def mm_chain(x, w, k):
        for _ in range(k):
            x = jnp.maximum(x @ w, 0.01 * x)
        return x

    @jax.jit
    def f_noop(ids):
        # per-call dispatch/sync floor of the tunnel backend — the
        # quantity to subtract before reading overlap fractions
        return ids + 1, jnp.sum(ids[0, :4])

    @jax.jit
    def f_gather(ids, tbl, q):
        s = gather_score(ids, tbl, q)
        return next_ids(s, ids), jnp.sum(s, dtype=jnp.float32)

    def make_mxu(k):
        @jax.jit
        def f_mxu(x, w):
            y = mm_chain(x, w, k)
            return y, jnp.sum(y, dtype=jnp.float32)
        return f_mxu

    def make_both(k):
        @jax.jit
        def f_both(ids, x, tbl, q, w):
            s = gather_score(ids, tbl, q)
            y = mm_chain(x, w, k)
            return next_ids(s, ids), y, \
                jnp.sum(s, dtype=jnp.float32) + jnp.sum(y, dtype=jnp.float32)
        return f_both

    def make_interleaved(k, n_chunks=8):
        """Gather split into L-chunks, matmuls interspersed between
        them at trace order — maximal scheduler opportunity."""
        Lc = L // n_chunks

        @jax.jit
        def f_il(ids, x, tbl, q, w):
            tot = jnp.zeros((), jnp.float32)
            per_slot = max(1, k // n_chunks)
            wi = 0
            for c in range(n_chunks):
                idc = jax.lax.dynamic_slice_in_dim(ids, c * Lc, Lc, axis=1)
                att = jnp.take(tbl, idc.reshape(-1), axis=0)
                att = att.reshape(B, Lc, D)
                s = jnp.einsum("bld,bd->bl", att, q)
                tot = tot + jnp.sum(s, dtype=jnp.float32)
                for _ in range(min(per_slot, k - wi)):
                    x = jnp.maximum(x @ w, 0.01 * x)
                    wi += 1
            for _ in range(k - wi):
                x = jnp.maximum(x @ w, 0.01 * x)
            bump = (tot.astype(jnp.int32) & 0)
            return (ids + 1 + bump) % (V - 7), x, tot
        return f_il

    def bench_1(name, f, *args):
        a1, v = f(*args)
        float(v)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a1, v = f(a1, *args[1:])
        float(v)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:28s}: {dt:8.2f} ms", flush=True)
        return dt

    def bench_m(name, f):
        b1, v = f(x0, w0)
        float(v)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            b1, v = f(b1, w0)
        float(v)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:28s}: {dt:8.2f} ms", flush=True)
        return dt

    def bench_2(name, f):
        a1, b1, v = f(ids0, x0, table, query, w0)
        float(v)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a1, b1, v = f(a1, b1, table, query, w0)
        float(v)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:28s}: {dt:8.2f} ms", flush=True)
        return dt

    t_0 = bench_1("noop (dispatch floor)", f_noop, ids0)
    t_g = bench_1("gather_only", f_gather, ids0, table, query)

    # calibrate the matmul chain length so the MXU leg's COMPUTE time
    # (above the dispatch floor) matches the gather's
    t_mm8 = bench_m("mxu_only[k=8]", make_mxu(8))
    per_mm = max(0.02, (t_mm8 - t_0) / 8)
    k = max(8, min(MAX_K, int(round((t_g - t_0) / per_mm))))
    t_m = bench_m(f"mxu_only[k={k}]", make_mxu(k))
    # a half-length chain: can HALF the MXU work hide under one gather?
    kh = max(4, k // 2)
    t_mh = bench_m(f"mxu_only[k={kh}]", make_mxu(kh))

    t_b = bench_2(f"both[k={k}]", make_both(k))
    t_bh = bench_2(f"both[k={kh}]", make_both(kh))
    t_i = bench_2(f"interleaved[k={k}]", make_interleaved(k))

    # compute-time accounting above the shared dispatch floor
    g, m_, mh = t_g - t_0, t_m - t_0, t_mh - t_0
    for label, both, mm in (("full", t_b, m_), ("half", t_bh, mh),
                            ("interleaved", t_i, m_)):
        b = both - t_0
        lo, hi = max(g, mm), g + mm
        frac = (hi - b) / max(1e-9, hi - lo)
        print(f"{label:12s}: gather={g:.2f} mxu={mm:.2f} both={b:.2f} "
              f"max={lo:.2f} sum={hi:.2f} overlap_frac={frac:.2f}")


if __name__ == "__main__":
    main()
