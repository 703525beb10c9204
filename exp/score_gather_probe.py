"""Probe: cheapest formulation of the DARE scoring pass on the
lane-fused (V, 2D) table.

The round-2 trace shows the scoring gather materializes the FULL
(B*L, 2D) fused rows (bf16[3276800,128], 39.6 ms/step at B=8192) even
though scoring only consumes the att half.  Candidates:

  a) current: take(t, ids)[..., :D] -> einsum           (full-row gather)
  b) sliced operand: take(t[:, :D], ids) -> einsum      (risk: (V,D) relayout copy)
  c) full-row gather + zero-padded query einsum         (same bytes, better fusion?)
  d) streaming select_chunk=64 over L (lax.scan merge)  (same bytes, no (B,L,D) peak)

Each compiled program chains on ids (ids+1 fed back) so the tunnel's
memoization cannot fake the timing; memory_analysis(temp bytes) flags
relayout copies before any device time is spent.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tossctr_tpu.ops.topk_select import _streaming_topk_ids, recency_log_decay

    B, L, V, D = 8192, 400, 10_000_000, 64
    K = 60
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(0, 1, (V, 2 * D)).astype(np.float32), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    q = jnp.asarray(rng.normal(0, 1, (B, D)).astype(np.float32))
    dec = recency_log_decay(L, 512.0)
    jax.block_until_ready((t, ids, q))

    def score_from(att, ids, q, dec):
        s = jnp.einsum("bld,bd->bl", att, q) + dec[None, :]
        s = jnp.where(ids == 0, -1e9, s)
        _, idx = jax.lax.top_k(s, K)
        return idx

    @jax.jit
    def a_full_row_slice(t, ids, q):
        rows = jnp.take(t, ids, axis=0).astype(jnp.float32)
        att = rows[..., :D] * (ids != 0)[..., None]
        return score_from(att, ids, q, dec).sum(), ids + 1

    @jax.jit
    def b_sliced_operand(t, ids, q):
        att = jnp.take(t[:, :D], ids, axis=0).astype(jnp.float32)
        att = att * (ids != 0)[..., None]
        return score_from(att, ids, q, dec).sum(), ids + 1

    @jax.jit
    def c_padded_query(t, ids, q):
        rows = jnp.take(t, ids, axis=0).astype(jnp.float32)
        rows = rows * (ids != 0)[..., None]
        qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=1)
        s = jnp.einsum("blc,bc->bl", rows, qp) + dec[None, :]
        s = jnp.where(ids == 0, -1e9, s)
        _, idx = jax.lax.top_k(s, K)
        return idx.sum(), ids + 1

    @jax.jit
    def d_streaming(t, ids, q):
        take = lambda tt, ii: jnp.take(tt, ii, axis=0)[..., :D]  # noqa: E731
        idx = _streaming_topk_ids(t, ids, q, dec, 0, K, 64, take)
        return idx.sum(), ids + 1

    for name, fn in [("a_full_row_slice", a_full_row_slice),
                     ("b_sliced_operand", b_sliced_operand),
                     ("c_padded_query", c_padded_query),
                     ("d_streaming_c64", d_streaming)]:
        t0 = time.time()
        lowered = fn.lower(t, ids, q)
        comp = lowered.compile()
        ma = comp.memory_analysis()
        tmp = getattr(ma, "temp_size_in_bytes", None)
        print(f"{name}: compile {time.time()-t0:.0f}s temp={tmp/1e9 if tmp else -1:.2f} GB",
              flush=True)
        out, ids2 = fn(t, ids, q)
        jax.block_until_ready(out)
        n, t0 = 10, time.time()
        cur = ids
        for _ in range(n):
            out, cur = fn(t, cur, q)
        jax.block_until_ready((out, cur))
        dt = (time.time() - t0) / n * 1e3
        print(f"{name}: {dt:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
