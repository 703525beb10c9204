"""TPU probe: how fast can we RMW the (10M, 64) embedding tables?

Round-1 trace: XLA's scatter-add costs ~42 ms/table/step (per-element
tile RMW) for 245k touched rows — ~40x off HBM speed-of-light.  This
probe measures the candidate replacements on the real chip:

  A. XLA scatter-add baseline (chained, donated — unchained timings
     through the axon tunnel are memoized and meaningless).
  B. Dense block-sweep RMW: grid over ALL (16, W) blocks of the table
     viewed as (V*D/W/16*16, W); out = in + marker, aliased.  Upper
     bound for "just sweep everything" scatter.
  C. Sparse superblock RMW: scalar-prefetched block ids drive the
     index_map; only touched superblocks move.  Measures step overhead
     + small-DMA throughput at several superblock widths.

Run: python exp/scatter_probe.py  (on the axon TPU; compiles are slow)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, D = 10_000_000, 64
N = 4096 * 60  # ids per step at flagship shapes
TDT = jnp.bfloat16


def timeit(fn, state, iters=10):
    state = fn(state)
    jax.block_until_ready(state)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters * 1000
    return dt, state


def probe_xla_scatter(table, ids, delta):
    @jax.jit
    def step(t):
        return t.at[ids].add(delta)

    dt, _ = timeit(step, table)
    print(f"A. XLA scatter-add {N} rows -> (V,D): {dt:.2f} ms")


def _sweep_kernel(tin, tout):
    tout[...] = tin[...] + jnp.asarray(0.001, tout.dtype)


def probe_dense_sweep(table, W):
    rows, lanes = V * D // W, W
    nblk = rows // 16
    view = table.reshape(rows, lanes)

    fn = pl.pallas_call(
        _sweep_kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((16, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), table.dtype),
        input_output_aliases={0: 0},
    )

    @jax.jit
    def step(t):
        return fn(t.reshape(rows, lanes)).reshape(V, D)

    dt, _ = timeit(step, table)
    gb = rows * lanes * 2 * 2 / 1e9
    print(
        f"B. dense sweep W={W} ({nblk} steps, {W//4} rows/block): "
        f"{dt:.2f} ms ({gb / (dt / 1000):.0f} GB/s r+w)"
    )


def _sparse_kernel(sb_ref, tin, tout):
    tout[...] = tin[...] + jnp.asarray(0.001, tout.dtype)


def probe_sparse(table, W, ids):
    rows, lanes = V * D // W, W
    rows_per_sb = 16 * W // D
    n_sb_total = V // rows_per_sb
    # touched superblocks, padded with repeats of the last (same-index
    # steps elide their DMAs)
    sb = np.unique(ids // rows_per_sb)
    ms = len(sb)
    cap = min(n_sb_total, N)
    sb_pad = np.full(cap, sb[-1], np.int32)
    sb_pad[:ms] = sb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((16, W), lambda i, sbr: (sbr[i], 0)),
        ],
        out_specs=pl.BlockSpec((16, W), lambda i, sbr: (sbr[i], 0)),
    )
    fn = pl.pallas_call(
        _sparse_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), table.dtype),
        input_output_aliases={1: 0},
    )

    @jax.jit
    def step(t):
        return fn(jnp.asarray(sb_pad), t.reshape(rows, lanes)).reshape(V, D)

    dt, _ = timeit(step, table)
    gb = ms * 16 * W * 2 * 2 / 1e9
    print(
        f"C. sparse RMW W={W} ({ms} touched sb of {n_sb_total}, {rows_per_sb} "
        f"rows/sb, grid {cap}): {dt:.2f} ms ({gb / (dt / 1000):.0f} GB/s moved)"
    )


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    table = jax.random.normal(key, (V, D), TDT) * 0.01
    jax.block_until_ready(table)
    print(f"table init: {time.perf_counter() - t0:.1f}s")
    rng = np.random.default_rng(0)
    ids_np = np.sort(rng.integers(1, V, N).astype(np.int32))
    ids = jnp.asarray(ids_np)
    delta = jnp.asarray(rng.normal(0, 1e-3, (N, D)).astype(np.float32)).astype(TDT)

    probe_xla_scatter(table, ids, delta)
    for W in (1024, 4096, 16384):
        probe_dense_sweep(table, W)
    for W in (1024, 4096, 16384):
        probe_sparse(table, W, ids_np)


if __name__ == "__main__":
    main()
