"""Memory-bounded initializer for giant embedding tables.

Why: ``jax.random.normal(key, (V, W))`` materializes O(V*W) fp32 +
uint32 temporaries during generation.  At pod vocabularies (100M rows)
that is ~50 GB of transients even though each device's row shard fits
comfortably; and on the 8-virtual-device CPU mesh every "device" shares
host RAM, so the pod drill measured 16.8 GB peak host RSS for a 0.51 GB
table (VERDICT r3 weak #6, docs/POD_DRILL.json).  XLA's SPMD partitioner
does NOT partition the generation here — measured on the virtual mesh:
``out_shardings`` 17.2 GB, ``with_sharding_constraint`` 16.9 GB,
explicit-mesh ``out_sharding=`` 16.6 GB, unrolled chunk chain 23.9 GB
(the CPU allocator keeps every chain buffer live), in-jit fori chunks
15.3 GB (SPMD reshards the carry).  The only form with bounded memory
is manual sharding: ``shard_map`` + ``fori_loop`` = **2.6 GB** peak.

Design: the table is defined on a FIXED global chunk grid — chunk g
holds rows [g*C, (g+1)*C) drawn from ``fold_in(key, g)`` — with
``n_chunks`` = the largest power of two <= 256 dividing V.  Values are
a pure function of (key, V), independent of the mesh: a shard covering
rows [s*S, (s+1)*S) generates exactly its own chunks (m | n_chunks for
any power-of-two model axis m, since m | V), so 1-device and n-device
runs initialize bit-identically (verified; the trajectory parity tests
in tests/test_parallel_full_model.py rely on it).

The reference initializes its tables with torch's nn.Embedding default
N(0,1) (src/models/dare.py:89-90); the distribution here is identical,
only the stream differs (as it already did between torch and JAX).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Chunked generation kicks in above this many rows; below it the plain
# one-shot draw is cheaper to compile and its temps are small.  The
# SAME threshold governs the plain and sharded forms — the value grid
# is a function of (key, V) only, so any mesh (including 1 device)
# initializes bit-identically.  The chunked fori program costs a one-
# time cold compile (~2 min for the 128-chunk 10M-row grid on a busy
# host); the persistent compile cache (utils/compile_cache.py)
# amortizes it across runs.
_CHUNK_THRESHOLD_ROWS = 1_048_576


def table_chunk_grid(rows: int) -> int:
    """Number of generation chunks: largest power of two <= 256 dividing
    ``rows`` (1 if rows is odd — such tables cannot row-shard anyway)."""
    n = 256
    while n > 1 and rows % n:
        n //= 2
    return n


def _chunked_draw(key, rows: int, width: int, dtype, stddev: float,
                  n_chunks: int, g0=0):
    """fori_loop over ``n_chunks`` grid chunks starting at global chunk
    index ``g0`` (traced ok), writing into one loop-carried buffer —
    the carry is aliased in place by XLA, so peak transient memory is
    one chunk's generation temps."""
    C = rows // n_chunks
    std = jnp.asarray(stddev, dtype)

    def gen(j, out):
        sub = jax.random.normal(
            jax.random.fold_in(key, g0 + j), (C, width), dtype
        ) * std
        return jax.lax.dynamic_update_slice(out, sub, (j * C, 0))

    return jax.lax.fori_loop(
        0, n_chunks, gen, jnp.zeros((rows, width), dtype)
    )


def chunked_normal_init(stddev: float, dtype):
    """Flax-style initializer: N(0, stddev) drawn on the global chunk
    grid.  For tables at or below the chunk threshold it is exactly
    ``nn.initializers.normal(stddev, dtype)``."""

    def init(key, shape, dtype=dtype):
        if len(shape) != 2 or shape[0] <= _CHUNK_THRESHOLD_ROWS:
            return jax.random.normal(key, shape, dtype) * jnp.asarray(
                stddev, dtype
            )
        rows, width = shape
        n = table_chunk_grid(rows)
        # NB: the fori form's cold compile is slow on the tunnel
        # backend (~70-140 s at 32-128 trips for a (10M, 128) table; a
        # vmapped batched draw OOMs the chip instead) — a one-time cost
        # the persistent compile cache (utils/compile_cache.py)
        # amortizes; warm init is ~14 s at flagship shapes.
        return _chunked_draw(key, rows, width, dtype, stddev, n)

    return init


def sharded_chunked_normal_init(stddev: float, dtype, mesh: Mesh,
                                axis: str = "model"):
    """Same values as ``chunked_normal_init`` (same global grid), but
    each mesh shard generates only its own chunks under ``shard_map`` —
    the ONLY form whose per-device peak is O(shard + one chunk) (see
    module docstring; SPMD replicates every automatic form)."""
    m = int(mesh.shape[axis])

    def init(key, shape, dtype=dtype):
        if len(shape) != 2 or shape[0] <= _CHUNK_THRESHOLD_ROWS or m == 1:
            return chunked_normal_init(stddev, dtype)(key, shape, dtype)
        rows, width = shape
        n = table_chunk_grid(rows)
        if n % m:
            # mesh axis doesn't divide the grid (non-power-of-two axis);
            # the automatic path still produces the right values
            return chunked_normal_init(stddev, dtype)(key, shape, dtype)
        S, per = rows // m, n // m

        def body(k):
            s = jax.lax.axis_index(axis)
            return _chunked_draw(k, S, width, dtype, stddev, per, g0=s * per)

        fn = jax.shard_map(
            body, mesh=mesh, in_specs=P(),
            out_specs=P(axis, None),
            # every data-replica computes identical values (pure fn of
            # the replicated key) — unprovable for the static checker
            check_vma=False,
        )
        return fn(key)

    return init
