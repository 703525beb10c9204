"""Row-sharded embedding lookup over the ``model`` mesh axis.

The classic sparse-embedding exchange (SURVEY.md §2.5): each shard owns
a contiguous row range of the table; for a lookup, every shard gathers
the rows it owns (out-of-range ids masked to zero) and a ``psum`` over
the ``model`` axis assembles the full embeddings.  Autodiff through
shard_map gives the correct backward for free: the psum's cotangent
broadcasts to every shard, the mask zeroes foreign rows, and the gather
transpose scatter-adds into the *local* table shard — i.e., gradients
never materialize the full table on one device.

This mask-gather-psum form moves B*L*D activation bytes over ICI per
shard, independent of the number of shards, and needs no duplicate-id
handling.  An id-exchange (all_to_all) variant that moves only unique
ids + their rows is the planned optimization for very long sequences;
the psum form is the correctness baseline it will be tested against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _local_lookup(local_table, ids, axis_name: str):
    """Gather locally-owned rows, zero elsewhere; psum to assemble."""
    rows = local_table.shape[0]
    shard = jax.lax.axis_index(axis_name)
    lo = shard * rows
    li = ids - lo
    ok = (li >= 0) & (li < rows)
    e = jnp.take(local_table, jnp.clip(li, 0, rows - 1), axis=0)
    e = jnp.where(ok[..., None], e, jnp.zeros((), e.dtype))
    return jax.lax.psum(e, axis_name)


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    shard_batch: bool = True,
) -> jnp.ndarray:
    """table (V, D) sharded P('model', None); ids (..., ) int — batch dim
    optionally sharded over 'data'.  Returns embeddings (..., D) with the
    ids' batch sharding, replicated over 'model'."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jnp.take(table, ids, axis=0)

    ids_spec = (
        P(DATA_AXIS, *([None] * (ids.ndim - 1))) if shard_batch else P(*([None] * ids.ndim))
    )
    out_spec = P(*(ids_spec + (None,)))

    fn = jax.shard_map(
        partial(_local_lookup, axis_name=MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), ids_spec),
        out_specs=out_spec,
    )
    return fn(table, ids)
