"""PartitionSpec registry: which parameter lives where.

Layout (SURVEY.md §2.5 / BASELINE.json north star):

  * big embedding tables — DARE ``emb_att``/``emb_rep`` and the grouped
    categorical ``table_*`` — are ROW-SHARDED over the ``model`` axis:
    ``PartitionSpec('model', None)`` (each shard owns a contiguous row
    range; lookups exchange over ICI).
  * every dense-tower parameter is replicated (data-parallel); XLA
    all-reduces their gradients over ``data``.
  * batches are sharded over ``data`` on the leading (batch) dim.

Optimizer state inherits its parameter's sharding automatically (it is
built by tree_map over params), except scalar counters which stay
replicated — ``state_shardings`` resolves this structurally.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# substrings marking row-shardable embedding tables (matches
# train/trainer.py's optimizer labeling).  The DARE sequence tables
# (SEQ_MARKERS) are the multi-GB memory drivers and always row-shard;
# the grouped categorical tables (CAT_MARKER) are small (tens of MB at
# reference bucket sizes, which are primes — never divisible by a mesh
# axis anyway) and REPLICATE by default: their gradients ride the dense
# psum the towers already pay, and no per-step lookup collective exists
# at all.  ``mesh.cat_sharding: row`` opts into row-sharding + the
# explicit exchange for genuinely huge cat tables.
SEQ_MARKERS = ("emb_att", "emb_rep", "emb_tables")
CAT_MARKER = "table_"
EMB_MARKERS = SEQ_MARKERS + (CAT_MARKER,)


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def spec_for_param(
    path, leaf, shard_embeddings: bool, model_size: int = 1,
    shard_cat_tables: bool = False,
) -> P:
    name = _path_name(path)
    is_seq = any(m in name for m in SEQ_MARKERS)
    is_cat = CAT_MARKER in name
    wants_shard = (is_seq and shard_embeddings) or (is_cat and shard_cat_tables)
    if wants_shard:
        rows = leaf.shape[0] if getattr(leaf, "ndim", 0) >= 1 else 0
        if rows % max(model_size, 1):
            # row count not divisible by the model axis (e.g. a 503-row
            # hashed cat table on a 2-way axis): replicate.  Only tiny
            # tables hit this; the big tables are sized divisible.
            return P()
        if leaf.ndim == 2:
            return P(MODEL_AXIS, None)
        if leaf.ndim == 1 and rows > 1024:
            # per-row optimizer statistics (e.g. rowwise-AdaGrad accum
            # (V,)) shard with their table's rows; the 1024 floor keeps
            # tiny per-table scalars/vectors replicated
            return P(MODEL_AXIS)
    return P()  # replicated


def param_shardings(
    mesh: Mesh, params: Any, shard_embeddings: bool = True,
    shard_cat_tables: bool = False,
):
    """NamedSharding pytree for model params."""
    m = mesh.shape[MODEL_AXIS]
    shard = shard_embeddings and m > 1
    shard_cat = shard_cat_tables and m > 1

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, spec_for_param(path, leaf, shard, m, shard_cat)
        ),
        params,
    )


def state_shardings(
    mesh: Mesh, state: Any, params_sharding: Any, shard_cat_tables: bool = False
):
    """Shardings for a TrainState: params use the registry; optimizer /
    EMA / sparse-table-optimizer entries are resolved BY PATH with the
    same registry rules — optax moments and EMA shadows preserve the
    parameter key names (e.g. ``.../mu/params/dare/emb_att``), so the
    marker match applies to them directly.  Everything else (step
    counters, schedule state) is replicated.

    Path-based (not shape-based) so two same-shaped parameters with
    different specs can never collide (VERDICT r1 weak #3)."""
    shard = any(
        getattr(sh, "spec", P()) != P()
        for sh in jax.tree_util.tree_leaves(
            params_sharding, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
    )

    m = mesh.shape[MODEL_AXIS]
    shard_cat = shard_cat_tables and m > 1
    rest = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, spec_for_param(path, leaf, shard, m, shard_cat)
        ),
        state._replace(params=None),
    )
    return rest._replace(params=params_sharding)


def registry_shardings_fn(
    mesh: Mesh, shard_embeddings: bool = True, shard_cat_tables: bool = False
):
    """-> fn(key: str, shape: tuple) -> NamedSharding, applying the same
    registry rules as :func:`spec_for_param` to a flattened key path.
    Used to restore sharded checkpoints straight into their mesh layout
    without materializing params first (infer at pod scale)."""
    m = mesh.shape[MODEL_AXIS]
    shard = shard_embeddings and m > 1
    shard_cat = shard_cat_tables and m > 1

    class _Leaf:
        def __init__(self, shape):
            self.shape = tuple(shape)
            self.ndim = len(shape)

    def fn(key: str, shape) -> NamedSharding:
        path = tuple(type("K", (), {"key": p})() for p in key.split("/"))
        return NamedSharding(
            mesh, spec_for_param(path, _Leaf(shape), shard, m, shard_cat)
        )

    return fn


def batch_sharding(mesh: Mesh):
    """Batch dict sharding: leading dim over 'data'."""
    def make(spec_rank):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (spec_rank - 1))))

    class _BatchShard:
        def __call__(self, batch):
            return {
                k: jax.device_put(np.asarray(v), make(np.asarray(v).ndim))
                for k, v in batch.items()
            }

        def sharding_for(self, arr):
            return make(np.asarray(arr).ndim)

    return _BatchShard()
