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
# train/trainer.py's optimizer labeling)
EMB_MARKERS = ("emb_att", "emb_rep", "table_")


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def spec_for_param(path, leaf, shard_embeddings: bool) -> P:
    name = _path_name(path)
    if (
        shard_embeddings
        and any(m in name for m in EMB_MARKERS)
        and getattr(leaf, "ndim", 0) == 2
    ):
        return P(MODEL_AXIS, None)
    return P()  # replicated


def param_shardings(mesh: Mesh, params: Any, shard_embeddings: bool = True):
    """NamedSharding pytree for model params."""
    shard = shard_embeddings and mesh.shape[MODEL_AXIS] > 1

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_param(path, leaf, shard)),
        params,
    )


def state_shardings(mesh: Mesh, state: Any, params_sharding: Any):
    """Shardings for a TrainState: params use the registry; optimizer/EMA
    entries mirror the sharding of the parameter they track (identified
    structurally by shape), scalars are replicated."""
    # collect (shape -> sharding) of 'model'-sharded params
    sharded_shapes = {}
    for sh, leaf in zip(
        jax.tree_util.tree_leaves(params_sharding),
        jax.tree_util.tree_leaves(state.params),
    ):
        if sh.spec != P():
            sharded_shapes[tuple(leaf.shape)] = sh
    rep = NamedSharding(mesh, P())

    def assign(leaf):
        if hasattr(leaf, "shape") and tuple(leaf.shape) in sharded_shapes:
            return sharded_shapes[tuple(leaf.shape)]
        return rep

    ps = params_sharding
    rest = jax.tree_util.tree_map(assign, state._replace(params=None))
    return rest._replace(params=ps)


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
