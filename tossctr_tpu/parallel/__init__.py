from .mesh import build_mesh, mesh_axis_sizes
from .sharding import batch_sharding, param_shardings, state_shardings
from .embedding import sharded_embedding_lookup

__all__ = [
    "build_mesh",
    "mesh_axis_sizes",
    "batch_sharding",
    "param_shardings",
    "state_shardings",
    "sharded_embedding_lookup",
]
