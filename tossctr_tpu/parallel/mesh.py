"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.5); this is
the communication backend of the TPU build: a single
``Mesh(('data','model'))`` over the slice.  Batch and data-parallel
gradients ride the ``data`` axis (XLA inserts psum over ICI); the big
embedding tables are row-sharded over ``model``.

Multi-host: call ``maybe_initialize_distributed()`` first (wraps
``jax.distributed.initialize`` behind env detection); the mesh then
spans all processes' devices and per-host feeding goes through
``jax.make_array_from_process_local_data`` (data/loader.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> bool:
    """Initialize the multi-host runtime when launched under a managed
    TPU pod env (JAX discovers coordinator/process ids itself)."""
    if int(os.environ.get("TOSSCTR_MULTIHOST", "0")):
        jax.distributed.initialize()
        return True
    return False


def mesh_axis_sizes(n_devices: int, data: int = -1, model: int = 1) -> Tuple[int, int]:
    """Resolve (-1 means 'all remaining') axis sizes; data*model must
    cover all devices."""
    model = max(1, model if model > 0 else 1)
    if data <= 0:
        assert n_devices % model == 0, (n_devices, model)
        data = n_devices // model
    assert data * model == n_devices, (
        f"mesh {data}x{model} != {n_devices} devices"
    )
    return data, model


def build_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    d, m = mesh_axis_sizes(len(devices), data, model)
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def build_mesh_from_cfg(cfg, devices: Optional[list] = None) -> Mesh:
    return build_mesh(cfg.mesh.data, cfg.mesh.model, devices)
