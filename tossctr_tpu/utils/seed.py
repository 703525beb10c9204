"""Seeding / determinism helpers (reference: src/utils/seed.py:3-17).

JAX is functionally deterministic under jit given fixed PRNG keys, so the
CUDA-specific knobs of the reference have no equivalent; what remains is
seeding the host-side RNGs (numpy drives the samplers / CV shuffles) and
threading an explicit `jax.random` key through dropout.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int, deterministic: bool = True) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    if deterministic:
        # XLA reductions are deterministic by default on TPU; make any GPU
        # fallback deterministic too.
        os.environ.setdefault("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] = (
                os.environ["XLA_FLAGS"] + " --xla_gpu_deterministic_ops=true"
            ).strip()


def prng_key(seed: int):
    import jax

    return jax.random.PRNGKey(seed)
