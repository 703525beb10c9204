"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path
(Mesh + shard_map + collectives) is exercised without TPU hardware —
the standard JAX trick (SURVEY.md §4c).

NOTE: this environment force-registers a TPU backend in every Python
process (sitecustomize sets JAX_PLATFORMS=axon and re-registers it even
if the env var is overridden), so the env var alone is NOT enough;
``jax.config.update('jax_platforms', 'cpu')`` after import is what
actually pins tests to CPU.  XLA_FLAGS must still be set before the
first backend use to get the 8 virtual devices.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
