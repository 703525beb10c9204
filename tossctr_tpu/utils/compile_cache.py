"""Persistent XLA compilation cache (VERDICT r2 #5).

The flagship step takes minutes to trace+compile cold on TPU; the
reference has no equivalent cost (torch eager).  Enabling JAX's
persistent compilation cache makes every warm run (re-bench, resumed
training, config-identical folds) skip compilation entirely.

Call ``enable_compile_cache()`` before the first jit compilation; it is
idempotent and safe to call from bench.py, the trainer, and the graft
entry.  The default location is ``~/.cache/tossctr_jax`` and can be
overridden with ``TOSSCTR_COMPILE_CACHE`` (set it to ``0``/``off`` to
disable).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/tossctr_jax")
_enabled = False


def default_cache_dir() -> str:
    """The directory enable_compile_cache() would use (no side effects)."""
    env = os.environ.get("TOSSCTR_COMPILE_CACHE")
    if env and env.lower() not in ("0", "off", "false", "no"):
        return env
    return _DEFAULT_DIR


# evaluated at import for scripts that manage the cache on disk
CACHE_DIR = default_cache_dir()


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.  Returns the
    cache dir, or None when disabled via TOSSCTR_COMPILE_CACHE=0.

    TPU backends only by default: XLA:CPU persists AOT machine code
    whose feature baseline may not match a later host (the loader warns
    about possible SIGILL), and CPU compiles are cheap anyway.  Set
    TOSSCTR_COMPILE_CACHE=<dir> explicitly to force it on CPU."""
    global _enabled
    env = os.environ.get("TOSSCTR_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "false", "no"):
        return None
    cache_dir = path or env or _DEFAULT_DIR
    if _enabled:
        return cache_dir
    import jax

    if jax.default_backend() not in ("tpu", "axon") and not (path or env):
        return None

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program (default only caches compiles >1s / >64KB)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
