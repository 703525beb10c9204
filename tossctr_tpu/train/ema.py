"""EMA shadow weights as a pytree, updated inside the jitted train step
(reference: src/utils/ema.py).

The reference keeps fp32 shadows keyed by parameter name with a decay
warmup schedule (linear/cosine/none), ``update_after_step`` /
``update_interval`` gating and a name-based ``param_filter``
(ema.py:72-131).  Here the shadow is a pytree the same shape as params;
gating and the schedule are branchless (`jnp.where`), so the whole
update lives inside one XLA program — no host round-trip per step.
The filter mask is *static* metadata (python bools resolved at trace
time), not state: it must not cross the jit boundary as data.

Eval-with-EMA needs no store/copy_to/restore dance (ema.py:133-165):
params are immutable, so evaluation simply applies ``ema_params(...)``.

The CPU-offload / pin-memory options are GPU VRAM workarounds with no
TPU equivalent (shadows live in HBM like everything else) and are
intentionally not reproduced.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any  # pytree of fp32 shadows
    num_updates: jnp.ndarray  # int32 scalar: realized EMA updates


def _name_of(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_ema_mask(params, param_filter: Optional[Sequence[str]] = None):
    """Static pytree of python bools: True = tracked (not filtered)."""
    filt = set(param_filter or [])
    if not filt:
        return jax.tree_util.tree_map(lambda p: True, params)
    return jax.tree_util.tree_map_with_path(
        lambda path, p: not any(f in _name_of(path) for f in filt), params
    )


def init_ema(params, mask=None) -> EmaState:
    """``mask``: static filter pytree from make_ema_mask.  Filtered-out
    leaves get a scalar placeholder instead of a full fp32 copy —
    shadowing a 10M-row table that is never updated would waste GBs of
    HBM.

    copy=True below: astype on an fp32 param would alias the param's
    buffer, which breaks donation in the jitted train step (same buffer
    donated twice via params and shadow)."""
    if mask is None:
        mask = jax.tree_util.tree_map(lambda _: True, params)
    shadow = jax.tree_util.tree_map(
        lambda p, m: jnp.array(p, dtype=jnp.float32, copy=True)
        if m
        else jnp.zeros((), jnp.float32),
        params,
        mask,
    )
    return EmaState(shadow=shadow, num_updates=jnp.zeros((), jnp.int32))


def decay_at(
    num_updates: jnp.ndarray,
    base_decay: float,
    warmup_steps: int,
    warmup_type: str,
) -> jnp.ndarray:
    """Reference ema.py:72-88: effective (1-decay) ramps down over warmup."""
    d = jnp.asarray(base_decay, jnp.float32)
    if warmup_steps <= 0 or warmup_type == "none":
        return d
    t = jnp.minimum(1.0, (num_updates.astype(jnp.float32) + 1.0) / warmup_steps)
    if warmup_type == "cosine":
        c = 0.5 * (1.0 + jnp.cos(jnp.pi * (1.0 - t)))
        dec = 1.0 - (1.0 - d) * c
    else:  # linear
        dec = 1.0 - (1.0 - d) * t
    return jnp.clip(dec, 0.0, 1.0)


def update_ema(
    ema: EmaState,
    params,
    global_step: jnp.ndarray,
    *,
    base_decay: float,
    warmup_steps: int = 0,
    warmup_type: str = "linear",
    update_after_step: int = 0,
    update_interval: int = 1,
    mask=None,
) -> EmaState:
    """Branchless EMA update called AFTER the optimizer step
    (reference ema.py:91-131).  ``mask`` is the static filter pytree
    from ``make_ema_mask`` (None = track everything)."""
    step = jnp.asarray(global_step, jnp.int32)
    after = jnp.asarray(update_after_step, jnp.int32)
    interval = jnp.asarray(max(1, update_interval), jnp.int32)
    do = (step >= after) & (((step - after) % interval) == 0)
    d = decay_at(ema.num_updates, base_decay, warmup_steps, warmup_type)
    one_minus = (1.0 - d) * do.astype(jnp.float32)  # no-op lerp when gated off

    def upd(s, p, m):
        if not m:
            return s
        return s * (1.0 - one_minus) + p.astype(jnp.float32) * one_minus

    if mask is None:
        mask = jax.tree_util.tree_map(lambda _: True, params)
    shadow = jax.tree_util.tree_map(upd, ema.shadow, params, mask)
    return EmaState(shadow=shadow, num_updates=ema.num_updates + do.astype(jnp.int32))


def ema_params(ema: EmaState, params, mask=None):
    """EMA weights in the params' dtypes; filtered entries fall back to
    the live params (reference copy_to keeps untracked tensors,
    ema.py:140-157)."""
    if mask is None:
        mask = jax.tree_util.tree_map(lambda _: True, params)
    return jax.tree_util.tree_map(
        lambda s, p, m: s.astype(p.dtype) if m else p, ema.shadow, params, mask
    )
