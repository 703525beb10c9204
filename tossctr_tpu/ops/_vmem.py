"""Per-kernel Mosaic VMEM limit override.

Mosaic's default scoped-VMEM budget is 16 MB; kernels whose working set
exceeds it are rejected at compile time (the round-2 attention campaign
hit this at batch-block 64: 16.82 MB scoped).  The global XLA flag
``--xla_tpu_scoped_vmem_limit_kib`` is not accepted by every backend
(the axon tunnel rejects it), but Pallas exposes the same knob
per-kernel via ``pltpu.CompilerParams(vmem_limit_bytes=...)`` — that is
what every pallas_call in this package routes through here.

``TOSSCTR_PALLAS_VMEM_MB`` overrides the limit (read at TRACE time);
unset uses ``_DEFAULT_MB``.  v5e has 128 MB of VMEM per core; leaving
headroom for XLA's own scoped allocations, 64 MB is a safe raise that
admits batch-block 64 in the packed attention kernels (measured: fwd
5.6 -> smaller per-launch overhead; see exp/attn_budget_probe.py).

The raise applies to EVERY pallas_call in the package, including
kernels that never needed it (FFN, scatter sweep, FM) — deliberate:
a uniform budget keeps the measured block-size tuning valid across
kernels, and on a TPU generation with less VMEM than v5e the single
env var (``TOSSCTR_PALLAS_VMEM_MB=0`` or a smaller value) restores
the backend default everywhere; the attention block heuristics read
the same switch and shrink their score budget to match
(pallas_attention._score_budget_bytes).
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu

_DEFAULT_MB = 64.0


def kernel_compiler_params() -> pltpu.CompilerParams | None:
    """CompilerParams raising the Mosaic VMEM budget, or None to keep
    the backend default (TOSSCTR_PALLAS_VMEM_MB=0 disables)."""
    mb = float(os.environ.get("TOSSCTR_PALLAS_VMEM_MB", _DEFAULT_MB))
    if mb <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb * 1024 * 1024))
