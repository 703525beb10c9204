"""LR schedule (reference: src/utils/sched.py:3-11).

The reference writes ``cosine_warmup_lr(epoch-1, step, ...)`` straight
into the optimizer's param group each step (train.py:155-156); with
``gstep = (epoch-1)*steps_per_epoch + step`` that is a pure function of
the global step, which is exactly how optax consumes it.
"""

from __future__ import annotations

import math


def cosine_warmup_lr(
    epoch: int,
    step: int,
    steps_per_epoch: int,
    base_lr: float,
    warmup_epochs: int = 1,
    total_epochs: int = 10,
) -> float:
    gstep = epoch * steps_per_epoch + step
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = total_epochs * steps_per_epoch
    if gstep < warmup_steps:
        return base_lr * (gstep + 1) / max(1, warmup_steps)
    progress = (gstep - warmup_steps) / max(1, total_steps - warmup_steps)
    return 0.5 * base_lr * (1.0 + math.cos(math.pi * progress))


def make_lr_schedule(base_lr: float, warmup_steps: int, total_steps: int, cosine: bool = True):
    """optax schedule fn of the global step, identical to
    ``cosine_warmup_lr`` with gstep = step."""
    import jax.numpy as jnp

    warmup_steps = max(1, int(warmup_steps))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / warmup_steps
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        if cosine:
            decay = 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * progress))
        else:
            decay = jnp.asarray(base_lr, jnp.float32)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule
