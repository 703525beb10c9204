"""QNN-alpha multi-head low-rank FM crosses.

Reference (src/models/qnn_alpha.py:86-97) loops over heads in Python,
each head doing (B,F,D)@(D,r) -> FM trick -> (B,r)@(r,P).  Here all
heads run in two batched einsums — one (B,F,D)x(H,D,R) contraction and
one (B,H,R)x(H,R,P) contraction — which XLA maps onto the MXU as two
large batched matmuls (SURVEY.md §3 hot-loop #3).

FM identity per head: with A = z @ U_h (B,F,R),
    quad = (sum_f A)^2 - sum_f A^2  =  2 * sum_{i<j} a_i ∘ a_j
i.e. the pairwise-cross aggregate without forming F^2 pairs.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def fm_cross_multihead(z: jnp.ndarray, U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """z: (B,F,D), U: (H,D,R), V: (H,R,P) -> (B, H*P)."""
    B = z.shape[0]
    H, _, P = V.shape
    A = jnp.einsum("bfd,hdr->bhfr", z, U)  # (B,H,F,R)
    s = A.sum(axis=2)  # (B,H,R)
    quad = s * s - (A * A).sum(axis=2)  # (B,H,R)
    out = jnp.einsum("bhr,hrp->bhp", quad, V)  # (B,H,P)
    return out.reshape(B, H * P)


def fm_cross_blocked(
    z: jnp.ndarray,
    U: jnp.ndarray,
    V: jnp.ndarray,
    block_slices: Dict[str, Tuple[int, int]],
) -> jnp.ndarray:
    """pair_grouping='block': sum of per-block crosses, skipping
    single-feature blocks (reference qnn_alpha.py:99-107)."""
    outs = []
    for _, (s, e) in block_slices.items():
        if e - s <= 1:
            continue
        outs.append(fm_cross_multihead(z[:, s:e, :], U, V))
    if not outs:
        return fm_cross_multihead(z, U, V)
    return sum(outs[1:], outs[0])
