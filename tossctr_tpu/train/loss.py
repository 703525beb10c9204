"""Training losses (reference: src/train.py:27-90).

All losses are pure jnp functions safe under jit: the reference's
boolean-indexing branches (``logits[pos]``) become masked reductions
with the same empty-class semantics (an absent class contributes 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_wll_style(logits: jnp.ndarray, labels: jnp.ndarray, valid=None) -> jnp.ndarray:
    """WLL(50:50) = 0.5*mean_pos softplus(-z) + 0.5*mean_neg softplus(z)
    (reference train.py:71-90).  ``valid`` optionally masks padded rows."""
    z = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    pos = y > 0.5
    neg = ~pos
    if valid is not None:
        v = valid.astype(bool)
        pos = pos & v
        neg = neg & v
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    pos_loss = jnp.sum(jnp.where(pos, jax.nn.softplus(-z), 0.0)) / jnp.maximum(n_pos, 1)
    neg_loss = jnp.sum(jnp.where(neg, jax.nn.softplus(z), 0.0)) / jnp.maximum(n_neg, 1)
    pos_loss = jnp.where(n_pos > 0, pos_loss, 0.0)
    neg_loss = jnp.where(n_neg > 0, neg_loss, 0.0)
    return 0.5 * (pos_loss + neg_loss)


def logit_l2(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean squared logit regularizer (reference train.py:27-28)."""
    return jnp.mean(logits.astype(jnp.float32) ** 2)


def pairwise_auc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    num_neg_per_pos: int = 8,
    hard_frac: float = 0.0,
    valid=None,
) -> jnp.ndarray:
    """In-batch BPR/logistic pairwise loss with optional hard negatives
    (reference train.py:30-68; defined there but its invocation is
    commented out — provided for the optional ``loss.lambda_rank``).

    jit-safe reformulation with static shapes: every row is paired with
    ``num_neg_per_pos`` sampled negatives; pair (i, j) contributes
    softplus(-(z_i - z_j)) weighted by pos_i * neg_j, normalized by the
    realized pair count.  ``hard_frac`` mixes in top-logit negatives.
    """
    z = logits.astype(jnp.float32).ravel()
    y = labels.astype(jnp.float32).ravel() > 0.5
    B = z.shape[0]
    r = max(1, int(num_neg_per_pos))

    neg_mask = ~y
    if valid is not None:
        # padded rows of a partial batch are neither positives nor
        # negatives: excluded from the categorical draw, the hard-neg
        # top-k, and the pair weights entirely
        v = valid.ravel().astype(bool)
        y = y & v
        neg_mask = neg_mask & v
    n_neg = jnp.sum(neg_mask)
    # categorical sample over negatives (uniform with replacement)
    logits_neg = jnp.where(neg_mask, 0.0, -jnp.inf)
    idx_rand = jax.random.categorical(rng, logits_neg[None, :], shape=(B, r))
    if hard_frac > 0.0:
        k_hard = max(1, int(hard_frac * r))
        z_neg = jnp.where(neg_mask, z, -jnp.inf)
        _, hard_idx = jax.lax.top_k(z_neg, k_hard)
        hard = jnp.broadcast_to(hard_idx[None, :], (B, k_hard))
        idx = jnp.concatenate([hard, idx_rand[:, : r - k_hard]], axis=1)
    else:
        idx = idx_rand
    z_j = z[idx]  # (B, r)
    w = (y.astype(jnp.float32)[:, None]) * (neg_mask[idx].astype(jnp.float32))
    margin = z[:, None] - z_j
    total = jnp.sum(w)
    loss = jnp.sum(w * jax.nn.softplus(-margin)) / jnp.maximum(total, 1.0)
    any_pair = (jnp.sum(y) > 0) & (n_neg > 0)
    return jnp.where(any_pair, loss, 0.0)
