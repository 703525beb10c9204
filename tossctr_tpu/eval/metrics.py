"""Competition metrics: AP, 50:50 weighted logloss, composite Score, and
fold-ensembling (reference: src/utils/metrics.py).

Two implementations of average precision:

  * ``ap_score`` — host-side, delegates to sklearn for exact parity with
    the reference (src/utils/metrics.py:18-24), with the same degenerate
    guards and nan/clip handling.
  * ``average_precision_jax`` — device-side sorted cumulative-precision
    implementation with tie handling, for fast eval at pod scale
    (SURVEY.md §7 "AP at 10M+ rows").  Agrees with sklearn to float
    tolerance (tests/test_metrics.py).

``final_score`` reproduces the reference's literal composite
``0.5*AP + 0.5*WLL`` (WLL being a *loss* — see the §6 caveat in
SURVEY.md); the competition-style ``0.5*AP + 0.5/(1+WLL)`` is available
via ``formula="competition"``.
"""

from __future__ import annotations

import numpy as np


def weighted_logloss_50_50(y_true: np.ndarray, y_prob: np.ndarray, eps: float = 1e-12) -> float:
    """0.5·mean NLL over positives + 0.5·mean NLL over negatives
    (reference: src/utils/metrics.py:5-16)."""
    y_true = np.asarray(y_true).astype(np.float64, copy=False)
    y_prob = np.nan_to_num(np.asarray(y_prob), nan=0.5, posinf=1.0, neginf=0.0)
    y_prob = np.clip(y_prob.astype(np.float64, copy=False), eps, 1 - eps)
    pos = y_true == 1
    neg = ~pos
    if pos.sum() == 0 or neg.sum() == 0:
        return float("nan")
    pos_loss = -np.log(y_prob[pos]).mean()
    neg_loss = -np.log(1.0 - y_prob[neg]).mean()
    return float(0.5 * (pos_loss + neg_loss))


def ap_score(y_true: np.ndarray, y_prob: np.ndarray) -> float:
    """sklearn average precision with the reference's degenerate-label guard
    (src/utils/metrics.py:18-24)."""
    from sklearn.metrics import average_precision_score

    y_true = np.asarray(y_true)
    if float(y_true.mean()) in (0.0, 1.0) or len(np.unique(y_true)) < 2:
        return 0.0
    y_prob = np.nan_to_num(np.asarray(y_prob), nan=0.5, posinf=1.0, neginf=0.0)
    y_prob = np.clip(y_prob, 1e-12, 1 - 1e-12)
    return float(average_precision_score(y_true, y_prob))


def final_score(y_true, y_prob, formula: str = "reference"):
    """-> (ap, wll, score).  ``formula='reference'`` reproduces the literal
    reference behaviour score = 0.5*AP + 0.5*WLL (src/utils/metrics.py:26-29)."""
    ap = ap_score(y_true, y_prob)
    wll = weighted_logloss_50_50(y_true, y_prob)
    if formula == "competition":
        score = 0.5 * ap + 0.5 / (1.0 + wll)
    else:
        score = 0.5 * ap + 0.5 * wll
    return ap, wll, score


# --------------------------------------------------------------------------
# Device-side AP
# --------------------------------------------------------------------------


def average_precision_jax(y_true, y_score):
    """Average precision on device, tie-aware, matching
    sklearn.metrics.average_precision_score.

    AP = sum_t (R_t - R_{t-1}) * P_t over distinct-score thresholds, with
    precision/recall evaluated at the *last* element of each tie run in
    descending-score order.  O(N log N) sort + O(N) scans; no host sync.
    """
    import jax
    import jax.numpy as jnp

    y_true = jnp.asarray(y_true, jnp.float32).ravel()
    # same sanitation as the host path (ap_score): NaN -> 0.5, ±inf
    # clipped, so device metrics can't diverge on non-finite predictions
    y_score = jnp.clip(
        jnp.nan_to_num(
            jnp.asarray(y_score, jnp.float32), nan=0.5, posinf=1.0, neginf=0.0
        ),
        0.0,
        1.0,
    ).ravel()
    n = y_true.shape[0]
    order = jnp.argsort(-y_score)
    ys = y_true[order]
    ss = y_score[order]
    tp = jnp.cumsum(ys)
    total_pos = tp[-1]
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    precision = tp / idx
    recall = tp / jnp.maximum(total_pos, 1.0)
    # last element of each tie run
    keep = jnp.concatenate([ss[1:] != ss[:-1], jnp.ones((1,), bool)])
    # recall at the previous kept threshold: recall is nondecreasing, so the
    # previous kept value is the running max of masked recalls, shifted by 1.
    masked = jnp.where(keep, recall, 0.0)
    prev_kept = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jax.lax.cummax(masked)[:-1]]
    )
    ap = jnp.sum(jnp.where(keep, (recall - prev_kept) * precision, 0.0))
    return jnp.where(total_pos > 0, ap, 0.0)


def final_score_device(y_true, y_prob, formula: str = "reference"):
    """AP/WLL/Score computed fully on device (one jit program); returns
    python floats.  Matches the host path to float tolerance."""
    import jax

    @jax.jit
    def _compute(y, p):
        ap = average_precision_jax(y, p)
        wll = weighted_logloss_50_50_jax(y, p)
        return ap, wll

    ap, wll = _compute(y_true, y_prob)
    ap, wll = float(ap), float(wll)
    if formula == "competition":
        return ap, wll, 0.5 * ap + 0.5 / (1.0 + wll)
    return ap, wll, 0.5 * ap + 0.5 * wll


def weighted_logloss_50_50_jax(y_true, y_prob, eps: float = 1e-12):
    """Device WLL.  Runs in float32 (TPU), so the clip floor saturates at
    1e-7 — the host path's 1e-12 is not representable next to 1.0 in
    f32; predictions that extreme only arise from non-finite inputs."""
    import jax.numpy as jnp

    y = jnp.asarray(y_true, jnp.float32).ravel()
    eps32 = max(float(eps), 1e-7)
    p = jnp.nan_to_num(
        jnp.asarray(y_prob, jnp.float32), nan=0.5, posinf=1.0, neginf=0.0
    )
    p = jnp.clip(p, eps32, 1.0 - eps32).ravel()
    pos = y == 1
    npos = jnp.maximum(jnp.sum(pos), 1)
    nneg = jnp.maximum(jnp.sum(~pos), 1)
    pos_loss = jnp.sum(jnp.where(pos, -jnp.log(p), 0.0)) / npos
    neg_loss = jnp.sum(jnp.where(~pos, -jnp.log(1.0 - p), 0.0)) / nneg
    return 0.5 * (pos_loss + neg_loss)


# --------------------------------------------------------------------------
# Fold ensembling (reference: src/utils/metrics.py:32-86) — NumPy, no torch.
# --------------------------------------------------------------------------


def _safe_prob_to_logit(p: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    p = np.clip(p, eps, 1 - eps)
    return np.log(p) - np.log1p(-p)


def _rank_avg_stack(p_list) -> np.ndarray:
    ranks = []
    for p in p_list:
        order = np.argsort(p)
        r = np.empty_like(p)
        r[order] = np.arange(p.size, dtype=p.dtype)
        r = (r + 1.0) / (p.size + 1.0)
        ranks.append(r)
    return np.stack(ranks, 0).mean(0)


def ensemble_probs(method, p_list, z_list=None, weights=None, trim_ratio: float = 0.0):
    """method: mean | logit_mean | geom_mean | median | trim_mean | rank_avg | weighted."""
    p_list = [np.asarray(p, dtype=np.float64).ravel() for p in p_list]
    M = len(p_list)
    P = np.stack(p_list, 0)  # (M, B)
    w = None
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()

    if method == "mean":
        return P.mean(0) if w is None else (P * w[:, None]).sum(0)
    if method == "geom_mean":
        logP = np.log(np.clip(P, 1e-7, 1 - 1e-7))
        m = logP.mean(0) if w is None else (logP * w[:, None]).sum(0)
        return np.exp(m)
    if method == "logit_mean":
        L = _safe_prob_to_logit(P)
        Lm = L.mean(0) if w is None else (L * w[:, None]).sum(0)
        return 1.0 / (1.0 + np.exp(-Lm))
    if method == "median":
        return np.median(P, 0)
    if method == "trim_mean":
        k = int(max(0, min(M // 2, round(M * trim_ratio))))
        if k == 0:
            return P.mean(0)
        Ps = np.sort(P, axis=0)
        return Ps[k : M - k].mean(0)
    if method == "rank_avg":
        return _rank_avg_stack(p_list)
    if method == "weighted":
        assert w is not None, "weights required for method='weighted'"
        return (P * w[:, None]).sum(0)
    raise ValueError(f"Unknown ensemble method: {method}")


def val_weighted_weights(scores, temperature: float = 10.0) -> np.ndarray:
    """softmax(fold scores / T) weights for method='val_weighted'
    (reference: src/infer.py:135-149)."""
    s = np.asarray(scores, dtype=np.float64) / max(1e-6, float(temperature))
    s = s - s.max()
    e = np.exp(s)
    return e / e.sum()
