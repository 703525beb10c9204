import numpy as np
import pytest
from sklearn.metrics import average_precision_score

from tossctr_tpu.eval.metrics import (
    ap_score,
    average_precision_jax,
    ensemble_probs,
    final_score,
    val_weighted_weights,
    weighted_logloss_50_50,
)


def _rand(n=2000, seed=0, pos_rate=0.1):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < pos_rate).astype(np.int64)
    p = np.clip(rng.random(n) * 0.5 + y * rng.random(n) * 0.5, 0, 1)
    return y, p


def test_wll_matches_manual():
    y = np.array([1, 1, 0, 0])
    p = np.array([0.8, 0.6, 0.3, 0.1])
    expect = 0.5 * (-(np.log(0.8) + np.log(0.6)) / 2 - (np.log(0.7) + np.log(0.9)) / 2)
    assert abs(weighted_logloss_50_50(y, p) - expect) < 1e-12


def test_wll_degenerate_returns_nan():
    assert np.isnan(weighted_logloss_50_50(np.ones(4), np.full(4, 0.5)))


def test_ap_matches_sklearn():
    y, p = _rand()
    assert abs(ap_score(y, p) - average_precision_score(y, p)) < 1e-12


def test_ap_degenerate_returns_zero():
    assert ap_score(np.zeros(10), np.linspace(0, 1, 10)) == 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_jax_matches_sklearn(seed):
    y, p = _rand(seed=seed)
    got = float(average_precision_jax(y, p))
    want = average_precision_score(y, p)
    assert abs(got - want) < 1e-5


def test_ap_jax_with_ties():
    y = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    p = np.array([0.5, 0.5, 0.9, 0.9, 0.1, 0.1, 0.5, 0.9])
    got = float(average_precision_jax(y, p))
    want = average_precision_score(y, p)
    assert abs(got - want) < 1e-6


def test_final_score_reference_formula():
    y, p = _rand()
    ap, wll, score = final_score(y, p)
    assert abs(score - (0.5 * ap + 0.5 * wll)) < 1e-12
    ap2, wll2, score_comp = final_score(y, p, formula="competition")
    assert abs(score_comp - (0.5 * ap2 + 0.5 / (1 + wll2))) < 1e-12


def test_ensemble_methods():
    rng = np.random.default_rng(0)
    p_list = [rng.random(100) for _ in range(4)]
    P = np.stack(p_list)
    assert np.allclose(ensemble_probs("mean", p_list), P.mean(0))
    assert np.allclose(ensemble_probs("median", p_list), np.median(P, 0))
    gm = ensemble_probs("geom_mean", p_list)
    assert np.allclose(gm, np.exp(np.log(np.clip(P, 1e-7, 1 - 1e-7)).mean(0)))
    lm = ensemble_probs("logit_mean", p_list)
    Pc = np.clip(P, 1e-7, 1 - 1e-7)
    L = np.log(Pc) - np.log1p(-Pc)
    assert np.allclose(lm, 1 / (1 + np.exp(-L.mean(0))))
    tm = ensemble_probs("trim_mean", p_list, trim_ratio=0.25)
    assert np.allclose(tm, np.sort(P, 0)[1:3].mean(0))
    w = np.array([1.0, 2.0, 3.0, 4.0])
    wm = ensemble_probs("weighted", p_list, weights=w)
    assert np.allclose(wm, (P * (w / w.sum())[:, None]).sum(0))
    ra = ensemble_probs("rank_avg", p_list)
    assert ra.shape == (100,) and (ra > 0).all() and (ra < 1).all()


def test_val_weighted_weights_softmax():
    w = val_weighted_weights([0.34, 0.35, 0.33], temperature=10.0)
    assert abs(w.sum() - 1.0) < 1e-12
    assert w[1] > w[0] > w[2]


def test_wll_jax_matches_numpy():
    from tossctr_tpu.eval.metrics import weighted_logloss_50_50_jax

    y, p = _rand(seed=7)
    got = float(weighted_logloss_50_50_jax(y, p))
    want = weighted_logloss_50_50(y, p)
    assert abs(got - want) < 1e-5


def test_final_score_device_matches_host():
    from tossctr_tpu.eval.metrics import final_score_device

    y, p = _rand(seed=9)
    ap_h, wll_h, s_h = final_score(y, p)
    ap_d, wll_d, s_d = final_score_device(y, p)
    assert abs(ap_d - ap_h) < 1e-5
    assert abs(wll_d - wll_h) < 1e-5
    assert abs(s_d - s_h) < 1e-5


def test_device_metrics_sanitize_nonfinite_like_host():
    """NaN/inf predictions: device AP/WLL must apply the same
    nan_to_num(0.5)/clip sanitation as the host path (ADVICE r1)."""
    from tossctr_tpu.eval.metrics import final_score_device

    y, p = _rand(seed=11)
    p = np.asarray(p, np.float64).copy()
    p[::17] = np.nan
    p[3::23] = np.inf
    p[5::29] = -np.inf
    ap_h, wll_h, s_h = final_score(y, p)
    ap_d, wll_d, s_d = final_score_device(y, np.asarray(p, np.float32))
    assert abs(ap_d - ap_h) < 1e-5
    assert np.isfinite(wll_d)
    # WLL: the device f32 path clips at 1e-7 (1-1e-12 rounds to 1.0 in
    # f32); compare against the host metric at the same floor
    from tossctr_tpu.eval.metrics import weighted_logloss_50_50

    wll_h7 = weighted_logloss_50_50(y, p, eps=1e-7)
    # f32 rounds 1-1e-7 to ~1-1.19e-7, so clipped entries' -log differs
    # slightly from the f64 host; sanitation semantics is what's tested
    assert abs(wll_d - wll_h7) < 1e-2
