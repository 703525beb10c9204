import io
import pickle

import numpy as np

from tossctr_tpu.eval.calibration import Calibrator, fit_temperature
from tossctr_tpu.eval.metrics import weighted_logloss_50_50


def _overconfident(n=20_000, seed=0, true_T=2.0, mu=0.0):
    """Logits that are true-logit * T: temperature fit should recover ~T.

    Class-balanced logits (mu=0) so the 50:50 NLL weighting is neutral —
    with imbalanced data the balanced weighting legitimately prefers a
    different T (it cannot shift the intercept).
    """
    rng = np.random.default_rng(seed)
    z_true = rng.normal(mu, 1.5, n)
    p_true = 1 / (1 + np.exp(-z_true))
    y = (rng.random(n) < p_true).astype(np.int64)
    return z_true * true_T, y


def test_temperature_recovers_scale():
    z, y = _overconfident(true_T=2.0)
    ts = fit_temperature(z, y, l2_reg=0.0)
    assert 1.6 < ts.T_eff < 2.4


def test_temperature_identity_when_calibrated():
    z, y = _overconfident(true_T=1.0)
    ts = fit_temperature(z, y)
    assert 0.85 < ts.T_eff < 1.15


def test_temperature_clamped():
    z, y = _overconfident(true_T=20.0)
    ts = fit_temperature(z, y, clamp_T=(0.2, 5.0))
    assert ts.T_eff <= 5.0 + 1e-9


def test_calibrator_improves_wll():
    z, y = _overconfident(true_T=3.0)
    p_raw = 1 / (1 + np.exp(-z))
    cal = Calibrator(method="temperature").fit(z, y)
    p_cal = cal.predict_proba(z)
    assert weighted_logloss_50_50(y, p_cal) < weighted_logloss_50_50(y, p_raw)


def test_isotonic_chain_and_meta():
    z, y = _overconfident()
    cal = Calibrator(method="temperature+isotonic").fit(z, y)
    p = cal.predict_proba(z)
    assert p.min() >= 1e-7 and p.max() <= 1 - 1e-7
    meta = cal.meta()
    assert "T" in meta and "iso_thresholds_x" in meta


def test_isotonic_skipped_below_min_nodes():
    z = np.array([0.0, 0.0, 0.0, 1.0] * 4)
    y = np.array([0, 1, 0, 1] * 4)
    cal = Calibrator(method="isotonic", min_iso_nodes=8).fit(z, y)
    assert cal.iso is None


def test_calibrator_picklable():
    z, y = _overconfident()
    cal = Calibrator(method="temperature+isotonic").fit(z, y)
    buf = io.BytesIO()
    pickle.dump(cal, buf)
    buf.seek(0)
    cal2 = pickle.load(buf)
    assert np.allclose(cal2.predict_proba(z[:100]), cal.predict_proba(z[:100]))
