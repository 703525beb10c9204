"""Probability calibration: temperature scaling + isotonic regression
(reference: src/utils/calibration.py).

The reference fits a single log-temperature with torch LBFGS (strong
Wolfe) on the 50:50-weighted NLL plus an ``l2_reg*(T-1)^2`` penalty, with
T clamped to [0.2, 5.0] (calibration.py:23-52).  Exact LBFGS parity is
not required (SURVEY.md §7 "Calibration under jit"): we match the
*objective* — same weighting, clamp and regularizer — and optimize
log T with scipy L-BFGS-B and an analytic gradient, bounding log T to
the clamp interval.  Isotonic stays host-side sklearn with the same
50:50 class-balance sample weights and ``min_iso_nodes`` guard.

The ``Calibrator`` is picklable and travels inside fold checkpoints,
like the reference's (train.py:270).
"""

from __future__ import annotations

import numpy as np


def _sigmoid_stable(z: np.ndarray) -> np.ndarray:
    z = np.clip(z, -50.0, 50.0)
    return 1.0 / (1.0 + np.exp(-z))


class TemperatureScaler:
    """Holds a fitted temperature; ``transform`` maps logits -> logits/T."""

    def __init__(self, T: float = 1.0, clamp_T=(0.2, 5.0)):
        self.T = float(T)
        self.clamp_T = tuple(clamp_T) if clamp_T is not None else None

    @property
    def T_eff(self) -> float:
        if self.clamp_T is None:
            return self.T
        return float(np.clip(self.T, self.clamp_T[0], self.clamp_T[1]))

    def transform(self, logits: np.ndarray) -> np.ndarray:
        return np.asarray(logits, dtype=np.float64) / self.T_eff


def fit_temperature(
    logits: np.ndarray,
    y: np.ndarray,
    lr: float = 0.05,  # kept for config parity; L-BFGS-B needs no lr
    iters: int = 200,
    clamp_T=(0.2, 5.0),
    l2_reg: float = 1e-3,
) -> TemperatureScaler:
    from scipy.optimize import minimize

    z = np.asarray(logits, dtype=np.float64).ravel()
    t = np.asarray(y, dtype=np.float64).ravel()
    n_pos = max(1, int(t.sum()))
    n_neg = max(1, int((t == 0).sum()))

    lo, hi = (clamp_T if clamp_T is not None else (1e-3, 1e3))

    def objective(lt):
        T = float(np.exp(lt[0]))
        zt = z / T
        p = np.clip(_sigmoid_stable(zt), 1e-7, 1 - 1e-7)
        loss_pos = -np.sum(t * np.log(p)) / n_pos
        loss_neg = -np.sum((1 - t) * np.log(1 - p)) / n_neg
        loss = 0.5 * (loss_pos + loss_neg) + l2_reg * (T - 1.0) ** 2
        # d/dlt: d zt/dlt = -zt ; d(-log p)/dzt = -(1-p) ; d(-log(1-p))/dzt = p
        g_pos = np.sum(t * (1 - p) * zt) / n_pos
        g_neg = -np.sum((1 - t) * p * zt) / n_neg
        grad = 0.5 * (g_pos + g_neg) + 2.0 * l2_reg * (T - 1.0) * T
        return loss, np.array([grad])

    res = minimize(
        objective,
        x0=np.array([0.0]),
        jac=True,
        method="L-BFGS-B",
        bounds=[(np.log(lo), np.log(hi))],
        options={"maxiter": int(iters)},
    )
    return TemperatureScaler(T=float(np.exp(res.x[0])), clamp_T=clamp_T)


class Calibrator:
    """method: 'temperature' | 'isotonic' | 'temperature+isotonic'
    (reference: src/utils/calibration.py:54-110)."""

    def __init__(
        self,
        method: str = "temperature",
        lr: float = 0.05,
        iters: int = 200,
        clamp_T=(0.2, 5.0),
        l2_reg: float = 1e-3,
        min_iso_nodes: int = 8,
    ):
        self.method = method
        self.lr = lr
        self.iters = iters
        self.clamp_T = tuple(clamp_T) if clamp_T is not None else None
        self.l2_reg = l2_reg
        self.min_iso_nodes = min_iso_nodes
        self.temp_scaler: TemperatureScaler | None = None
        self.iso = None

    def fit(self, logits: np.ndarray, y: np.ndarray) -> "Calibrator":
        z = np.asarray(logits, dtype=np.float64).ravel()
        y = np.asarray(y, dtype=np.int32).ravel()

        if self.method in ("temperature", "temperature+isotonic"):
            self.temp_scaler = fit_temperature(
                z, y, lr=self.lr, iters=self.iters, clamp_T=self.clamp_T, l2_reg=self.l2_reg
            )

        if self.method in ("isotonic", "temperature+isotonic"):
            zt = self.temp_scaler.transform(z) if self.temp_scaler is not None else z
            p = _sigmoid_stable(zt)
            n_pos = max(1, int(y.sum()))
            n_neg = max(1, int((y == 0).sum()))
            sw = np.where(y == 1, 0.5 / n_pos, 0.5 / n_neg)
            if np.unique(p).size < self.min_iso_nodes:
                self.iso = None
            else:
                from sklearn.isotonic import IsotonicRegression

                self.iso = IsotonicRegression(y_min=0.0, y_max=1.0, out_of_bounds="clip")
                self.iso.fit(p, y, sample_weight=sw)
        return self

    def predict_proba(self, logits: np.ndarray) -> np.ndarray:
        z = np.asarray(logits, dtype=np.float64).ravel()
        if self.temp_scaler is not None:
            z = self.temp_scaler.transform(z)
        p = _sigmoid_stable(z)
        if self.iso is not None:
            p = self.iso.predict(np.clip(p, 1e-7, 1 - 1e-7))
        return np.clip(p, 1e-7, 1 - 1e-7)

    # metadata for tools/run_calibration.py's cal_meta.json
    def meta(self) -> dict:
        out = {"method": self.method}
        if self.temp_scaler is not None:
            out["T"] = self.temp_scaler.T_eff
        if self.iso is not None:
            out["iso_thresholds_x"] = np.asarray(self.iso.X_thresholds_).tolist()
            out["iso_thresholds_y"] = np.asarray(self.iso.y_thresholds_).tolist()
        return out
