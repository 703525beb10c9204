from .metrics import (
    ap_score,
    weighted_logloss_50_50,
    final_score,
    ensemble_probs,
    average_precision_jax,
)
from .calibration import Calibrator, fit_temperature

__all__ = [
    "ap_score",
    "weighted_logloss_50_50",
    "final_score",
    "ensemble_probs",
    "average_precision_jax",
    "Calibrator",
    "fit_temperature",
]
