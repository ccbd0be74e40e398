"""Heston calibration (reference component #13, heston_calibration.py).

The pricing engine inside the objective is the Fang-Oosterlee COS method on the
Heston characteristic function — closed-form-fast, fully vectorized over the
strike x maturity surface, and differentiable end to end (gradients via jax.grad
flow through the complex char-fn and the implied-vol solver). The reference ran
a 100k-path Monte Carlo per objective evaluation (heston_calibration.py:404-472);
this replaces it with microseconds per surface, which is the single biggest
algorithmic win available (SURVEY.md §3.4).
"""

from options_model_tpu.calibration.charfn import (
    bates_cos_price,
    heston_charfn,
    heston_cos_price,
    vg_cos_price,
)
from options_model_tpu.calibration.calibrator import (
    HestonCalibrator,
    MarketSurface,
    calibrate_bates_to_data,
    calibrate_heston_to_data,
    calibrate_heston_to_ticker,
    calibrate_vg_to_data,
    detect_regime,
)
from options_model_tpu.calibration.rbergomi import (
    calibrate_rbergomi_to_data,
    create_synthetic_rbergomi_surface,
)
from options_model_tpu.calibration.synthetic import (
    create_synthetic_bates_surface,
    create_synthetic_heston_surface,
    create_synthetic_vg_surface,
)

__all__ = [
    "bates_cos_price",
    "heston_charfn",
    "heston_cos_price",
    "HestonCalibrator",
    "MarketSurface",
    "calibrate_bates_to_data",
    "calibrate_heston_to_data",
    "calibrate_heston_to_ticker",
    "calibrate_rbergomi_to_data",
    "calibrate_vg_to_data",
    "create_synthetic_rbergomi_surface",
    "detect_regime",
    "create_synthetic_bates_surface",
    "create_synthetic_heston_surface",
    "create_synthetic_vg_surface",
    "vg_cos_price",
]
