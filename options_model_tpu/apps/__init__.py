"""Application layer (reference L6/L7): curve orchestration, CLI, UI, export."""

from options_model_tpu.apps.curves import (
    CurveRequest,
    compute_curve_for_S0,
    compute_curves,
)

__all__ = ["CurveRequest", "compute_curve_for_S0", "compute_curves"]
