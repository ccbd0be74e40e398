"""Core layer: configuration pytrees, PRNG discipline, streaming statistics, time grids.

Plays the role of the reference's L2 numerics core (SURVEY.md §1): RNG management
(options_model_3/options_model_3.py:69-79), Welford streaming statistics (:33-63),
and the trading-hours calendar (options_model_v1.5.py:14-56) — rebuilt as pure
functions over JAX pytrees.
"""

from options_model_tpu.core.config import (
    HestonParams,
    MertonParams,
    VGParams,
    RBergomiParams,
    SABRParams,
    BatesParams,
    LSMConfig,
    MCConfig,
    OptionSpec,
    SurfaceTrainConfig,
    CalibrationConfig,
    CALL,
    PUT,
)
from options_model_tpu.core.rng import child_keys, path_block_keys, spawn_key
from options_model_tpu.core.stats import (
    WelfordState,
    welford_empty,
    welford_from_batch,
    welford_merge,
    welford_psum,
    welford_mean_stderr,
)
from options_model_tpu.core.timegrid import (
    TRADING_HOURS_PER_DAY,
    adaptive_num_steps,
    compute_trading_hours_remaining,
    curve_day_grid,
)

__all__ = [
    "HestonParams",
    "MertonParams",
    "VGParams",
    "RBergomiParams",
    "SABRParams",
    "BatesParams",
    "LSMConfig",
    "MCConfig",
    "OptionSpec",
    "SurfaceTrainConfig",
    "CalibrationConfig",
    "CALL",
    "PUT",
    "child_keys",
    "path_block_keys",
    "spawn_key",
    "WelfordState",
    "welford_empty",
    "welford_from_batch",
    "welford_merge",
    "welford_psum",
    "welford_mean_stderr",
    "TRADING_HOURS_PER_DAY",
    "adaptive_num_steps",
    "compute_trading_hours_remaining",
    "curve_day_grid",
]
