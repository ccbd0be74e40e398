"""Pricing engines (reference L5, SURVEY.md §1).

- blackscholes: closed form + Greeks (closed-form and autodiff)
- european:     streaming Monte-Carlo European pricer
- american:     Longstaff-Schwartz American pricer (poly + NN regressors), control variate
- binomial:     CRR binomial oracle (accuracy ground truth, incl. native C++ build)
- barrier:      barrier-option MC pricer (implements the reference's v2 stub)
- dual:         Rogers martingale-dual upper bound + primal-dual bracket
- qmc:          randomized-QMC pricers (scrambled Sobol + Brownian bridge)
- basket:       multi-asset European baskets/rainbows (geometric-basket CV)
- american_basket: multi-asset Bermudan LSM (Andersen-Broadie validated)
- american_asian:  American Asian LSM on the (S, running-average) state
- fd_asian:     Hull-White representative-average binomial oracle (float64)
- varswap:      variance/volatility swaps (closed forms per family + MC)
"""

from options_model_tpu.pricers.blackscholes import (
    bs_price,
    bs_greeks,
    bs_greeks_closed_form,
    bs_vega,
    bs_delta,
)
from options_model_tpu.pricers.binomial import crr_american, crr_price
from options_model_tpu.pricers.european import price_european_mc
from options_model_tpu.pricers.american import (
    price_american_lsm,
    price_american_with_control_variate,
    price_american,
)
from options_model_tpu.pricers.barrier import price_barrier_mc
from options_model_tpu.pricers.dual import price_american_bracket
from options_model_tpu.pricers.qmc import price_asian_qmc, price_european_qmc
from options_model_tpu.pricers.mlmc import MLMCResult, price_mlmc
from options_model_tpu.pricers.basket import (
    geometric_basket_bs_price,
    price_basket_mc,
)
from options_model_tpu.pricers.american_basket import price_american_basket
from options_model_tpu.pricers.american_asian import price_american_asian
from options_model_tpu.pricers.exotics import (
    geometric_asian_bs_price,
    price_asian_mc,
    price_lookback_mc,
)
from options_model_tpu.pricers.fd_asian import asian_binomial_price
from options_model_tpu.pricers.fd_heston import heston_fd_price
from options_model_tpu.pricers.varswap import (
    forward_varswap_strike,
    varswap_mc,
    varswap_pv,
    varswap_strike,
    varswap_strike_replication,
)
from options_model_tpu.pricers.surface_american import (
    price_american_curve_shared,
    price_american_surface,
    price_european_surface_mc,
)

__all__ = [
    "bs_price",
    "bs_greeks",
    "bs_greeks_closed_form",
    "bs_vega",
    "bs_delta",
    "crr_american",
    "crr_price",
    "price_european_mc",
    "price_american_lsm",
    "price_american_with_control_variate",
    "price_american",
    "price_barrier_mc",
    "price_american_bracket",
    "price_asian_qmc",
    "price_mlmc",
    "MLMCResult",
    "price_basket_mc",
    "geometric_basket_bs_price",
    "price_american_basket",
    "price_american_asian",
    "price_asian_mc",
    "price_lookback_mc",
    "geometric_asian_bs_price",
    "asian_binomial_price",
    "price_european_qmc",
    "heston_fd_price",
    "forward_varswap_strike",
    "varswap_mc",
    "varswap_pv",
    "varswap_strike",
    "varswap_strike_replication",
    "price_american_curve_shared",
    "price_american_surface",
    "price_european_surface_mc",
]
