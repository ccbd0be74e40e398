"""Path-dependent exotics beyond barriers: Asian and lookback options.

Completes the exotic family the reference only gestured at
(ExoticOptionPricer, options_model_2.py:61-66). Both payoffs are running
statistics over the path — they stream through the simulation scan via
terminal-plus-statistic reductions on the full path matrix.

Discretely monitored at the simulation grid (as with barriers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, MCConfig, OptionSpec
from options_model_tpu.pricers.american import _pair_block, simulate_paths


def _mc_estimate(payoffs, rate, T, pair_block=None):
    from options_model_tpu.core.stats import masked_mean_stderr

    disc = jnp.exp(-jnp.asarray(rate, payoffs.dtype) * jnp.asarray(T, payoffs.dtype))
    mean, stderr, _ = masked_mean_stderr(payoffs * disc, pair_block=pair_block)
    return mean, stderr


def price_asian_mc(key: jax.Array, S0, T, spec: OptionSpec, mc: MCConfig,
                   model: str = "gbm", *, average: str = "arithmetic",
                   strike_type: str = "fixed",
                   heston: Optional[HestonParams] = None, merton=None,
                   bates=None, sigma_fn=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Asian option on the average of the monitored prices.

    average: 'arithmetic' | 'geometric'; strike_type: 'fixed' (payoff on
    avg vs K) | 'floating' (payoff on S_T vs avg). Returns (price, stderr).
    """
    if average not in ("arithmetic", "geometric"):
        raise ValueError("average must be 'arithmetic' or 'geometric'")
    if strike_type not in ("fixed", "floating"):
        raise ValueError("strike_type must be 'fixed' or 'floating'")

    S = simulate_paths(key, S0, T, mc, model, sigma=spec.sigma, rate=spec.rate,
                       heston=heston, merton=merton, bates=bates,
                       sigma_fn=sigma_fn, div_yield=spec.div_yield)
    monitored = S[1:]  # average over the monitoring dates, not the spot
    if average == "arithmetic":
        avg = jnp.mean(monitored, axis=0)
    else:
        avg = jnp.exp(jnp.mean(jnp.log(monitored), axis=0))

    if strike_type == "fixed":
        payoffs = jnp.maximum(spec.cp * (avg - spec.strike), 0.0)
    else:
        payoffs = jnp.maximum(spec.cp * (S[-1] - avg), 0.0)
    pb = _pair_block(mc, model, "auto") if mc.antithetic else None
    return _mc_estimate(payoffs, spec.rate, T, pb)


def price_lookback_mc(key: jax.Array, S0, T, spec: OptionSpec, mc: MCConfig,
                      model: str = "gbm", *, strike_type: str = "floating",
                      heston: Optional[HestonParams] = None, merton=None,
                      bates=None, sigma_fn=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lookback option on the running extreme.

    floating: call pays S_T - min(S), put pays max(S) - S_T (always ITM).
    fixed:    call pays (max(S) - K)^+, put pays (K - min(S))^+.
    """
    if strike_type not in ("fixed", "floating"):
        raise ValueError("strike_type must be 'fixed' or 'floating'")

    S = simulate_paths(key, S0, T, mc, model, sigma=spec.sigma, rate=spec.rate,
                       heston=heston, merton=merton, bates=bates,
                       sigma_fn=sigma_fn, div_yield=spec.div_yield)
    S_min = jnp.min(S, axis=0)
    S_max = jnp.max(S, axis=0)

    if strike_type == "floating":
        payoffs = jnp.where(spec.cp > 0, S[-1] - S_min, S_max - S[-1])
    else:
        payoffs = jnp.where(spec.cp > 0,
                            jnp.maximum(S_max - spec.strike, 0.0),
                            jnp.maximum(spec.strike - S_min, 0.0))
    pb = _pair_block(mc, model, "auto") if mc.antithetic else None
    return _mc_estimate(payoffs, spec.rate, T, pb)
