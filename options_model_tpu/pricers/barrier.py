"""Barrier (knock-in / knock-out) option pricing by Monte Carlo.

A real implementation of the capability the reference only stubbed
(ExoticOptionPricer.price_barrier_option, options_model_2.py:62-66: print-and-
return-NaN). Discretely monitored at the simulation grid; path matrices come
from any dynamics in models/.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, MCConfig, OptionSpec
from options_model_tpu.core.payoff import (
    barrier_knockin_mask,
    barrier_knockout_mask,
    vanilla_payoff,
)
from options_model_tpu.pricers.american import simulate_paths

BARRIER_TYPES = ("up-and-out", "down-and-out", "up-and-in", "down-and-in")


def price_barrier_mc(key: jax.Array, S0, T, spec: OptionSpec, barrier: float,
                     barrier_type: str, mc: MCConfig, model: str = "gbm", *,
                     heston: Optional[HestonParams] = None, sigma_fn=None):
    """Price a discretely-monitored barrier option. Returns (price, stderr)."""
    if barrier_type not in BARRIER_TYPES:
        raise ValueError(f"barrier_type must be one of {BARRIER_TYPES}")
    is_up = barrier_type.startswith("up")
    is_out = barrier_type.endswith("out")

    S_paths = simulate_paths(key, S0, T, mc, model, sigma=spec.sigma,
                             rate=spec.rate, heston=heston, sigma_fn=sigma_fn,
                             div_yield=spec.div_yield)
    if is_out:
        alive = barrier_knockout_mask(S_paths, barrier, is_up)
    else:
        alive = barrier_knockin_mask(S_paths, barrier, is_up)

    from options_model_tpu.core.stats import masked_mean_stderr
    from options_model_tpu.pricers.american import _pair_block

    dtype = S_paths.dtype
    discount = jnp.exp(-jnp.asarray(spec.rate, dtype) * jnp.asarray(T, dtype))
    payoffs = vanilla_payoff(S_paths[-1], spec.strike, spec.cp) * alive * discount
    pb = _pair_block(mc, model, "auto") if mc.antithetic else None
    price, stderr, _ = masked_mean_stderr(payoffs, pair_block=pb)
    return price, stderr
