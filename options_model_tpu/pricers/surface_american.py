"""American option SURFACE pricing: strike x maturity grids on shared paths.

The BASELINE.json headline workload (configs[4]: "64x64 strike x maturity
American grid under Heston"). The task-per-cell design (parallel/batch.py)
re-simulates paths for every cell; this pricer exploits the structure instead:

- paths do not depend on the strike, so ALL strikes of a maturity share ONE
  path matrix — a 64x reduction in simulation work for a 64-strike grid;
- the LSM backward pass vmaps over strikes: the per-date masked Gram builds
  batch into (n_K, d, d) matmuls and batched 5x5 solves — MXU-friendly;
- maturities run under ``lax.map`` (sequential) so peak memory stays at one
  path matrix, with the fused Pallas kernel feeding each iteration.

All maturities share ``n_steps`` (dt varies) — one compile for the whole grid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, MCConfig, OptionSpec
from options_model_tpu.pricers.american import lsm_poly_backward, simulate_paths


def price_american_surface(key: jax.Array, S0, strikes, maturities, rate,
                           mc: MCConfig, *, cp: float = -1.0,
                           model: str = "heston", sigma=None,
                           heston: Optional[HestonParams] = None,
                           engine: str = "auto") -> jnp.ndarray:
    """Price an American option surface. Returns (n_maturities, n_strikes).

    strikes: (n_K,), maturities: (n_T,) in years. Each maturity gets an
    independent RNG stream via fold_in(key, maturity_index).
    """
    strikes = jnp.asarray(strikes, jnp.float32)
    maturities = jnp.asarray(maturities, jnp.float32)

    def one_maturity(args):
        ti, T = args
        mkey = jax.random.fold_in(key, ti)
        S_paths = simulate_paths(mkey, S0, T, mc, model, sigma=sigma,
                                 rate=rate, heston=heston, engine=engine)

        def one_strike(K):
            spec = OptionSpec(strike=K, rate=rate, cp=cp, sigma=sigma)
            price, _ = lsm_poly_backward(S_paths, spec, T)
            return price

        return jax.vmap(one_strike)(strikes)

    ti = jnp.arange(maturities.shape[0])
    return jax.lax.map(one_maturity, (ti, maturities))


def price_european_surface_mc(key: jax.Array, S0, strikes, maturities, rate,
                              mc: MCConfig, *, cp: float = 1.0,
                              model: str = "heston", sigma=None,
                              heston: Optional[HestonParams] = None,
                              engine: str = "auto") -> jnp.ndarray:
    """European surface on shared terminal samples (one simulation per
    maturity, payoffs vmapped over strikes). For Heston the COS pricer
    (calibration/charfn.py) is the closed-form-fast alternative; this MC path
    exists for cross-validation and for dynamics without a char fn."""
    from options_model_tpu.pricers.european import make_terminal_sampler

    strikes = jnp.asarray(strikes, jnp.float32)
    maturities = jnp.asarray(maturities, jnp.float32)

    def one_maturity(args):
        ti, T = args
        mkey = jax.random.fold_in(key, ti)
        sampler = make_terminal_sampler(model, S0, rate, T, sigma=sigma,
                                        heston=heston, engine=engine)
        S_T = sampler(mkey, 0, mc)
        disc = jnp.exp(-jnp.asarray(rate, S_T.dtype) * T)

        def one_strike(K):
            return jnp.mean(jnp.maximum(cp * (S_T - K), 0.0)) * disc

        return jax.vmap(one_strike)(strikes)

    ti = jnp.arange(maturities.shape[0])
    return jax.lax.map(one_maturity, (ti, maturities))
