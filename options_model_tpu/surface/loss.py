"""Loss components: per-sample vega weights and no-arbitrage penalties.

Fixes the two weighting defects SURVEY.md §2.4 documents:
- vega weights are carried WITH the samples (shuffled together), not indexed by
  running batch offset into a differently-ordered vector
  (NN_training_stock_iv.py:589-591,614);
- the calendar penalty weight is passed explicitly instead of falling into the
  butterfly slot (:596).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from options_model_tpu.pricers.blackscholes import bs_vega
from options_model_tpu.surface.scaler import SurfaceScaler


def vega_weights(K, T, sigma_iv, S0: float, rate: float = 0.05):
    """Normalized per-sample vega weights (NN_training_stock_iv.py:554-568):
    vega/100, then scaled to mean 1."""
    v = bs_vega(S0, jnp.asarray(K), jnp.asarray(T), rate, jnp.asarray(sigma_iv))
    w = jnp.maximum(v / 100.0, 1e-8)
    return w / jnp.mean(w)


def arbitrage_penalty_fd(apply_fn: Callable, X, scaler: SurfaceScaler,
                         lambda_butterfly: float = 1e-3,
                         lambda_calendar: float = 1e-4,
                         eps_m_orig: float = 1e-3,
                         eps_t_orig: float = 1.0 / 365.0):
    """Finite-difference no-arbitrage penalties on the normalized grid.

    apply_fn(X) -> (n, 1) IVs. Butterfly: convexity of the surface in
    log-moneyness (clamp(-d2w/dm2)); calendar: monotonicity in tau
    (clamp(-dw/dtau)). Perturbations are specified in ORIGINAL units and
    converted through the scaler (NN_training_stock_iv.py:224-275).
    """
    eps_m = eps_m_orig / scaler.m_scale
    eps_t = eps_t_orig / scaler.tau_scale

    e_m = jnp.zeros_like(X).at[:, 0].set(eps_m)
    e_t = jnp.zeros_like(X).at[:, 1].set(eps_t)

    w_center = apply_fn(X)[:, 0]
    w_plus = apply_fn(X + e_m)[:, 0]
    w_minus = apply_fn(X - e_m)[:, 0]
    d2w_dm2 = (w_plus - 2.0 * w_center + w_minus) / (eps_m**2)
    # Per-sample MEAN (the reference summed over the batch,
    # NN_training_stock_iv.py:265,270 — a penalty that scales with batch size
    # and can dwarf the mean-scaled MSE by orders of magnitude, collapsing the
    # fit; mean-scaling makes lambda batch-size-independent).
    butterfly = jnp.mean(jnp.maximum(-d2w_dm2, 0.0))

    w_tau_plus = apply_fn(X + e_t)[:, 0]
    dw_dtau = (w_tau_plus - w_center) / eps_t
    calendar = jnp.mean(jnp.maximum(-dw_dtau, 0.0))

    return lambda_butterfly * butterfly + lambda_calendar * calendar
