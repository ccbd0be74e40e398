"""Black-Scholes closed forms and Greeks.

Rebuilds BlackScholesGreeks (options_model_3/options_model_3.py:127-159,
options_model_2.py:36-58) as pure jnp functions, and adds what the reference
lacked: Greeks via autodiff (``bs_greeks``), which generalizes beyond the closed
form (any differentiable pricer gets Greeks for free) and matches the closed-form
formulas to machine precision (tested in tests/test_blackscholes.py).

Conventions follow the reference exactly: Theta per calendar day (/365), Vega and
Rho per 1% move (/100).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr


def _d1_d2(S, K, T, r, sigma):
    sqrt_T = jnp.sqrt(T)
    d1 = (jnp.log(S / K) + (r + 0.5 * sigma**2) * T) / (sigma * sqrt_T)
    d2 = d1 - sigma * sqrt_T
    return d1, d2


def _npdf(x):
    return jnp.exp(-0.5 * x**2) / jnp.sqrt(2.0 * jnp.pi)


def bs_price(S, K, T, r, sigma, cp=1.0):
    """European Black-Scholes price; cp=+1 call, -1 put. Vectorizes over any
    broadcastable argument shapes."""
    d1, d2 = _d1_d2(S, K, T, r, sigma)
    # cp-symmetric form: call = S N(d1) - K e^{-rT} N(d2); put via N(-x) = 1 - N(x)
    return cp * (S * ndtr(cp * d1) - K * jnp.exp(-r * T) * ndtr(cp * d2))


def bs_delta(S, K, T, r, sigma, cp=1.0):
    d1, _ = _d1_d2(S, K, T, r, sigma)
    return cp * ndtr(cp * d1)


def bs_vega(S, K, T, r, sigma):
    """Raw vega (per unit vol, not per 1%) — the weighting kernel used by the
    IV-surface loss and the calibrator (NN_training_stock_iv.py:405-414)."""
    d1, _ = _d1_d2(S, K, T, r, sigma)
    return S * _npdf(d1) * jnp.sqrt(T)


@jax.jit
def _greeks_impl(S, K, T, r, sigma, cp):
    def price_of(x, s):
        return bs_price(s, x[0], x[1], x[2], x[3], cp)

    x = jnp.stack([jnp.asarray(K, jnp.float32), jnp.asarray(T, jnp.float32),
                   jnp.asarray(r, jnp.float32), jnp.asarray(sigma, jnp.float32)])
    S = jnp.asarray(S, jnp.float32)
    gx = jax.grad(price_of, argnums=0)(x, S)
    delta = jax.grad(price_of, argnums=1)(x, S)
    gamma = jax.grad(jax.grad(price_of, argnums=1), argnums=1)(x, S)
    return delta, gamma, gx[3], gx[1], gx[2]


def bs_greeks(S, K, T, r, sigma, cp=1.0) -> Dict[str, jnp.ndarray]:
    """Greeks via autodiff, converted to the reference's reporting conventions:
    Theta per day, Vega and Rho per 1%.

    Replaces the closed-form-only Greeks of the reference with jax.grad — exact,
    applicable to any differentiable pricer, and compiled as ONE program (five
    separate grad compilations are expensive on remote-compile backends).
    """
    delta, gamma, dsig, dT, dr = _greeks_impl(S, K, T, r, sigma, cp)
    return {
        "Delta": delta,
        "Gamma": gamma,
        "Vega": dsig / 100.0,
        "Theta": -dT / 365.0,  # value decay as calendar time passes
        "Rho": dr / 100.0,
    }


def bs_greeks_closed_form(S, K, T, r, sigma, cp=1.0) -> Dict[str, jnp.ndarray]:
    """Textbook closed-form Greeks with the reference's conventions
    (options_model_3/options_model_3.py:129-147). Used to cross-check bs_greeks."""
    d1, d2 = _d1_d2(S, K, T, r, sigma)
    sqrt_T = jnp.sqrt(T)
    delta = cp * ndtr(cp * d1)
    gamma = _npdf(d1) / (S * sigma * sqrt_T)
    vega = S * _npdf(d1) * sqrt_T
    theta = (-S * _npdf(d1) * sigma / (2.0 * sqrt_T)
             - cp * r * K * jnp.exp(-r * T) * ndtr(cp * d2))
    rho = cp * K * T * jnp.exp(-r * T) * ndtr(cp * d2)
    return {
        "Delta": delta,
        "Gamma": gamma,
        "Vega": vega / 100.0,
        "Theta": theta / 365.0,
        "Rho": rho / 100.0,
    }


def implied_vol(price, S, K, T, r, cp=1.0, n_iter: int = 64,
                lo: float = 1e-4, hi: float = 5.0):
    """Implied volatility via bisection + Newton polish; jit/vmap-friendly
    (fixed iteration count, no data-dependent control flow).

    The differentiable IV solver the reference lacked (its calibration objective
    used a log price-ratio proxy instead, heston_calibration.py:440-447).
    """
    price = jnp.asarray(price)

    def bisect_body(_, bounds):
        lo_, hi_ = bounds
        mid = 0.5 * (lo_ + hi_)
        p_mid = bs_price(S, K, T, r, mid, cp)
        too_high = p_mid > price
        return jnp.where(too_high, lo_, mid), jnp.where(too_high, mid, hi_)

    lo_a = jnp.full_like(price, lo)
    hi_a = jnp.full_like(price, hi)
    lo_f, hi_f = jax.lax.fori_loop(0, n_iter, bisect_body, (lo_a, hi_a))
    sigma = 0.5 * (lo_f + hi_f)

    def newton_body(_, sig):
        diff = bs_price(S, K, T, r, sig, cp) - price
        v = jnp.maximum(bs_vega(S, K, T, r, sig), 1e-10)
        step = jnp.clip(diff / v, -0.5, 0.5)
        return jnp.clip(sig - step, lo, hi)

    return jax.lax.fori_loop(0, 8, newton_body, sigma)
