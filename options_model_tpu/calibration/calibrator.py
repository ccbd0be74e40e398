"""Heston calibration to an implied-volatility surface.

Reference parity (heston_calibration.py:348-728) with the intended-behavior
upgrades SURVEY.md §7 calls for:

- market-regime detection (low/normal/high vol by mean IV) driving bounds and
  the initial guess (:125-133, :359-402);
- a TRUE vega-weighted implied-vol least squares: model prices come from the
  COS pricer and are inverted through the differentiable IV solver, so the
  residual is (iv_model - iv_market) — not the log price-ratio proxy the
  reference used (:440-447);
- Feller-violation penalty added to the objective (:469-471);
- optimizer cascade L-BFGS-B -> differential_evolution -> dual_annealing
  (:543-557), where L-BFGS-B now receives exact gradients via jax.grad through
  the whole objective (char fn -> COS -> IV solve -> loss);
- validation + default-parameter fallback on failure (:560-579) and a
  calibration history (:582-589).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import differential_evolution, dual_annealing, minimize

from options_model_tpu.core.config import CalibrationConfig, HestonParams
from options_model_tpu.calibration.charfn import heston_cos_price
from options_model_tpu.pricers.blackscholes import bs_vega, implied_vol


@dataclasses.dataclass
class MarketSurface:
    """Validated (K, T, iv) surface observations plus market environment.

    The array-of-structs analogue of the reference's MarketData dataframe
    container (heston_calibration.py:92-133).
    """

    strikes: np.ndarray
    expiries: np.ndarray
    ivs: np.ndarray
    S0: float
    rate: float = 0.05
    div_yield: float = 0.0

    def __post_init__(self):
        K = np.asarray(self.strikes, np.float64)
        T = np.asarray(self.expiries, np.float64)
        iv = np.asarray(self.ivs, np.float64)
        if not (K.shape == T.shape == iv.shape):
            raise ValueError("strikes, expiries, ivs must have equal shapes")
        mask = (K > 0) & (T > 1.0 / 365.0) & (iv > 0.01) & (iv < 2.0)
        if not mask.any():
            raise ValueError("No valid option data after filtering")
        self.strikes = K[mask]
        self.expiries = T[mask]
        self.ivs = iv[mask]
        self.regime = detect_regime(float(self.ivs.mean()))

    def __len__(self) -> int:
        return len(self.strikes)


def detect_regime(avg_iv: float) -> str:
    """low_vol (<15%), high_vol (>35%), else normal_vol (heston_calibration.py:125-133)."""
    if avg_iv < 0.15:
        return "low_vol"
    if avg_iv > 0.35:
        return "high_vol"
    return "normal_vol"


# (kappa, theta, xi, rho, v0) bounds per regime (heston_calibration.py:359-386).
# Intended-behavior fix: the reference's normal_vol theta/v0 lower bound of
# 0.05 excludes its own initial guess avg_iv^2 (= 0.04 at 20% vol) — widened to
# 0.02 so the feasible region contains the regime's typical variance level.
_REGIME_BOUNDS = {
    "low_vol": [(0.5, 8.0), (0.005, 0.3), (0.05, 1.5), (-0.8, 0.1), (0.005, 0.3)],
    "high_vol": [(1.0, 15.0), (0.08, 1.0), (0.2, 2.5), (-0.9, 0.2), (0.08, 1.0)],
    "normal_vol": [(0.5, 12.0), (0.02, 0.6), (0.1, 2.0), (-0.85, 0.15), (0.02, 0.6)],
}


def _initial_guess(regime: str, avg_iv: float) -> np.ndarray:
    theta0 = avg_iv**2
    if regime == "low_vol":
        return np.array([3.0, theta0, 0.3, -0.3, theta0])
    if regime == "high_vol":
        return np.array([5.0, theta0, 0.8, -0.5, theta0])
    return np.array([4.0, theta0, 0.5, -0.4, theta0])


@partial(jax.jit, static_argnames=("n_terms", "use_vega_weighting"))
def _objective_core(x, strikes, expiries, market_ivs, S0, rate,
                    n_terms: int = 128, use_vega_weighting: bool = True,
                    min_weight: float = 0.01, cos_L: float = 12.0,
                    div_yield: float = 0.0):
    """Vega-weighted RMSE of model-vs-market implied vols + Feller penalty.

    x = (kappa, theta, xi, rho, v0) as a traced array — params are rebuilt
    inside so jax.grad differentiates straight through.
    """
    params = HestonParams(kappa=x[0], theta=x[1], xi=x[2], rho=x[3], v0=x[4])
    prices = heston_cos_price(S0, strikes, expiries, rate, params, cp=1.0,
                              n_terms=n_terms, L=cos_L, q=div_yield)
    # Floor keeps the IV solve well-posed for deep-OTM points.
    intrinsic = jnp.maximum(S0 * jnp.exp(-div_yield * expiries)
                            - strikes * jnp.exp(-rate * expiries), 0.0)
    prices = jnp.maximum(prices, intrinsic + 1e-6)
    model_ivs = implied_vol(prices, S0, strikes, expiries, rate, cp=1.0,
                            q=div_yield)

    if use_vega_weighting:
        vega = bs_vega(S0, strikes, expiries, rate, market_ivs, q=div_yield)
        w = jnp.maximum(vega / 100.0, min_weight)
    else:
        w = jnp.ones_like(market_ivs)

    err = model_ivs - market_ivs
    weighted_rmse = jnp.sqrt(jnp.sum(w * err**2) / jnp.sum(w))

    feller_gap = x[2] ** 2 - 2.0 * x[0] * x[1]
    feller_penalty = 100.0 * jnp.maximum(feller_gap, 0.0)
    return weighted_rmse + feller_penalty


class HestonCalibrator:
    """Optimizer cascade around the differentiable COS objective."""

    def __init__(self, config: Optional[CalibrationConfig] = None):
        self.config = (config or CalibrationConfig()).validate()
        self.best_params: Optional[HestonParams] = None
        self.best_error: float = np.inf
        self.calibration_history: List[Dict[str, Any]] = []

    def _make_objective(self, surface: MarketSurface):
        cfg = self.config
        K = jnp.asarray(surface.strikes, jnp.float32)
        T = jnp.asarray(surface.expiries, jnp.float32)
        iv = jnp.asarray(surface.ivs, jnp.float32)
        bounds = _REGIME_BOUNDS[surface.regime if cfg.regime_detection else "normal_vol"]
        lo = np.array([b[0] for b in bounds])
        hi = np.array([b[1] for b in bounds])

        val_and_grad = jax.jit(jax.value_and_grad(
            lambda x: _objective_core(x, K, T, iv, surface.S0, surface.rate,
                                      n_terms=cfg.cos_n,
                                      use_vega_weighting=cfg.use_vega_weighting,
                                      min_weight=cfg.min_vega_weight,
                                      cos_L=cfg.cos_L,
                                      div_yield=surface.div_yield)))

        # The objective is a tiny host-latency-bound workload (dozens of
        # points x a few hundred COS terms), and its complex-valued gradient
        # chain degrades enough on the TPU backend that L-BFGS-B's line search
        # stalls at the initial guess (observed: err 7e-3 on-chip vs 5e-4 on
        # CPU). Pin evaluation to the CPU backend; scipy drives it host-side
        # anyway.
        try:
            cpu_dev = jax.devices("cpu")[0]
        except RuntimeError:
            cpu_dev = None

        def _eval(x: np.ndarray):
            x32 = np.asarray(x, np.float32)  # host array: no accelerator hop
            if cpu_dev is not None:
                with jax.default_device(cpu_dev):
                    return val_and_grad(jax.device_put(x32, cpu_dev))
            return val_and_grad(jnp.asarray(x32))

        def f(x: np.ndarray) -> float:
            v, _ = _eval(np.clip(x, lo, hi))
            v = float(v)
            return v if np.isfinite(v) else 1e6

        def f_and_g(x: np.ndarray):
            v, g = _eval(np.clip(x, lo, hi))
            v, g = float(v), np.asarray(g, np.float64)
            if not (np.isfinite(v) and np.all(np.isfinite(g))):
                return 1e6, np.zeros_like(g)
            return v, g

        return f, f_and_g, bounds

    def model_ivs(self, surface: MarketSurface,
                  params: Optional[HestonParams] = None) -> np.ndarray:
        """Model implied vols at the surface's observation points under
        ``params`` (default: the calibrated best) — the quantity the
        reference's diagnostics plot against market IVs
        (heston_calibration.py:597-709)."""
        p = params or self.best_params
        if p is None:
            raise ValueError("calibrate() first, or pass params")
        cfg = self.config
        K = jnp.asarray(surface.strikes, jnp.float32)
        T = jnp.asarray(surface.expiries, jnp.float32)
        prices = heston_cos_price(surface.S0, K, T, surface.rate, p, cp=1.0,
                                  n_terms=cfg.cos_n, L=cfg.cos_L,
                                  q=surface.div_yield)
        intrinsic = jnp.maximum(
            surface.S0 * jnp.exp(-surface.div_yield * T)
            - K * jnp.exp(-surface.rate * T), 0.0)
        prices = jnp.maximum(prices, intrinsic + 1e-6)
        return np.asarray(implied_vol(prices, surface.S0, K, T, surface.rate,
                                      cp=1.0, q=surface.div_yield))

    def plot_diagnostics(self, surface: MarketSurface, out_path: str):
        """Emit the 2x2 calibration diagnostics figure (the reference plots
        these as part of every calibrate run, heston_calibration.py:582-594)."""
        from options_model_tpu.utils.plotting import plot_calibration_results

        model = self.model_ivs(surface)
        vegas = np.asarray(bs_vega(surface.S0,
                                   jnp.asarray(surface.strikes, jnp.float32),
                                   jnp.asarray(surface.expiries, jnp.float32),
                                   surface.rate,
                                   jnp.asarray(surface.ivs, jnp.float32),
                                   q=surface.div_yield))
        return plot_calibration_results(
            np.asarray(surface.ivs, np.float64), model, vegas,
            self.best_params, self.best_error, surface.regime,
            out_path=out_path)

    def calibrate(self, surface: MarketSurface,
                  diagnostics_dir: Optional[str] = None) -> HestonParams:
        cfg = self.config
        f, f_and_g, bounds = self._make_objective(surface)
        x0 = _initial_guess(surface.regime, float(surface.ivs.mean()))
        if cfg.verbose:
            print(f"Calibrating to {len(surface)} points, regime={surface.regime}, "
                  f"avg IV={surface.ivs.mean():.4f}")

        best_x, best_fun, best_method = x0, np.inf, None
        for method in cfg.optimization_methods:
            try:
                if method == "L-BFGS-B":
                    res = minimize(f_and_g, x0, jac=True, method="L-BFGS-B",
                                   bounds=bounds,
                                   options={"maxiter": cfg.max_iterations,
                                            "ftol": cfg.tolerance,
                                            "gtol": cfg.tolerance})
                    ok, x, fun = res.success, res.x, res.fun
                elif method == "differential_evolution":
                    res = differential_evolution(
                        f, bounds, maxiter=min(cfg.max_iterations // 10, 200),
                        tol=cfg.tolerance, seed=cfg.seed, polish=True)
                    ok, x, fun = res.success, res.x, res.fun
                elif method == "dual_annealing":
                    res = dual_annealing(
                        f, bounds, maxiter=min(cfg.max_iterations // 5, 500),
                        seed=cfg.seed)
                    ok, x, fun = True, res.x, res.fun
                else:
                    if cfg.verbose:
                        print(f"Unknown optimization method: {method}")
                    continue
            except Exception as e:  # degrade-and-continue (SURVEY.md §5)
                if cfg.verbose:
                    print(f"Optimization with {method} failed: {e}")
                continue

            # Accept any strict improvement: optimizer success flags are
            # advisory (differential_evolution reports success=False on
            # maxiter even when it found a near-perfect point). The reference
            # required the flag and silently discarded better fits
            # (heston_calibration.py:549).
            if fun < best_fun:
                best_x, best_fun, best_method = x, fun, method
                if cfg.verbose:
                    flag = "" if ok else " (no convergence flag)"
                    print(f"  {method}: error {fun:.6f} (new best){flag}")
                # A gradient-converged local solve this good doesn't need the
                # global fallbacks; matching the reference's cascade-with-
                # fallback intent without its always-run-everything cost.
                if fun < 1e-4:
                    break
            elif cfg.verbose:
                print(f"  {method}: failed or worse ({fun:.6f})")

        try:
            self.best_params = HestonParams.from_array(best_x).validate()
            self.best_error = float(best_fun)
        except ValueError as e:
            if cfg.verbose:
                print(f"Final parameter validation failed: {e}; using defaults")
            avg_iv = float(surface.ivs.mean())
            self.best_params = HestonParams(kappa=2.0, theta=avg_iv**2, xi=0.3,
                                            rho=-0.5, v0=avg_iv**2)
            self.best_error = np.inf

        self.calibration_history.append({
            "timestamp": time.time(),
            "regime": surface.regime,
            "method": best_method,
            "error": float(best_fun),
            "params": self.best_params,
            "n_data_points": len(surface),
        })
        if diagnostics_dir is not None:
            os.makedirs(diagnostics_dir, exist_ok=True)
            self.plot_diagnostics(
                surface, os.path.join(diagnostics_dir,
                                      "heston_calibration.png"))
        return self.best_params

    def get_calibration_summary(self) -> Dict[str, Any]:
        """Summary dict (heston_calibration.py:711-728)."""
        if self.best_params is None:
            return {}
        p = self.best_params
        return {
            "parameters": {"kappa": p.kappa, "theta": p.theta, "xi": p.xi,
                           "rho": p.rho, "v0": p.v0},
            "error": self.best_error,
            "feller_condition": p.feller_condition(),
            "n_calibrations": len(self.calibration_history),
        }


def calibrate_heston_to_data(strikes, expiries, ivs, S0, rate=0.05,
                             config: Optional[CalibrationConfig] = None,
                             diagnostics_dir: Optional[str] = None,
                             div_yield: float = 0.0
                             ) -> Tuple[HestonParams, Dict[str, Any]]:
    """Convenience wrapper (calibrate_heston_to_data, heston_calibration.py:792-806)."""
    surface = MarketSurface(strikes=strikes, expiries=expiries, ivs=ivs,
                            S0=S0, rate=rate, div_yield=div_yield)
    calibrator = HestonCalibrator(config)
    params = calibrator.calibrate(surface, diagnostics_dir=diagnostics_dir)
    return params, calibrator.get_calibration_summary()


def calibrate_heston_to_ticker(ticker: str, rate: float = 0.05,
                               config: Optional[CalibrationConfig] = None
                               ) -> Tuple[HestonParams, Dict[str, Any]]:
    """Fetch the live option chain and calibrate
    (calibrate_heston_to_ticker, heston_calibration.py:777-790)."""
    from options_model_tpu.data.market import fetch_option_chain

    K, T, iv, S0 = fetch_option_chain(ticker)
    return calibrate_heston_to_data(K, T, iv, S0, rate, config)
