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
from contextlib import contextmanager, nullcontext as _nullcontext
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import differential_evolution, dual_annealing, minimize

from options_model_tpu.core.config import (BatesParams, CalibrationConfig,
                                           HestonParams, VGParams)
from options_model_tpu.calibration.charfn import (bates_cos_price,
                                                  heston_cos_price,
                                                  vg_cos_price)
from options_model_tpu.pricers.blackscholes import bs_vega, implied_vol
from options_model_tpu.utils.logging import get_logger

_log = get_logger("options_model_tpu.calibration")


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


# (lam, mu_j, sigma_j) bounds and guess for the Bates extension (beyond
# reference — it has no jump calibration). The jump triple is identified by
# the SHORT-maturity smile (diffusion smiles flatten like sqrt(T) as T -> 0;
# jump smiles don't), so Bates surfaces should include sub-3-month expiries.
_JUMP_BOUNDS = [(0.0, 3.0), (-0.5, 0.3), (0.01, 0.6)]
_JUMP_GUESS = np.array([0.3, -0.05, 0.15])

# Variance Gamma (sigma, theta, nu) bounds/guess (beyond reference). The
# martingale constraint theta*nu + sigma^2*nu/2 < 1 is enforced by an
# objective penalty (the box alone cannot express the joint constraint).
_VG_BOUNDS = [(0.03, 1.0), (-1.0, 0.5), (0.01, 2.0)]


def _vg_guess(avg_iv: float) -> np.ndarray:
    return np.array([avg_iv, -0.1, 0.3])


@partial(jax.jit, static_argnames=("n_terms", "use_vega_weighting", "dtype",
                                   "model"))
def _objective_core(x, strikes, expiries, market_ivs, S0, rate,
                    n_terms: int = 128, use_vega_weighting: bool = True,
                    min_weight: float = 0.01, cos_L: float = 12.0,
                    div_yield: float = 0.0, dtype=jnp.float32,
                    model: str = "heston"):
    """Vega-weighted RMSE of model-vs-market implied vols + Feller penalty.

    x = (kappa, theta, xi, rho, v0[, lam, mu_j, sigma_j] for model='bates')
    as a traced array — params are rebuilt inside so jax.grad differentiates
    straight through.

    ``dtype``: working precision of the COS -> IV chain. float64 puts the
    objective's noise floor below 1e-7 on EVERY backend (see the root-cause
    note in _make_objective); float32 leaves an ~1e-3 floor that stalls
    gradient line searches near good fits.
    """
    prices, gap = _model_prices_and_gap(
        x, strikes, expiries, S0, rate, n_terms, cos_L, div_yield, dtype,
        model)
    strikes = jnp.asarray(strikes, dtype)
    expiries = jnp.asarray(expiries, dtype)
    market_ivs = jnp.asarray(market_ivs, dtype)
    S0 = jnp.asarray(S0, dtype)
    rate = jnp.asarray(rate, dtype)
    div_yield = jnp.asarray(div_yield, dtype)
    weighted_rmse = _iv_rmse(prices, strikes, expiries, market_ivs, S0, rate,
                             div_yield, use_vega_weighting, min_weight)
    return weighted_rmse + 100.0 * jnp.maximum(gap, 0.0)


def _model_prices_and_gap(x, strikes, expiries, S0, rate, n_terms, cos_L,
                          div_yield, dtype, model):
    """COS prices under params x, plus the model's constraint gap (Feller
    for Heston/Bates, martingale-clock for VG; penalized when > 0)."""
    x = jnp.asarray(x, dtype)
    strikes = jnp.asarray(strikes, dtype)
    expiries = jnp.asarray(expiries, dtype)
    S0 = jnp.asarray(S0, dtype)
    rate = jnp.asarray(rate, dtype)
    div_yield = jnp.asarray(div_yield, dtype)
    if model == "vg":
        params = VGParams(sigma=x[0], theta=x[1], nu=x[2])
        prices = vg_cos_price(S0, strikes, expiries, rate, params, cp=1.0,
                              n_terms=n_terms, L=cos_L, q=div_yield,
                              dtype=dtype)
        # joint-constraint penalty replaces the (Heston-only) Feller term
        gap = x[1] * x[2] + 0.5 * x[0] ** 2 * x[2] - 0.98
        return prices, gap
    hp = HestonParams(kappa=x[0], theta=x[1], xi=x[2], rho=x[3], v0=x[4])
    if model == "bates":
        params = BatesParams(heston=hp, lam=x[5], mu_j=x[6], sigma_j=x[7])
        prices = bates_cos_price(S0, strikes, expiries, rate, params, cp=1.0,
                                 n_terms=n_terms, L=cos_L, q=div_yield,
                                 dtype=dtype)
    else:
        prices = heston_cos_price(S0, strikes, expiries, rate, hp, cp=1.0,
                                  n_terms=n_terms, L=cos_L, q=div_yield,
                                  dtype=dtype)
    return prices, x[2] ** 2 - 2.0 * x[0] * x[1]


def _residuals_core(x, strikes, expiries, market_ivs, S0, rate,
                    n_terms: int = 128, use_vega_weighting: bool = True,
                    min_weight: float = 0.01, cos_L: float = 12.0,
                    div_yield: float = 0.0, dtype=jnp.float32,
                    model: str = "heston"):
    """Weighted IV residual VECTOR for least-squares solvers: r_i =
    sqrt(w_i / sum w) * (model_iv_i - market_iv_i), so sum r^2 equals the
    squared weighted RMSE _objective_core reports, plus one quadratic
    constraint-penalty residual. Trust-region least squares navigates the
    kappa-theta ridge (a razor-thin curved valley; measured dRMSE/dtheta ~
    -280 at points where L-BFGS-B's line search aborts ABNORMAL) far more
    robustly than quasi-Newton on the scalarized objective."""
    prices, gap = _model_prices_and_gap(
        x, strikes, expiries, S0, rate, n_terms, cos_L, div_yield, dtype,
        model)
    strikes = jnp.asarray(strikes, dtype)
    expiries = jnp.asarray(expiries, dtype)
    market_ivs = jnp.asarray(market_ivs, dtype)
    S0 = jnp.asarray(S0, dtype)
    rate = jnp.asarray(rate, dtype)
    div_yield = jnp.asarray(div_yield, dtype)
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
    resid = jnp.sqrt(w / jnp.sum(w)) * (model_ivs - market_ivs)
    # INTENTIONALLY quadratic (100*gap^2 after the solver squares it),
    # NOT the scalar objective's linear 100*gap (ADVICE r4 flagged the
    # mismatch): the quadratic's gradient grows with the violation, so the
    # TRF polish is actively repelled from the Feller boundary where the
    # noisy objective's spurious ridge minima live. Measured on the
    # recorded-chain e2e fixture (tests/test_livechain_e2e.py): with the
    # "consistent" linear penalty the polish accepts a near-boundary point
    # at kappa 1.41 / theta 0.0552 (true 0.045, tolerance 0.01) and the
    # repricing closure fails; the quadratic form recovers theta within
    # tolerance. The cost is the one the advisor named — the scalar
    # acceptance gate may discard TRF minima hugging the boundary — which
    # is exactly the intended filter.
    pen = 10.0 * jnp.maximum(gap, 0.0)  # squared by the solver -> 100*gap^2
    return jnp.concatenate([resid, pen[None]])


def _iv_rmse(prices, strikes, expiries, market_ivs, S0, rate, div_yield,
             use_vega_weighting, min_weight):
    """Vega-weighted IV RMSE of COS prices vs market IVs — the model-
    independent tail of the objective (shared by all COS families)."""
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
    return jnp.sqrt(jnp.sum(w * err**2) / jnp.sum(w))


@contextmanager
def _explicit_x64_scope():
    """Temporarily allow explicit float64/complex128 dtypes (JAX 'explicit
    x64' mode) without flipping the global x64 default — and, crucially,
    RESTORE the previous mode on exit. Leaving the flag flipped would change
    dtype canonicalization (np.float64 inputs no longer downcast to f32)
    library-wide as a side effect of one calibration — and f64 HestonParams
    leaking into the complex chain means a complex128 program, which the
    accelerator backend cannot compile. Yields True when the mode switch
    itself succeeded."""
    try:
        old = jax.config.jax_explicit_x64_dtypes
    except AttributeError:
        old = None
    ok = False
    try:
        try:
            jax.config.update("jax_explicit_x64_dtypes", "allow")
            ok = True
        except TypeError:
            from jax._src.config import ExplicitX64Mode
            jax.config.update("jax_explicit_x64_dtypes", ExplicitX64Mode.ALLOW)
            ok = True
        except Exception:
            pass
    except Exception:
        pass
    try:
        yield ok
    finally:
        if ok and old is not None:
            try:
                jax.config.update("jax_explicit_x64_dtypes", old)
            except Exception:
                pass


def _try_enable_explicit_x64() -> bool:
    """True if explicit-f64 arrays are honored inside _explicit_x64_scope()
    — probed on the CPU device when one exists, because that is where the f64
    objective actually evaluates (probing the default accelerator would gate
    the fix on the wrong backend). Does NOT leave the mode flipped."""
    with _explicit_x64_scope() as ok:
        if not ok:
            return False
        try:
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return jnp.zeros((), jnp.float64).dtype == jnp.float64
            return jnp.zeros((), jnp.float64).dtype == jnp.float64
        except Exception:
            return False


class HestonCalibrator:
    """Optimizer cascade around the differentiable COS objective.

    ``model='bates'`` extends the parameter vector with the lognormal jump
    triple (lam, mu_j, sigma_j) and swaps the COS pricer — everything else
    (f64-on-CPU objective, exact gradients, kappa multi-start, cascade,
    history, diagnostics) is shared. Beyond-reference: the reference
    calibrates Heston only."""

    def __init__(self, config: Optional[CalibrationConfig] = None,
                 model: str = "heston"):
        if model not in ("heston", "bates", "vg"):
            raise ValueError(f"model must be 'heston', 'bates' or 'vg', "
                             f"got {model!r}")
        self.config = (config or CalibrationConfig()).validate()
        self.model = model
        self.best_params: Optional[HestonParams] = None
        self.best_error: float = np.inf
        self.calibration_history: List[Dict[str, Any]] = []

    def _make_objective(self, surface: MarketSurface):
        cfg = self.config
        if self.model == "vg":
            bounds = list(_VG_BOUNDS)
        else:
            bounds = list(_REGIME_BOUNDS[surface.regime
                                         if cfg.regime_detection
                                         else "normal_vol"])
            if self.model == "bates":
                bounds = bounds + _JUMP_BOUNDS
        lo = np.array([b[0] for b in bounds])
        hi = np.array([b[1] for b in bounds])

        # ROOT CAUSE of the r1/r2 "on-chip calibration degradation" (observed
        # err 7e-3 on TPU vs 5e-4 on CPU; VERDICT r2 weak #3), measured on the
        # real chip (r3):
        #   1. In float32 the COS chain carries an ~2e-3 ABSOLUTE price noise
        #      floor: every one of the n_terms series terms is f32-rounded
        #      (per-term backend differences <= 5e-5 — ulp-level omega/trig
        #      rounding, NOT a TPU defect), and the rounding is coherent
        #      across k, so the series sums ~n_terms/20 of it. Through the IV
        #      solve that is ~1e-2 IV error on deep-OTM points (vega-weighted
        #      down to ~1e-3 in the objective).
        #   2. The synthetic test surfaces are GENERATED through the CPU f32
        #      COS+IV chain (synthetic.py), so the CPU objective's floor on
        #      them is artificially low — the data's rounding is correlated
        #      with the CPU objective's. Any other backend bottoms out at the
        #      cross-backend floor (~1e-3), where L-BFGS-B's line search
        #      stalls: at that scale the f32 objective surface is jagged and
        #      value differences between nearby x are noise.
        # FIX: evaluate the objective in float64 (explicit-x64 dtypes; the
        # library default stays f32). The floor drops below 1e-7, and with
        # the kappa multi-start below, f64-data round-trips recover every
        # parameter to <1% (observed ~0.01%; weighted IV RMSE <1e-4 asserted
        # in tests/test_calibration.py::TestCalibration::
        # test_round_trip_f64_data_recovers_tightly). On accelerators the
        # objective evaluates f64-on-CPU: scipy drives it host-side and the
        # workload is host-latency-bound, so the chip buys nothing — and the
        # axon remote compiler SIGABRTs on complex128 (a wasted multi-minute
        # failed compile if attempted). Last-resort fallback: f32 on CPU
        # (never f32 on an accelerator — that is the broken combination).
        try:
            cpu_dev = jax.devices("cpu")[0]
        except RuntimeError:
            cpu_dev = None
        have_x64 = _try_enable_explicit_x64()
        default_is_cpu = jax.default_backend() == "cpu"
        candidates = []
        if have_x64:
            if default_is_cpu:
                candidates.append((jnp.float64, None))
            if cpu_dev is not None:
                candidates.append((jnp.float64, cpu_dev))
        if cpu_dev is not None:
            candidates.append((jnp.float32, cpu_dev))
        candidates.append((jnp.float32, None))

        x0 = self._x0(surface)
        x0 = np.clip(x0, lo, hi)
        val_and_grad = None
        for dtype, dev in candidates:
            # The f64 surface arrays must be created INSIDE the scope too —
            # outside it they are silently truncated to f32, which would
            # reintroduce the exact data-rounding floor the f64 path removes.
            with (_explicit_x64_scope() if dtype == jnp.float64
                  else _nullcontext()):
                K = jnp.asarray(surface.strikes, dtype)
                T = jnp.asarray(surface.expiries, dtype)
                iv = jnp.asarray(surface.ivs, dtype)
            # VG needs a much longer COS series on short-dated points: its
            # char-fn decays only POLYNOMIALLY (|phi| ~ u^{-2T/nu}; the
            # density has an x^{T/nu - 1} singularity at small T). Measured
            # f64 price error at T=7d: 5e-3 @128 terms, 2e-3 @256, 6e-6
            # @2048 — the default cos_n=128 would put a ~1e-2 floor under
            # the whole objective. O(points x terms) is still trivial.
            n_terms = max(cfg.cos_n, 2048) if self.model == "vg" else cfg.cos_n
            vg = jax.jit(jax.value_and_grad(
                lambda x, K=K, T=T, iv=iv, dtype=dtype, n_terms=n_terms:
                _objective_core(
                    x, K, T, iv, surface.S0, surface.rate,
                    n_terms=n_terms,
                    use_vega_weighting=cfg.use_vega_weighting,
                    min_weight=cfg.min_vega_weight,
                    cos_L=cfg.cos_L,
                    div_yield=surface.div_yield, dtype=dtype,
                    model=self.model)))

            def _eval(x, vg=vg, dtype=dtype, dev=dev):
                # f64 candidates need explicit-x64 mode live for every
                # evaluation (scipy drives these host-side long after
                # _make_objective returned); the scope restores the global
                # mode on exit so nothing leaks between optimizer steps.
                xa = np.asarray(x, np.float64 if dtype == jnp.float64
                                else np.float32)
                ctx = (_explicit_x64_scope() if dtype == jnp.float64
                       else _nullcontext())
                with ctx:
                    if dev is not None:
                        with jax.default_device(dev):
                            return vg(jax.device_put(xa, dev))
                    return vg(jnp.asarray(xa))

            try:  # one probe evaluation validates compile + finite output
                v0, g0 = _eval(x0)
                if np.isfinite(float(v0)) and np.all(np.isfinite(
                        np.asarray(g0, np.float64))):
                    val_and_grad = _eval
                    self._objective_dtype = np.dtype(
                        np.float64 if dtype == jnp.float64 else np.float32)
                    self._objective_jax_dtype = dtype
                    self._objective_device = dev
                    if dtype == jnp.float32 and dev is None \
                            and jax.default_backend() != "cpu":
                        # The diagnosed-broken combination (see the root-cause
                        # note above) — reachable only when every CPU/f64
                        # candidate failed. Never silently: the ~1e-3
                        # objective floor stalls the optimizer near good fits.
                        _log.warning(
                            "calibration objective fell back to float32 on "
                            "the %s backend — expect a ~1e-3 objective noise "
                            "floor and degraded fits (f64/CPU candidates all "
                            "failed)", jax.default_backend())
                    break
            except Exception:
                continue
        if val_and_grad is None:
            raise RuntimeError("no backend could evaluate the calibration "
                               "objective")

        def f(x: np.ndarray) -> float:
            v, _ = val_and_grad(np.clip(x, lo, hi))
            v = float(v)
            return v if np.isfinite(v) else 1e6

        def f_and_g(x: np.ndarray):
            v, g = val_and_grad(np.clip(x, lo, hi))
            v, g = float(v), np.asarray(g, np.float64)
            if not (np.isfinite(v) and np.all(np.isfinite(g))):
                return 1e6, np.zeros_like(g)
            return v, g

        return f, f_and_g, bounds

    def _least_squares_polish(self, surface: MarketSurface, x_start,
                              bounds, f):
        """Trust-region least-squares refinement from a quasi-Newton terminal
        point. On noisy market chains L-BFGS-B routinely aborts its line
        search mid-descent inside the kappa-theta ridge (scipy status
        ABNORMAL with |grad| still O(100); measured on the recorded-chain
        fixture: stuck at 1.8x the reachable objective). scipy's TRF on the
        weighted residual vector (_residuals_core) with an AD Jacobian
        follows the curved valley to its floor. Returns (x, f(x)) — caller
        accepts on true-objective improvement only."""
        from scipy.optimize import least_squares

        cfg = self.config
        dtype = getattr(self, "_objective_jax_dtype", jnp.float32)
        dev = getattr(self, "_objective_device", None)
        n_terms = max(cfg.cos_n, 2048) if self.model == "vg" else cfg.cos_n
        with (_explicit_x64_scope() if dtype == jnp.float64
              else _nullcontext()):
            K = jnp.asarray(surface.strikes, dtype)
            T = jnp.asarray(surface.expiries, dtype)
            iv = jnp.asarray(surface.ivs, dtype)

        def core(x):
            return _residuals_core(
                x, K, T, iv, surface.S0, surface.rate, n_terms=n_terms,
                use_vega_weighting=cfg.use_vega_weighting,
                min_weight=cfg.min_vega_weight, cos_L=cfg.cos_L,
                div_yield=surface.div_yield, dtype=dtype, model=self.model)

        resid_jit = jax.jit(core)
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32

        def _call(x):
            xa = np.asarray(x, np_dtype)
            ctx = (_explicit_x64_scope() if dtype == jnp.float64
                   else _nullcontext())
            with ctx:
                if dev is not None:
                    with jax.default_device(dev):
                        return np.asarray(resid_jit(jax.device_put(xa, dev)),
                                          np.float64)
                return np.asarray(resid_jit(jnp.asarray(xa)), np.float64)

        lo = np.array([b[0] for b in bounds])
        hi = np.array([b[1] for b in bounds])
        x0 = np.clip(np.asarray(x_start, np.float64), lo, hi)
        # Jacobian by 2-point differences, not AD: jacrev through the COS
        # custom_vjp + implicit-IV chain measured 20 s PER CALL on CPU,
        # while 4 extra residual evals per Jacobian cost milliseconds.
        # diff_step is load-bearing: scipy's default sqrt(eps)~1.5e-8
        # relative step sits INSIDE the f64 COS chain's evaluation wobble, so
        # the FD Jacobian picks up noise, the trust region collapses, and the
        # solve xtol-terminates mid-valley (measured on the recorded chain:
        # stuck at rmse 0.0092 where 1e-5 steps reach 0.00513 in ~45 nfev —
        # and default-step success varies RUN TO RUN with ulp-level codegen
        # differences). 1e-5 relative steps clear the noise by ~3 orders
        # while the O(h^2) truncation stays ~1e-8. The f32 fallback's ~1e-6
        # residual noise needs proportionally larger steps.
        res = least_squares(
            _call, x0, jac="2-point",
            diff_step=1e-5 if dtype == jnp.float64 else 1e-3,
            bounds=(lo, hi), method="trf", x_scale="jac",
            ftol=1e-14, xtol=1e-14, gtol=1e-14, max_nfev=400)
        # One fresh-trust-region restart while it keeps paying: the first
        # solve occasionally xtol-terminates on a ridge shoulder.
        for _ in range(2):
            prev = res.cost
            res2 = least_squares(
                _call, res.x, jac="2-point",
                diff_step=1e-5 if dtype == jnp.float64 else 1e-3,
                bounds=(lo, hi), method="trf", x_scale="jac",
                ftol=1e-14, xtol=1e-14, gtol=1e-14, max_nfev=400)
            if res2.cost < prev:
                res = res2
            if res2.cost >= prev * (1.0 - 1e-6):
                break
        return res.x, f(res.x)

    def _x0(self, surface: MarketSurface) -> np.ndarray:
        if self.model == "vg":
            return _vg_guess(float(surface.ivs.mean()))
        x0 = _initial_guess(surface.regime, float(surface.ivs.mean()))
        if self.model == "bates":
            x0 = np.concatenate([x0, _JUMP_GUESS])
        return x0

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
        pricer = (bates_cos_price if isinstance(p, BatesParams)
                  else vg_cos_price if isinstance(p, VGParams)
                  else heston_cos_price)
        # same short-maturity series-length rule as the objective (see
        # _make_objective's n_terms note)
        n_terms = (max(cfg.cos_n, 2048) if isinstance(p, VGParams)
                   else cfg.cos_n)
        prices = pricer(surface.S0, K, T, surface.rate, p, cp=1.0,
                        n_terms=n_terms, L=cfg.cos_L,
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
        # Remembered for get_calibration_summary: which IV regime picked the
        # bounds/guess (tests assert detection across low/normal/high levels).
        self.last_regime = surface.regime
        f, f_and_g, bounds = self._make_objective(surface)
        x0 = self._x0(surface)
        if cfg.verbose:
            print(f"Calibrating to {len(surface)} points, regime={surface.regime}, "
                  f"avg IV={surface.ivs.mean():.4f}")

        best_x, best_fun, best_method = x0, np.inf, None
        for method in cfg.optimization_methods:
            try:
                if method == "L-BFGS-B":
                    # Multi-start over kappa: the mean-reversion speed is the
                    # weakly identified direction (kappa and xi/theta trade
                    # off near-degenerately over short maturities), so a
                    # single start routinely converges with kappa pinned at
                    # its guess (observed: true kappa 2.5, fit 4.0026, err
                    # 9.8e-4 — three orders above the f64 objective's floor).
                    # Gradient solves are ~1 s each; best-of-starts recovers
                    # every parameter to ~0.1% on clean data.
                    ok, x, fun = False, x0, np.inf
                    lo_k, hi_k = bounds[0]
                    if self.model == "vg":
                        # nu (x[2]) is the weakly-started direction here:
                        # short surfaces identify total kurtosis, and a bad
                        # clock-variance start trades off against theta.
                        kappas = {float(x0[0])}
                        lo_n, hi_n = bounds[2]
                        nus = sorted({float(np.clip(n_, lo_n, hi_n))
                                      for n_ in (0.1, x0[2], 0.8)})
                    else:
                        kappas = {float(np.clip(k, lo_k, hi_k))
                                  for k in (x0[0], 1.0, 2.0, 6.0)}
                        nus = [None]
                    if self.model == "bates":
                        # lam is the second weakly-started direction: from a
                        # bad intensity guess the solver parks in a
                        # jump/diffusion trade-off valley (observed: RMSE
                        # 4e-3 from lam0=1.0 where lam0=0.1 reaches 2e-9).
                        lo_l, hi_l = bounds[5]
                        lams = sorted({float(np.clip(l, lo_l, hi_l))
                                       for l in (0.1, x0[5], 1.0)})
                    else:
                        lams = [None]
                    starts = [(k0, l0, n0) for k0 in sorted(kappas)
                              for l0 in lams for n0 in nus]
                    for k0, l0, n0 in starts:
                        xs = np.array(x0)
                        xs[0] = k0
                        if l0 is not None:
                            xs[5] = l0
                        if n0 is not None:
                            xs[2] = n0
                        # ftol/gtol pinned to the f64 objective's floor, NOT
                        # cfg.tolerance: with exact f64 gradients the solver
                        # keeps making real progress far below 1e-8 (the
                        # 8-param Bates fit stalls at RMSE ~1e-3 under
                        # ftol=gtol=1e-8 but reaches ~2e-9 under these).
                        # cfg.tolerance still governs the global fallbacks
                        # and the cascade acceptance thresholds.
                        res = minimize(f_and_g, xs, jac=True,
                                       method="L-BFGS-B", bounds=bounds,
                                       options={"maxiter": cfg.max_iterations,
                                                "ftol": 1e-14,
                                                "gtol": 1e-12})
                        if res.fun < fun:
                            ok, x, fun = res.success, res.x, res.fun
                        if fun < 1e-7:  # already at the f64 floor
                            break
                    if fun > 1e-7:
                        # Noisy data leaves the quasi-Newton terminal mid-
                        # valley (ABNORMAL line search, see
                        # _least_squares_polish); TRF rides the ridge to the
                        # floor. Accepted on true-objective improvement only.
                        try:
                            x_ls, f_ls = self._least_squares_polish(
                                surface, x, bounds, f)
                            if f_ls < fun:
                                ok, x, fun = True, x_ls, f_ls
                        except Exception as e:
                            if cfg.verbose:
                                print(f"  least-squares polish failed: {e}")
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

        param_cls = (BatesParams if self.model == "bates"
                     else VGParams if self.model == "vg" else HestonParams)
        try:
            self.best_params = param_cls.from_array(best_x).validate()
            self.best_error = float(best_fun)
        except ValueError as e:
            if cfg.verbose:
                print(f"Final parameter validation failed: {e}; using defaults")
            avg_iv = float(surface.ivs.mean())
            if self.model == "vg":
                fallback = VGParams(sigma=avg_iv, theta=-0.1, nu=0.3)
            else:
                fallback = HestonParams(kappa=2.0, theta=avg_iv**2, xi=0.3,
                                        rho=-0.5, v0=avg_iv**2)
                if self.model == "bates":
                    fallback = BatesParams(heston=fallback, lam=0.0,
                                           mu_j=0.0, sigma_j=0.1)
            self.best_params = fallback
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
        if isinstance(p, VGParams):
            return {
                "parameters": {"sigma": p.sigma, "theta": p.theta,
                               "nu": p.nu},
                "error": self.best_error,
                "n_calibrations": len(self.calibration_history),
            }
        hp = p.heston if isinstance(p, BatesParams) else p
        params = {"kappa": hp.kappa, "theta": hp.theta, "xi": hp.xi,
                  "rho": hp.rho, "v0": hp.v0}
        if isinstance(p, BatesParams):
            params.update({"lam": p.lam, "mu_j": p.mu_j,
                           "sigma_j": p.sigma_j})
        return {
            "parameters": params,
            "error": self.best_error,
            "feller_condition": p.feller_condition(),
            "n_calibrations": len(self.calibration_history),
            "regime": getattr(self, "last_regime", None),
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


def calibrate_bates_to_data(strikes, expiries, ivs, S0, rate=0.05,
                            config: Optional[CalibrationConfig] = None,
                            diagnostics_dir: Optional[str] = None,
                            div_yield: float = 0.0
                            ) -> Tuple[BatesParams, Dict[str, Any]]:
    """Joint Heston + lognormal-jump calibration (beyond-reference). The jump
    triple is identified by short-dated smiles — include sub-3-month expiries
    (see _JUMP_BOUNDS note)."""
    surface = MarketSurface(strikes=strikes, expiries=expiries, ivs=ivs,
                            S0=S0, rate=rate, div_yield=div_yield)
    calibrator = HestonCalibrator(config, model="bates")
    params = calibrator.calibrate(surface, diagnostics_dir=diagnostics_dir)
    return params, calibrator.get_calibration_summary()


def calibrate_vg_to_data(strikes, expiries, ivs, S0, rate=0.05,
                         config: Optional[CalibrationConfig] = None,
                         diagnostics_dir: Optional[str] = None,
                         div_yield: float = 0.0
                         ) -> Tuple[VGParams, Dict[str, Any]]:
    """Variance Gamma (sigma, theta, nu) calibration (beyond-reference) —
    the same f64 COS objective/cascade with the VG char-fn and a martingale
    constraint penalty replacing the Feller term."""
    surface = MarketSurface(strikes=strikes, expiries=expiries, ivs=ivs,
                            S0=S0, rate=rate, div_yield=div_yield)
    calibrator = HestonCalibrator(config, model="vg")
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
