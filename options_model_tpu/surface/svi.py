"""SVI parametric implied-volatility surface (Gatheral) + Dupire local vol.

The reference's IV surface is a trained MLP (NN_training_stock_iv.py); SVI is
the industry's PARAMETRIC counterpart — five interpretable parameters per
expiry with closed-form no-arbitrage diagnostics — added here as a
beyond-reference alternative engine for the same two jobs:

  * smile representation: raw-SVI total variance per expiry slice
        w(k) = a + b (rho (k - m) + sqrt((k - m)^2 + s^2)),   k = log(K/F)
    fitted by f64 multi-start weighted least squares (exact JAX gradients,
    the calibration discipline of calibration/calibrator.py).
  * a local-volatility engine: unlike the NN engine, which follows the
    reference's IV-as-instantaneous-vol semantics (surface/model.sigma_fn,
    options_model_3/options_model_3.py:275-298), the SVI surface converts to
    TRUE Dupire local vol via Gatheral's formula on total variance

        sigma_loc^2(k, T) =
            dw/dT / [1 - k/w dw/dk
                     + 1/4 (-1/4 - 1/w + k^2/w^2) (dw/dk)^2 + 1/2 d2w/dk2]

    with the k-derivatives ANALYTIC in the SVI parameters and dw/dT from
    linear-in-total-variance interpolation across expiries. Repricing
    vanillas through the local-vol simulator is then consistent with the
    input smiles by construction (tested against Heston-COS surfaces).

No-arbitrage diagnostics (Gatheral & Jacquier 2014):
  * butterfly: g(k) >= 0 (the risk-neutral density's positivity), with
        g(k) = (1 - k w'/(2w))^2 - w'^2/4 (1/w + 1/4) + w''/2
  * calendar: w(k, T2) >= w(k, T1) for T2 > T1 on a k-grid.
"""

from __future__ import annotations

import dataclasses
from contextlib import nullcontext as _null
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SVISlice:
    """Raw-SVI parameters of one expiry's total-variance smile."""
    a: float
    b: float      # >= 0
    rho: float    # in (-1, 1)
    m: float
    s: float      # > 0 ("sigma" in the literature; s avoids the vol clash)

    def validate(self) -> "SVISlice":
        if self.b < 0:
            raise ValueError(f"b={self.b} must be non-negative")
        if not -1.0 < self.rho < 1.0:
            raise ValueError(f"rho={self.rho} must be in (-1, 1)")
        if self.s <= 0:
            raise ValueError(f"s={self.s} must be positive")
        if self.a + self.b * self.s * np.sqrt(1.0 - self.rho**2) < 0:
            raise ValueError("negative minimum total variance "
                             "(a + b s sqrt(1-rho^2) < 0)")
        return self


def svi_total_variance(k, sl: SVISlice):
    """w(k) = a + b (rho (k-m) + sqrt((k-m)^2 + s^2)); elementwise in k."""
    km = jnp.asarray(k) - sl.m
    return sl.a + sl.b * (sl.rho * km + jnp.sqrt(km**2 + sl.s**2))


def _w_and_k_derivs(k, sl: SVISlice):
    """(w, dw/dk, d2w/dk2) — analytic, no AD needed inside simulators."""
    km = jnp.asarray(k) - sl.m
    root = jnp.sqrt(km**2 + sl.s**2)
    w = sl.a + sl.b * (sl.rho * km + root)
    w1 = sl.b * (sl.rho + km / root)
    w2 = sl.b * sl.s**2 / root**3
    return w, w1, w2


def svi_butterfly_g(k, sl: SVISlice):
    """Gatheral-Jacquier density function g(k); g >= 0 everywhere iff the
    slice is butterfly-arbitrage-free."""
    w, w1, w2 = _w_and_k_derivs(k, sl)
    kk = jnp.asarray(k)
    return ((1.0 - kk * w1 / (2.0 * w))**2
            - 0.25 * w1**2 * (1.0 / w + 0.25) + 0.5 * w2)


def fit_svi_slice(F, T, strikes, ivs, weights=None, n_starts: int = 6
                  ) -> Tuple[SVISlice, dict]:
    """Fit one expiry's raw-SVI slice to (strikes, implied vols).

    Weighted least squares on TOTAL VARIANCE (w = iv^2 T — fitting w rather
    than iv keeps the objective smooth through the wings), f64 with exact
    gradients on host, multi-start over (m, rho) — the slice objective has
    mirror-image local minima in the wing assignment. Soft positivity
    (b, s > 0 via exp; |rho| < 1 via tanh) plus a penalty on negative
    minimum variance keeps every iterate statically arbitrage-plausible.
    """
    from scipy.optimize import minimize

    from options_model_tpu.calibration.calibrator import (
        _explicit_x64_scope, _try_enable_explicit_x64)

    K = np.asarray(strikes, np.float64)
    iv = np.asarray(ivs, np.float64)
    k_np = np.log(K / float(F))
    w_mkt = iv**2 * float(T)
    if weights is None:
        weights = np.exp(-0.5 * (k_np / 0.3) ** 2)   # vega-shaped, ATM peak
    wt = np.asarray(weights, np.float64)
    wt = wt / wt.sum()

    have_x64 = _try_enable_explicit_x64()
    dtype = jnp.float64 if have_x64 else jnp.float32
    scope = _explicit_x64_scope if have_x64 else None
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with (scope() if scope else _null()):
        k_j = jnp.asarray(k_np, dtype)
        w_j = jnp.asarray(w_mkt, dtype)
        wt_j = jnp.asarray(wt, dtype)

    w_scale = float(w_mkt.mean())   # normalize: raw w is O(1e-2), which
    # leaves L-BFGS-B's line search in ftol noise — measured stalls.

    def unpack(x):
        a = x[0] * w_scale
        b, rho, m, s = jnp.exp(x[1]), jnp.tanh(x[2]), x[3], jnp.exp(x[4])
        return a, b, rho, m, s

    def objective(x):
        a, b, rho, m, s = unpack(x)
        km = k_j - m
        w_model = a + b * (rho * km + jnp.sqrt(km**2 + s**2))
        resid = jnp.sqrt(jnp.sum(wt_j * ((w_model - w_j) / w_scale) ** 2))
        w_min = a + b * s * jnp.sqrt(1.0 - rho**2)
        return resid + 100.0 * jnp.maximum(-w_min / w_scale, 0.0)

    vg = jax.jit(jax.value_and_grad(objective))

    def f_np(x):
        xa = np.asarray(x, np.float64 if have_x64 else np.float32)
        with (scope() if scope else _null()):
            if cpu is not None:
                with jax.default_device(cpu):
                    v, g = vg(jax.device_put(xa, cpu))
            else:
                v, g = vg(jnp.asarray(xa))
        return float(v), np.asarray(g, np.float64)

    # data-driven seeds: the raw-SVI wings are asymptotically linear with
    # slopes b(1 +/- rho), so the measured wing slopes identify (b0, rho0);
    # m0 sits at the variance minimum, a0 just under it.
    order = np.argsort(k_np)
    k_s, w_s = k_np[order], w_mkt[order]
    i_min = int(np.argmin(w_s))
    m_seed = float(k_s[i_min])
    w_min_mkt = float(w_s[i_min])
    spread = max(float(k_s[-1] - k_s[0]), 0.2)
    sl_r = max((w_s[-1] - w_min_mkt) / max(k_s[-1] - m_seed, 1e-2), 1e-4)
    sl_l = max((w_s[0] - w_min_mkt) / max(m_seed - k_s[0], 1e-2), 1e-4)
    b_seed = 0.5 * (sl_r + sl_l)
    rho_seed = float(np.clip((sl_r - sl_l) / (sl_r + sl_l), -0.9, 0.9))
    starts = [(0.8 * w_min_mkt, b_seed, rho_seed, m_seed, 0.2 * spread),
              (0.5 * w_min_mkt, b_seed, rho_seed, m_seed, 0.05 * spread),
              (0.8 * w_min_mkt, 2.0 * b_seed, -rho_seed, 0.0, 0.2 * spread),
              (0.0, b_seed, 0.0, 0.0, 0.25 * spread),
              (0.8 * w_min_mkt, b_seed, -0.5, -0.25 * spread, 0.1 * spread),
              (0.8 * w_min_mkt, b_seed, 0.5, 0.25 * spread, 0.1 * spread)]
    best = None
    for a0, b0, r0, m0, s0 in starts[:n_starts]:
        x0 = np.array([a0 / w_scale, np.log(max(b0, 1e-6)),
                       np.arctanh(np.clip(r0, -0.95, 0.95)), m0,
                       np.log(max(s0, 1e-4))])
        res = minimize(f_np, x0, jac=True, method="L-BFGS-B",
                       options={"maxiter": 500, "ftol": 1e-15,
                                "gtol": 1e-13})
        if best is None or res.fun < best.fun:
            best = res
    xb = np.asarray(best.x, np.float64)
    a, b, rho, m, s = (float(xb[0]) * w_scale, float(np.exp(xb[1])),
                       float(np.tanh(xb[2])), float(xb[3]),
                       float(np.exp(xb[4])))
    sl = SVISlice(a=a, b=b, rho=rho, m=m, s=s).validate()
    iv_fit = np.sqrt(np.maximum(np.asarray(
        svi_total_variance(jnp.asarray(k_np), sl)), 1e-12) / float(T))
    rmse = float(np.sqrt(np.mean((iv_fit - iv) ** 2)))
    return sl, {"rmse_iv": rmse, "obj": float(best.fun),
                "success": bool(best.success)}


@dataclasses.dataclass(frozen=True)
class SVISurface:
    """Expiry-indexed raw-SVI surface under flat (r, q) carry.

    ``slices`` sorted by expiry; forwards F_i = S0 e^{(r-q) T_i}. Total
    variance between expiries interpolates LINEARLY in w at fixed k (flat
    extrapolation before the first and after the last expiry) — the standard
    calendar-consistent scheme when each w_i(k) is increasing in i.
    """
    S0: float
    rate: float
    div_yield: float
    expiries: Tuple[float, ...]
    slices: Tuple[SVISlice, ...]

    def iv(self, K, T):
        """Black-Scholes implied vol at (K, T) (elementwise broadcast)."""
        K = jnp.asarray(K, jnp.float32)
        T = jnp.asarray(T, jnp.float32)
        w = self._w_of_kT(self._k(K, T), T)
        return jnp.sqrt(jnp.maximum(w, 1e-10) / jnp.maximum(T, 1e-8))

    def _k(self, K, T):
        F = self.S0 * jnp.exp((self.rate - self.div_yield) * T)
        return jnp.log(K / F)

    def _w_all(self, k):
        """(n_expiries, ...) total variances of every slice at moneyness k."""
        return jnp.stack([svi_total_variance(k, sl) for sl in self.slices])

    def _w_of_kT(self, k, T):
        """Linear-in-w interpolation through a virtual T=0 anchor (w -> 0 as
        T -> 0: total variance vanishes at expiry-now), flat after the last
        expiry."""
        w_all = self._w_all(k)
        T = jnp.asarray(T, jnp.float32)
        if len(self.slices) == 1:
            # single expiry: scale to the T=0 anchor before it, flat after
            T1 = jnp.asarray(self.expiries[0], jnp.float32)
            return w_all[0] * jnp.minimum(T / T1, 1.0)
        Ts = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                              jnp.asarray(self.expiries, jnp.float32)])
        w_ext = jnp.concatenate([jnp.zeros_like(w_all[:1]), w_all])
        idx = jnp.clip(jnp.searchsorted(Ts, T, side="right") - 1, 0,
                       len(self.expiries) - 1)
        T0, T1 = Ts[idx], Ts[idx + 1]
        frac = jnp.clip((T - T0) / jnp.maximum(T1 - T0, 1e-8), 0.0, 1.0)
        return w_ext[idx] * (1.0 - frac) + w_ext[idx + 1] * frac

    # -- no-arbitrage diagnostics --------------------------------------------

    def check_butterfly(self, k_grid=None) -> dict:
        """min g(k) per slice; negative => butterfly arbitrage in that smile."""
        k = jnp.linspace(-1.5, 1.5, 301) if k_grid is None else jnp.asarray(k_grid)
        mins = [float(jnp.min(svi_butterfly_g(k, sl))) for sl in self.slices]
        return {"min_g": mins, "ok": all(m >= -1e-8 for m in mins)}

    def check_calendar(self, k_grid=None) -> dict:
        """min over k of w_{i+1} - w_i per adjacent pair; negative => calendar
        arbitrage (total variance must not decrease in T at fixed k)."""
        k = jnp.linspace(-1.5, 1.5, 301) if k_grid is None else jnp.asarray(k_grid)
        w_all = np.asarray(self._w_all(k))
        gaps = [float((w_all[i + 1] - w_all[i]).min())
                for i in range(len(self.slices) - 1)]
        return {"min_gap": gaps, "ok": all(g >= -1e-8 for g in gaps)}

    # -- simulator adapter -----------------------------------------------------

    def local_vol_fn(self, T_option: float) -> Callable:
        """sigma_loc(S_batch, tau) for models/localvol.simulate_local_vol.

        True Dupire local vol via Gatheral's total-variance formula (module
        docstring): analytic k-derivatives per slice, dw/dT from the linear-
        in-w interpolation (piecewise-constant between expiries). ``tau`` is
        time-to-expiry of the option: calendar time t = T_option - tau.
        """
        Ts = jnp.asarray(self.expiries, jnp.float32)
        n = len(self.slices)
        if n < 2:
            raise ValueError("local_vol_fn needs >= 2 expiries (dw/dT comes "
                             "from the inter-expiry total-variance slope)")

        def fn(S, tau):
            t = jnp.maximum(jnp.asarray(T_option, jnp.float32) - tau, 1e-6)
            F_t = self.S0 * jnp.exp((self.rate - self.div_yield) * t)
            k = jnp.log(jnp.asarray(S, jnp.float32) / F_t)
            triples = [_w_and_k_derivs(k, sl) for sl in self.slices]
            # virtual T=0 anchor: w(k, 0) = 0 (and so are its k-derivatives)
            # — without it, times before the first expiry would clamp onto
            # the [T1, T2] bracket (measured: -1.9% on a 0.75y vanilla whose
            # first third of calendar time sits below T1 = 0.25).
            zero = jnp.zeros_like(triples[0][0])[None]
            w_ext = jnp.concatenate([zero] + [tr[0][None] for tr in triples])
            w1_ext = jnp.concatenate([zero] + [tr[1][None] for tr in triples])
            w2_ext = jnp.concatenate([zero] + [tr[2][None] for tr in triples])
            Ts_ext = jnp.concatenate([jnp.zeros((1,), jnp.float32), Ts])
            idx = jnp.clip(jnp.searchsorted(Ts_ext, t, side="right") - 1,
                           0, n - 1)
            T0, T1 = Ts_ext[idx], Ts_ext[idx + 1]
            frac = jnp.clip((t - T0) / jnp.maximum(T1 - T0, 1e-8), 0.0, 1.0)

            def lerp(arr):
                return arr[idx] * (1.0 - frac) + arr[idx + 1] * frac

            w = jnp.maximum(lerp(w_ext), 1e-8)
            w1 = lerp(w1_ext)
            w2 = lerp(w2_ext)
            # dw/dT: slope of the linear-in-w bracket (clamped positive —
            # a calendar-clean surface has w increasing in T)
            dwdT = jnp.maximum((w_ext[idx + 1] - w_ext[idx])
                               / jnp.maximum(T1 - T0, 1e-8), 1e-8)
            denom = (1.0 - k * w1 / (2.0 * w)
                     + 0.25 * (-0.25 - 1.0 / w + k**2 / w**2) * w1**2
                     + 0.5 * w2)
            var_loc = dwdT / jnp.maximum(denom, 1e-4)
            return jnp.sqrt(jnp.clip(var_loc, 1e-6, 4.0))

        return fn


@dataclasses.dataclass(frozen=True)
class _PerMaturityLocalVol:
    """Curve-engine adapter factory. The sweep engine compiles one local-vol
    table per (maturity, steps) bucket; Dupire local vol needs the CALENDAR
    time t = T_bucket - tau, so the closure must bind each bucket's own
    maturity — `compute_curves` calls ``for_maturity(T)`` before compiling
    (apps/curves.py unwraps anything exposing that attribute)."""

    surf: "SVISurface"

    def for_maturity(self, T: float) -> Callable:
        return self.surf.local_vol_fn(T_option=float(T))

    def __call__(self, S, tau):
        raise TypeError(
            "per-maturity local-vol adapter: bind a maturity first via "
            ".for_maturity(T) (compute_curves does this per bucket)")


@dataclasses.dataclass(frozen=True)
class SVILocalVolEngine:
    """CLI engine wrapper, duck-typed to IVSurfaceModel's two simulator
    adapters (surface/model.py:121-150) so `--iv svi` routes through exactly
    the NN engine's local-vol sweep path (apps/cli.py)."""

    surf: SVISurface

    def sigma_fn(self, K: float = None, compute_dtype=None):
        # K is unused: Dupire local vol is a property of the surface, not of
        # the contract being priced (the NN engine's sigma_fn closes over K
        # only because its feature map is moneyness-parametrized).
        del K, compute_dtype
        return _PerMaturityLocalVol(self.surf)

    def get_sigma_iv(self, K: float, S0: float, tau: float) -> float:
        if K <= 0 or S0 <= 0 or tau <= 0:
            raise ValueError("K, S0, and tau must be positive")
        del S0  # the surface carries its own spot (forward convention)
        return float(self.surf.iv(K, tau))


def fit_svi_from_chain(strikes, expiries, ivs, S0, rate,
                       div_yield: float = 0.0, min_strikes: int = 5
                       ) -> Tuple[SVISurface, List[dict]]:
    """Fit the SVI surface from a FLATTENED option chain (the shape
    data/market.fetch_option_chain and data/synthetic.synthetic_smile_surface
    both return): group rows by expiry, drop expiries with fewer than
    ``min_strikes`` usable quotes (a raw-SVI slice has five parameters), fit
    each survivor. Needs >= 2 surviving expiries — the Dupire dw/dT term has
    no information in a single smile."""
    K = np.asarray(strikes, np.float64)
    T = np.asarray(expiries, np.float64)
    iv = np.asarray(ivs, np.float64)
    ok = (np.isfinite(K) & np.isfinite(T) & np.isfinite(iv)
          & (K > 0) & (T > 0) & (iv > 0))
    K, T, iv = K[ok], T[ok], iv[ok]
    rows_K, rows_iv, Ts = [], [], []
    for t in np.unique(np.round(T, 9)):
        m = np.abs(T - t) < 1e-9
        if int(m.sum()) < min_strikes:
            continue
        Ts.append(float(t))
        rows_K.append(K[m])
        rows_iv.append(iv[m])
    if len(Ts) < 2:
        raise ValueError(
            f"SVI surface fit needs >= 2 expiries with >= {min_strikes} "
            f"quotes each; chain has {len(Ts)}")
    return fit_svi_surface(S0, rate, Ts, rows_K, rows_iv,
                           div_yield=div_yield)


def fit_svi_surface(S0, rate, expiries: Sequence[float],
                    strike_rows: Sequence, iv_rows: Sequence,
                    div_yield: float = 0.0,
                    weights_rows: Optional[Sequence] = None
                    ) -> Tuple[SVISurface, List[dict]]:
    """Fit every expiry's slice and assemble the surface (sorted by T)."""
    order = np.argsort(np.asarray(expiries, np.float64))
    Ts, sls, infos = [], [], []
    for i in order:
        T = float(np.asarray(expiries)[i])
        F = S0 * np.exp((rate - div_yield) * T)
        w_row = None if weights_rows is None else weights_rows[i]
        sl, info = fit_svi_slice(F, T, strike_rows[i], iv_rows[i],
                                 weights=w_row)
        Ts.append(T)
        sls.append(sl)
        infos.append(info)
    surf = SVISurface(S0=float(S0), rate=float(rate),
                      div_yield=float(div_yield), expiries=tuple(Ts),
                      slices=tuple(sls))
    return surf, infos
