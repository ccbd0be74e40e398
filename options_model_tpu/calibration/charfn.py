"""Heston characteristic function and COS European pricing.

Characteristic function in the numerically stable "little Heston trap"
formulation (Albrecher et al. 2007): the branch choice with -d keeps the complex
log single-valued for long maturities. Pricing via the COS method of Fang &
Oosterlee (2008) with cumulant-based truncation.

Everything is jnp-native (complex64/complex128), vectorizes over a strike x
maturity surface in one shot, and is differentiable in the Heston parameters —
which is what makes the calibrator's least squares gradient-driven instead of
the reference's derivative-free MC cascade (heston_calibration.py:474-520).

Validated against the framework's own Heston Monte Carlo (tests/test_calibration.py)
and the Black-Scholes limit xi -> 0, v0 = theta.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams


@jax.custom_vjp
def creal(z):
    """Real part with a dtype-correct reverse rule.

    jnp.real's built-in transpose materializes the cotangent's zero imaginary
    part as float32 under explicit-x64 mode (jax 0.9), so reverse-mode AD
    through a complex128 chain dies with "lax.complex requires arguments to
    have the same dtypes". This wrapper builds the complex cotangent from
    zeros_like(ct) — the calibrator's f64 gradient path depends on it."""
    return jnp.real(z)


def _creal_fwd(z):
    return jnp.real(z), None


def _creal_bwd(_, ct):
    return (jax.lax.complex(ct, jnp.zeros_like(ct)),)


creal.defvjp(_creal_fwd, _creal_bwd)


def heston_charfn(u, T, r, params: HestonParams, dtype=jnp.complex64,
                  q=0.0):
    """phi(u) = E[exp(i u ln(S_T/S0))] under Heston risk-neutral dynamics.

    u: (...,) real or complex frequencies. Returns complex array shaped like u
    broadcast with T. The spot enters separately (pricing adds i*u*ln(S0/K)).
    ``q``: continuous dividend yield — the log-price drift is (r - q).
    """
    u = jnp.asarray(u, dtype)
    T = jnp.asarray(T, jnp.real(jnp.zeros((), dtype)).dtype)
    kappa = params.kappa
    theta = params.theta
    xi = params.xi
    rho = params.rho
    v0 = params.v0

    iu = 1j * u
    beta = kappa - rho * xi * iu
    d = jnp.sqrt(beta**2 + xi**2 * (iu + u**2))
    # (beta - d) computed via the exact identity (beta-d)(beta+d) = -xi^2(iu+u^2):
    # the naive difference cancels catastrophically in complex64 for small xi.
    ratio = -(iu + u**2) / (beta + d)        # == (beta - d) / xi^2
    bmd = ratio * xi**2                       # == beta - d, stably
    # Little-trap branch: g2 = (beta - d) / (beta + d)
    g2 = bmd / (beta + d)
    exp_dT = jnp.exp(-d * T)
    log_term = jnp.log((1.0 - g2 * exp_dT) / (1.0 - g2))
    A = kappa * theta * (ratio * T) - (2.0 * kappa * theta / xi**2) * log_term
    B = ratio * ((1.0 - exp_dT) / (1.0 - g2 * exp_dT))
    return jnp.exp(iu * (r - q) * T + A + B * v0)


def _heston_cumulants(T, r, params: HestonParams, q=0.0):
    """First two cumulants of ln(S_T/S0) (Fang & Oosterlee 2008, Table 11)."""
    kappa, theta, xi, rho, v0 = (params.kappa, params.theta, params.xi,
                                 params.rho, params.v0)
    ekt = jnp.exp(-kappa * T)
    c1 = (r - q) * T + (1.0 - ekt) * (theta - v0) / (2.0 * kappa) - 0.5 * theta * T
    c2 = (1.0 / (8.0 * kappa**3)) * (
        xi * T * kappa * ekt * (v0 - theta) * (8.0 * kappa * rho - 4.0 * xi)
        + kappa * rho * xi * (1.0 - ekt) * (16.0 * theta - 8.0 * v0)
        + 2.0 * theta * kappa * T * (-4.0 * kappa * rho * xi + xi**2 + 4.0 * kappa**2)
        + xi**2 * ((theta - 2.0 * v0) * jnp.exp(-2.0 * kappa * T)
                   + theta * (6.0 * ekt - 7.0) + 2.0 * v0)
        + 8.0 * kappa**2 * (v0 - theta) * (1.0 - ekt)
    )
    return c1, jnp.maximum(c2, 1e-12)


def _cos_coeffs_call(k, a, b):
    """COS payoff coefficients U_k for a call on x = ln(S_T/K): payoff K(e^x - 1)^+
    over [0, b]. chi/psi as in Fang-Oosterlee eq. (22)-(23)."""
    c, d = 0.0, b
    omega = k * jnp.pi / (b - a)
    # chi_k(c, d) = int_c^d e^x cos(omega (x - a)) dx
    chi = (1.0 / (1.0 + omega**2)) * (
        jnp.cos(omega * (d - a)) * jnp.exp(d)
        - jnp.cos(omega * (c - a)) * jnp.exp(c)
        + omega * jnp.sin(omega * (d - a)) * jnp.exp(d)
        - omega * jnp.sin(omega * (c - a)) * jnp.exp(c)
    )
    # psi_k(c, d) = int_c^d cos(omega (x - a)) dx
    psi_k0 = d - c
    psi_k = jnp.where(k == 0, psi_k0,
                      (jnp.sin(omega * (d - a)) - jnp.sin(omega * (c - a)))
                      / jnp.where(k == 0, 1.0, omega))
    return (2.0 / (b - a)) * (chi - psi_k)


def _cos_price_core(S0, K, T, r, q, cp, n_terms, L, dtype, charfn_fn,
                    cumulant_fn):
    """Shared COS pricing machinery (Fang-Oosterlee): truncation range from
    the first two cumulants, call coefficients, put-call parity. ``charfn_fn``
    maps (omega (M,N), Tf (M,1), cdtype) -> phi; ``cumulant_fn`` maps
    Tf (M,) -> (c1, c2)."""
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    K = jnp.asarray(K, dtype)
    T = jnp.asarray(T, dtype)
    K, T = jnp.broadcast_arrays(K, T)
    shape = K.shape
    Kf = K.reshape(-1)
    Tf = T.reshape(-1)
    S0 = jnp.asarray(S0, dtype)
    r = jnp.asarray(r, dtype)
    q = jnp.asarray(q, dtype)

    x0 = jnp.log(S0 / Kf)                              # (M,)
    c1, c2 = cumulant_fn(Tf)                           # (M,)
    a = x0 + c1 - L * jnp.sqrt(c2)
    b = x0 + c1 + L * jnp.sqrt(c2)

    k = jnp.arange(n_terms, dtype=dtype)               # (N,)
    omega = k[None, :] * jnp.pi / (b - a)[:, None]     # (M, N)

    phi = charfn_fn(omega, Tf[:, None], cdtype)
    # F_k = Re[phi(omega_k) * exp(i omega_k (x0 - a))]. The phase is built
    # with lax.complex(cos, sin): both `1j * x` and `x.astype(complex)` on a
    # float64 x materialize float32 components under explicit-x64 mode
    # (jax 0.9 canonicalizes the weak 1j/zero-imag constant), which trips
    # "lax.complex requires arguments to have the same dtypes".
    ang = omega * (x0 - a)[:, None]
    Fk = creal(phi * jax.lax.complex(jnp.cos(ang), jnp.sin(ang)))
    Uk = _cos_coeffs_call(k[None, :], a[:, None], b[:, None])
    weights = jnp.ones((n_terms,), dtype).at[0].set(0.5)

    call = Kf * jnp.exp(-r * Tf) * jnp.sum(weights[None, :] * Fk * Uk, axis=-1)
    call = jnp.maximum(call, 0.0)
    cp_f = jnp.broadcast_to(jnp.asarray(cp, dtype), shape).reshape(-1)
    # parity: P = C - S0 e^{-qT} + K e^{-rT}
    put = call - S0 * jnp.exp(-q * Tf) + Kf * jnp.exp(-r * Tf)
    price = jnp.where(cp_f > 0, call, jnp.maximum(put, 0.0))
    return price.reshape(shape)


@partial(jax.jit, static_argnames=("n_terms", "dtype"))
def heston_cos_price(S0, K, T, r, params: HestonParams, cp=1.0,
                     n_terms: int = 256, L: float = 12.0, q=0.0,
                     dtype=jnp.float32):
    """European option price(s) under Heston via the COS method.

    K, T broadcast elementwise (price a whole surface in one call); cp likewise.
    Puts are obtained from calls by put-call parity (exact, avoids a second
    truncation range). ``q``: continuous dividend yield.

    ``dtype``: real working precision. float32 (default) carries an ~2e-3
    absolute price noise floor across backends: each of the n_terms series
    terms is f32-rounded (ulp-level omega/trig differences between
    compilations, measured <=5e-5/term), and the rounding is COHERENT across
    k, so the sum accumulates ~n_terms/20 of it instead of averaging it out.
    float64 (requires jax config jax_explicit_x64_dtypes='allow', or global
    x64) drops the floor below 1e-7 — the calibration objective needs that
    (see calibrator.py's root-cause note)."""
    return _cos_price_core(
        S0, K, T, r, q, cp, n_terms, L, dtype,
        lambda om, Tf, cd: heston_charfn(om, Tf, r, params, dtype=cd, q=q),
        lambda Tf: _heston_cumulants(Tf, r, params, q))


@partial(jax.jit, static_argnames=("n_terms", "dtype"))
def vg_cos_price(S0, K, T, r, params, cp=1.0, n_terms: int = 256,
                 L: float = 12.0, q=0.0, dtype=jnp.float32):
    """European price(s) under Variance Gamma via COS.

    Char-fn of ln(S_T/S0): phi(u) = e^{iu(r-q+omega)T} *
    (1 - iu theta nu + sigma^2 nu u^2 / 2)^{-T/nu} (Madan-Carr-Chang 1998),
    omega = ln(1 - theta nu - sigma^2 nu/2)/nu. The complex power is
    assembled from real log-modulus/argument with lax.complex (the same
    explicit-x64 dtype discipline as the Heston phase — see
    heston_cos_price). Truncation range from the VG cumulants
    (Fang-Oosterlee Table 11); the fat tails matter, so the c4 term is
    folded into the returned second cumulant: c2_eff = c2 + sqrt(c4).
    Serves as the MC oracle AND the control-variate closed form for
    model='vg' (pricers/american._cv_adjustment)."""
    from options_model_tpu.core.config import VGParams

    assert isinstance(params, VGParams)

    def charfn_fn(om, Tf, cd):
        rdtype = jnp.real(jnp.zeros((), cd)).dtype
        u = jnp.asarray(om, rdtype)
        Tt = jnp.asarray(Tf, rdtype)
        sig = jnp.asarray(params.sigma, rdtype)
        th = jnp.asarray(params.theta, rdtype)
        nu = jnp.asarray(params.nu, rdtype)
        # log1p forms throughout: at small nu the factor is
        # (1 + O(nu))^{-T/nu} and a plain log of 1+tiny loses the tiny in
        # f32, then multiplies the error by T/nu (measured: the BS limit at
        # nu=1e-5 came out 6.6% off before this).
        w = jnp.log1p(-th * nu - 0.5 * sig**2 * nu) / nu
        a_ = 0.5 * sig**2 * nu * u**2          # re_z = 1 + a_
        b_ = th * nu * u                        # im_z = -b_
        logmod = 0.5 * jnp.log1p(2.0 * a_ + a_**2 + b_**2)
        arg = jnp.arctan2(-b_, 1.0 + a_)
        modulus = jnp.exp(-(Tt / nu) * logmod)
        angle = -(Tt / nu) * arg + u * (jnp.asarray(r, rdtype)
                                        - jnp.asarray(q, rdtype) + w) * Tt
        return modulus * jax.lax.complex(jnp.cos(angle), jnp.sin(angle))

    def cumulant_fn(Tf):
        d = Tf.dtype
        sig = jnp.asarray(params.sigma, d)
        th = jnp.asarray(params.theta, d)
        nu = jnp.asarray(params.nu, d)
        w = jnp.log1p(-th * nu - 0.5 * sig**2 * nu) / nu
        c1 = (jnp.asarray(r, d) - jnp.asarray(q, d) + w + th) * Tf
        c2 = (sig**2 + nu * th**2) * Tf
        c4 = 3.0 * (sig**4 * nu + 2.0 * th**4 * nu**3
                    + 4.0 * sig**2 * th**2 * nu**2) * Tf
        return c1, c2 + jnp.sqrt(jnp.maximum(c4, 0.0))

    return _cos_price_core(S0, K, T, r, q, cp, n_terms, L, dtype,
                           charfn_fn, cumulant_fn)


def _jump_cf_factor(u, T, lam, mu_j, sigma_j, dtype):
    """exp(lam T (phi_J(u) - 1) - i u lam kbar T) for lognormal jumps —
    the compensated compound-Poisson characteristic factor shared by Bates
    (and equal to the whole Merton char-fn up to the diffusion part).

    u is REAL (COS frequencies); the complex exponential is assembled from
    real trig via lax.complex — both `1j * x` and a real->complex astype on
    float64 inputs materialize float32 components under explicit-x64 mode
    (see heston_cos_price's phase note)."""
    u = jnp.asarray(u, dtype)
    lam = jnp.asarray(lam, dtype)
    mu_j = jnp.asarray(mu_j, dtype)
    sigma_j = jnp.asarray(sigma_j, dtype)
    kbar = jnp.exp(mu_j + 0.5 * sigma_j**2) - 1.0
    lamT = lam * jnp.asarray(T, dtype)
    env = jnp.exp(-0.5 * u**2 * sigma_j**2)        # |phi_J| envelope
    re = lamT * (env * jnp.cos(u * mu_j) - 1.0)
    im = lamT * (env * jnp.sin(u * mu_j) - u * kbar)
    return jnp.exp(re) * jax.lax.complex(jnp.cos(im), jnp.sin(im))


@partial(jax.jit, static_argnames=("n_terms", "dtype"))
def bates_cos_price(S0, K, T, r, params, cp=1.0, n_terms: int = 256,
                    L: float = 12.0, q=0.0, dtype=jnp.float32):
    """European price(s) under Bates (Heston + lognormal jumps) via COS.

    The char-fn factorizes (jumps independent of the diffusion):
    phi_bates = phi_heston * exp(lam T (phi_J - 1) - i u lam kbar T), and the
    cumulants add: c1 += lam T (mu_j - kbar), c2 += lam T (mu_j^2 + sigma_j^2).
    Same dtype/noise-floor semantics as heston_cos_price. Serves as the MC
    oracle AND the control-variate closed form for model='bates'
    (pricers/american._cv_adjustment)."""
    from options_model_tpu.core.config import BatesParams

    assert isinstance(params, BatesParams)
    hp = params.heston
    lam, mu_j, sigma_j = params.lam, params.mu_j, params.sigma_j

    def charfn_fn(om, Tf, cd):
        rdtype = jnp.real(jnp.zeros((), cd)).dtype
        return (heston_charfn(om, Tf, r, hp, dtype=cd, q=q)
                * _jump_cf_factor(om, Tf, lam, mu_j, sigma_j, rdtype))

    def cumulant_fn(Tf):
        c1, c2 = _heston_cumulants(Tf, r, hp, q)
        d = c1.dtype
        lamT = jnp.asarray(lam, d) * Tf
        mj = jnp.asarray(mu_j, d)
        sj = jnp.asarray(sigma_j, d)
        kbar = jnp.exp(mj + 0.5 * sj**2) - 1.0
        return c1 + lamT * (mj - kbar), c2 + lamT * (mj**2 + sj**2)

    return _cos_price_core(S0, K, T, r, q, cp, n_terms, L, dtype,
                           charfn_fn, cumulant_fn)
