"""Martingale-dual (Rogers / Haugh-Kogan) upper bound for American options.

Beyond-reference capability: the reference's LSM estimators (and this repo's,
pricers/american.py) are all LOW-biased — the exercise policy is suboptimal,
and the out-of-sample estimator is low-biased by construction. The duality
result of Rogers (2002) gives the complementary bound: for ANY adapted
martingale M with M_0 = 0,

    V_0 <= E[ max_t ( D^t h(S_t) - M_t ) ]

with equality at the value process's own martingale part. Together with the
out-of-sample LSM low estimate this brackets the true price from both sides
on ONE simulation — a confidence interval for the *bias*, not just the MC
noise, which no point estimator can give.

TPU-first design. W_t is the value surrogate max(h, clip(C_t)) built from the
fitted LSM continuation polynomial C_t in the centered variable u = (x-m)rho,
x = S/K (pricers/american.build_centered_basis) — the raw C_t alone is a poor
value approximation exactly where it matters (in the exercise region the
value is h > C_t, and the cubic extrapolates wildly OTM), and measured here
it leaves a ~50% gap; max(h, clip(C, 0, cap)) closes it to ~1%. The one-step
conditional expectations E[W_{t+1}(S_{t+1}) | S_t] come from:

- interior dates: one-step nested sampling — under GBM the sub-simulation is
  a SINGLE lognormal draw x' = x exp(mu + a z) (not a sub-path to maturity as
  in full Andersen-Broadie, because W is an explicit function, not a policy
  rollout), so the inner loop is n_inner antithetic elementwise evaluations
  per (date, path), scanned over dates to bound memory;
- the terminal step (W_n = h exactly): the one-step Black closed form
  E[(x'-1)^+ | x] = x e^{mu+a^2/2} Phi(d1) - Phi(d2), d2 = (ln x + mu)/a,
  d1 = d2 + a — exact, no inner noise.

Validity: the duality inequality holds for ANY adapted martingale. Fresh
inner normals at each date keep M a martingale in the enlarged filtration
(each date's inner average is conditionally unbiased given everything drawn
before it), so inner noise only LOOSENS the bound (by O(1/sqrt(n_inner)));
it never invalidates it. The policy itself must be fitted on paths
independent of the ones the max statistic is evaluated on —
price_american_bracket defaults to the repo's alternating-block
out-of-sample split (american.oos_masks). With out_of_sample=False the
"bound" is only approximate (the policy has seen the eval paths).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from options_model_tpu.core.config import HestonParams, MCConfig, OptionSpec
from options_model_tpu.core.payoff import vanilla_payoff
from options_model_tpu.core.stats import masked_mean_stderr
from options_model_tpu.pricers.american import (
    _pair_block,
    build_centered_basis,
    oos_masks,
    simulate_paths,
)
from options_model_tpu.pricers.blackscholes import bs_price
from options_model_tpu.pricers.regressors import masked_wls_theta_centered


class LSMPolicy(NamedTuple):
    """Per-exercise-date regression state, dates 1..n_steps-1 in FORWARD
    order: the continuation value at date t is

        C_t(x) = sum_k betas[t,k] u^k + betas[t,degree+1] (x-1)^+
                 [+ betas[t,degree+2] w + betas[t,degree+3] w^2
                  + betas[t,degree+4] u w   when fitted with a variance
                  state (Heston)],
        u = (x - x_mean[t]) * x_rstd[t],  x = S/K,
        w = (v - v_mean[t]) * v_rstd[t]
    """

    betas: jnp.ndarray   # (n_dates, degree+2 [+3 with variance])
    x_mean: jnp.ndarray  # (n_dates,)
    x_rstd: jnp.ndarray  # (n_dates,)
    v_mean: Optional[jnp.ndarray] = None  # (n_dates,) Heston only
    v_rstd: Optional[jnp.ndarray] = None


def fit_lsm_policy(S_paths: jnp.ndarray, spec: OptionSpec, T, *,
                   poly_degree: int = 3,
                   train_mask: Optional[jnp.ndarray] = None,
                   v_paths: Optional[jnp.ndarray] = None,
                   axis_name: Optional[str] = None):
    """LSM backward induction that also RETURNS the per-date regressions.

    Same algorithm as american.lsm_poly_backward (masked WLS on the centered
    basis, fitted on ``train_mask`` paths, decisions applied to all paths) —
    the stopped cash it returns is bitwise-identical to that pricer's on the
    same inputs (tested). ``v_paths`` adds the Heston variance columns
    (LSMConfig.variance_basis semantics). Returns (policy, cash) with
    ``cash`` the per-path stopped cashflow discounted to t=0 (feed for the
    low estimate) and ``policy`` the LSMPolicy the dual bound evaluates.
    """
    n_steps = S_paths.shape[0] - 1
    dtype = S_paths.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    disc = jnp.exp(-jnp.asarray(spec.rate, dtype) * dt)
    K = jnp.asarray(spec.strike, dtype)
    if train_mask is None:
        train_mask = jnp.ones((S_paths.shape[1],), dtype)

    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    cash = vanilla_payoff(S_paths[-1], K, spec.cp)
    ts = jnp.arange(n_steps - 1, 0, -1)

    def step(cash, t):
        cash = cash * disc
        S_t = S_paths[t]
        v_t = v_paths[t] if v_paths is not None else None
        immediate = vanilla_payoff(S_t, K, spec.cp)
        itm = (immediate > 0).astype(dtype) * train_mask
        X, stats = build_centered_basis(S_t, K, itm, poly_degree, allsum,
                                        v_t=v_t, return_stats=True)
        theta = masked_wls_theta_centered(X, cash, itm, axis_name=axis_name)
        continuation = jnp.matmul(X, theta,
                                  precision=jax.lax.Precision.HIGHEST)
        exercise = (immediate > continuation) & (immediate > 0)
        cash = jnp.where(exercise, immediate, cash)
        return cash, (theta,) + stats

    cash, ys = jax.lax.scan(step, cash, ts)
    cash = cash * disc  # final step t=dt -> 0
    if v_paths is not None:
        thetas, ms, rhos, vms, vrs = ys
        policy = LSMPolicy(betas=thetas[::-1], x_mean=ms[::-1],
                           x_rstd=rhos[::-1], v_mean=vms[::-1],
                           v_rstd=vrs[::-1])
    else:
        thetas, ms, rhos = ys
        policy = LSMPolicy(betas=thetas[::-1], x_mean=ms[::-1],
                           x_rstd=rhos[::-1])
    return policy, cash


def _one_step_black(x, mu, a, cp):
    """E[(x'-1)^+ | x] (cp=+1) or E[(1-x')^+ | x] (cp=-1) for one lognormal
    step x' = x exp(mu + a Z) — the Black formula on a single time step."""
    d2 = (jnp.log(x) + mu) / a
    d1 = d2 + a
    fwd = x * jnp.exp(mu + 0.5 * a * a)
    call = fwd * norm.cdf(d1) - norm.cdf(d2)
    put = norm.cdf(-d2) - fwd * norm.cdf(-d1)
    return jnp.where(cp > 0, call, put)


_U_CLAMP = 4.0  # the regression's fitted ITM range in standardized u units


def _vhat(x, K, cp, tau_t, rate, q, sigma, b_t, m_t, rho_t, degree: int,
          v=None, vm_t=None, vr_t=None):
    """Value surrogate W_t(x) = max(h, E_t, clip(C_t(u clamped), 0, cap)) in
    price units — any measurable function of the state is a legal W, and each
    piece exists to track the TRUE value V_t in a different region (tightness
    is all that is at stake, never validity):

    - h: intrinsic — exact in the deep exercise region, where the ITM-fitted
      C_t underestimates V = h (using C alone measured a ~50% slack here);
    - E_t: the European closed form at remaining maturity tau_t — a uniform
      lower bound on V that is near-exact OTM, where C_t is pure
      extrapolation (without it the put's OTM cubic garbage, clipped only by
      the loose cap K, left a ~35% slack; the call was saved by its cap K*x
      shrinking to 0 OTM);
    - C_t, used ONLY on the ITM side of the moneyness boundary — the region
      the masked regression actually fitted. Freezing or extrapolating the
      cubic OTM keeps a near-ATM-sized constant where the true value decays
      (measured: a ~13% slack on puts from exactly that); OTM the European
      floor is near-exact, so C is simply gated off there. Within the ITM
      side u is still clamped to +-_U_CLAMP standardized units (flat in the
      sparse deep tail, where h dominates anyway) and the value is clipped to
      [0, cap] with cap = K for puts (a put is worth at most K), K*x for
      calls (at most S).

    ``sigma``: the floor's volatility — the GBM sigma, or the Heston
    effective vol (per-state, _sigma_eff) that moment-matches the integrated
    variance; the floor is a SURROGATE (tightness), not a bound, so the
    moment-matched BS price serves. ``v``/``vm_t``/``vr_t``: the variance
    state and its standardization for a policy fitted with the (S, v) basis.
    """
    u = jnp.clip((x - m_t) * rho_t, -_U_CLAMP, _U_CLAMP)
    c = sum(b_t[..., k, None] * u**k for k in range(degree + 1))
    c = c + b_t[..., degree + 1, None] * jnp.maximum(x - 1.0, 0.0)
    if v is not None:
        w = jnp.clip((v - vm_t) * vr_t, -_U_CLAMP, _U_CLAMP)
        c = (c + b_t[..., degree + 2, None] * w
             + b_t[..., degree + 3, None] * w**2
             + b_t[..., degree + 4, None] * u * w)
    cap = jnp.where(cp > 0, K * x, K)
    itm_side = cp * (x - 1.0) >= 0.0
    c = jnp.where(itm_side, jnp.clip(c, 0.0, cap), 0.0)
    h = K * jnp.maximum(cp * (x - 1.0), 0.0)
    e = bs_price(K * x, K, tau_t, rate, sigma, cp, q=q)
    return jnp.maximum(jnp.maximum(h, e), c)


def _sigma_eff(v, tau, heston: HestonParams, dtype):
    """Effective Black-Scholes vol matching the expected integrated Heston
    variance over remaining time tau from variance state v:
    E[bar v] = theta + (v - theta)(1 - e^{-kappa tau})/(kappa tau)."""
    kappa = jnp.asarray(heston.kappa, dtype)
    theta = jnp.asarray(heston.theta, dtype)
    kt = jnp.maximum(kappa * tau, 1e-6)
    frac = -jnp.expm1(-kt) / kt
    return jnp.sqrt(jnp.maximum(theta + (v - theta) * frac, 1e-8))


def dual_upper_from_policy(inner_key: jax.Array, S_paths: jnp.ndarray,
                           spec: OptionSpec, T, policy: LSMPolicy, *,
                           n_inner: int = 64,
                           model: str = "gbm",
                           heston: Optional[HestonParams] = None,
                           v_paths: Optional[jnp.ndarray] = None,
                           eval_mask: Optional[jnp.ndarray] = None,
                           stat_pair_block: Optional[int] = None,
                           axis_name: Optional[str] = None):
    """Rogers dual upper bound on given paths under a fitted LSM policy.

    Builds the martingale from the value surrogates W_t = max(h, clip(C_t))
    (W_n = payoff exactly) with one-step nested inner sampling at the
    interior dates and the closed-form Black expectation at the terminal step
    (module docstring). Returns (upper, stderr) of the pathwise maximum
    E[max_t (D^t h(S_t) - M_t)] — stderr over antithetic pair means via
    ``stat_pair_block`` like every estimator in the repo.

    ``model='heston'`` (with ``heston`` params, ``v_paths``, and a policy
    fitted with the variance basis): the inner one-step sampler replicates
    the simulator's full-truncation Euler transition EXACTLY (the dual bounds
    the price of the DISCRETIZED process, so the inner law must be the
    simulated law, models/heston.py:86-96), the surrogate's floor uses the
    moment-matched effective vol (_sigma_eff), and the terminal Black step
    uses the path's own one-step vol sqrt(v dt) — still exact, because the
    one-step conditional of S given (S, v) is lognormal.

    ``inner_key`` MUST be independent of the key that simulated ``S_paths``
    (jax.random.split upstream): reusing path randomness for the inner draws
    would correlate the inner averages with the increments they are meant to
    center, silently breaking the martingale property.

    ``n_inner``: antithetic inner draws per (date, path). The inner noise
    only loosens the bound (never invalidates it); 64 draws put the looseness
    well below the policy's own suboptimality gap.
    """
    n_steps = S_paths.shape[0] - 1
    n_dates = n_steps - 1
    if policy.betas.shape[0] != n_dates:
        raise ValueError(f"policy has {policy.betas.shape[0]} dates, paths "
                         f"imply {n_dates}")
    if n_inner < 2 or n_inner % 2:
        raise ValueError("n_inner must be an even count >= 2 (antithetic "
                         "inner pairs)")
    if model not in ("gbm", "heston"):
        raise ValueError(f"model must be 'gbm' or 'heston', got {model!r}")
    use_v = model == "heston"
    if use_v:
        if heston is None or v_paths is None or policy.v_mean is None:
            raise ValueError("model='heston' needs heston params, v_paths, "
                             "and a policy fitted with v_paths")
        if spec.sigma is not None:
            raise ValueError("heston dual: spec.sigma must be None (the "
                             "variance state drives the vol)")
    dtype = S_paths.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    K = jnp.asarray(spec.strike, dtype)
    cp = jnp.asarray(spec.cp, dtype)
    rate = jnp.asarray(spec.rate, dtype)
    q = jnp.asarray(spec.div_yield, dtype)
    drift = rate - q
    degree = policy.betas.shape[1] - (5 if use_v else 2)

    x = S_paths / K                                   # (n_steps+1, P)
    taus = (jnp.asarray(T, dtype)
            - jnp.arange(1, n_steps, dtype=dtype) * dt)  # (n_dates,)
    half = n_inner // 2

    if use_v:
        kappa = jnp.asarray(heston.kappa, dtype)
        theta_h = jnp.asarray(heston.theta, dtype)
        xi = jnp.asarray(heston.xi, dtype)
        rho_h = jnp.asarray(heston.rho, dtype)
        rho_bar = jnp.sqrt(1.0 - rho_h**2)

        # W_t(x_t, v_t) at the observed states, dates t = 1..n_steps-1.
        vs = v_paths[1:n_steps]
        w_vals = _vhat(x[1:n_steps], K, cp, taus[:, None], rate, q,
                       _sigma_eff(vs, taus[:, None], heston, dtype),
                       policy.betas, policy.x_mean[:, None],
                       policy.x_rstd[:, None], degree,
                       v=vs, vm_t=policy.v_mean[:, None],
                       vr_t=policy.v_rstd[:, None])

        def date_ce(carry, inp):
            i, xp_t, vp_t, tau_t, b_t, m_t, rho_t, vm_t, vr_t = inp
            z = jax.random.normal(jax.random.fold_in(inner_key, i),
                                  (2, half, xp_t.shape[0]), dtype)
            z1, z2 = z[0], z[1]
            w2 = rho_h * z1 + rho_bar * z2
            sv = jnp.sqrt(jnp.maximum(vp_t, 0.0) * dt)[None, :]
            mu_t = ((drift - 0.5 * vp_t) * dt)[None, :]
            dv = (kappa * (theta_h - vp_t) * dt)[None, :]

            def w_at(s1, s2):
                x_in = xp_t[None, :] * jnp.exp(mu_t + sv * s1)
                v_in = jnp.maximum(vp_t[None, :] + dv + xi * sv * s2, 0.0)
                return _vhat(x_in, K, cp, tau_t, rate, q,
                             _sigma_eff(v_in, tau_t, heston, dtype),
                             b_t, m_t, rho_t, degree,
                             v=v_in, vm_t=vm_t, vr_t=vr_t)

            vals = w_at(z1, w2) + w_at(-z1, -w2)
            return carry, vals.mean(0) * 0.5

        _, ce = jax.lax.scan(
            date_ce, None,
            (jnp.arange(n_dates), x[0:n_steps - 1], v_paths[0:n_steps - 1],
             taus, policy.betas, policy.x_mean, policy.x_rstd,
             policy.v_mean, policy.v_rstd))           # (n_dates, P)

        # Terminal step: S' | (S, v) is lognormal with one-step vol
        # sqrt(v dt) — the Black closed form stays exact under Heston.
        v_nm1 = jnp.maximum(v_paths[n_steps - 1], 0.0)
        mu_T = (drift - 0.5 * v_nm1) * dt
        a_T = jnp.maximum(jnp.sqrt(v_nm1 * dt), 1e-6)
        e_h = K * _one_step_black(x[n_steps - 1], mu_T, a_T, spec.cp)
    else:
        sig = jnp.asarray(spec.sigma, dtype)
        mu = (drift - 0.5 * sig * sig) * dt
        a = sig * jnp.sqrt(dt)

        # W_t(x_t) at the observed states, dates t = 1..n_steps-1
        # (betas (n_dates, d) broadcast against the (n_dates, P) state rows).
        w_vals = _vhat(x[1:n_steps], K, cp, taus[:, None], rate, q, sig,
                       policy.betas, policy.x_mean[:, None],
                       policy.x_rstd[:, None], degree)

        # E[W_{t+1}(x') | x_t] for t = 0..n_steps-2: one-step nested inner
        # average with FRESH normals per date (martingale validity — module
        # docstring), scanned over dates so memory stays O(n_inner*n_paths).
        def date_ce(carry, inp):
            i, xp_t, tau_t, b_t, m_t, rho_t = inp
            z = jax.random.normal(jax.random.fold_in(inner_key, i),
                                  (half, xp_t.shape[0]), dtype)
            x_up = xp_t[None, :] * jnp.exp(mu + a * z)
            x_dn = xp_t[None, :] * jnp.exp(mu - a * z)
            vals = (_vhat(x_up, K, cp, tau_t, rate, q, sig, b_t, m_t, rho_t,
                          degree)
                    + _vhat(x_dn, K, cp, tau_t, rate, q, sig, b_t, m_t,
                            rho_t, degree))
            return carry, vals.mean(0) * 0.5

        _, ce = jax.lax.scan(
            date_ce, None,
            (jnp.arange(n_dates), x[0:n_steps - 1], taus, policy.betas,
             policy.x_mean, policy.x_rstd))           # (n_dates, P)

        e_h = K * _one_step_black(x[n_steps - 1], mu, a, spec.cp)

    # Martingale increments in discounted units; the terminal step uses
    # W_n = h exactly via the one-step Black closed form (no inner noise).
    disc_pows = jnp.exp(-jnp.asarray(spec.rate, dtype) * dt
                        * jnp.arange(1, n_steps + 1, dtype=dtype))
    h_n = vanilla_payoff(S_paths[-1], K, spec.cp)
    deltas = jnp.concatenate([w_vals - ce, (h_n - e_h)[None, :]])
    deltas = deltas * disc_pows[:, None]              # (n_steps, P)

    M = jnp.concatenate([jnp.zeros_like(deltas[:1]),
                         jnp.cumsum(deltas, axis=0)])  # (n_steps+1, P)
    z = vanilla_payoff(S_paths, K, spec.cp)
    z = z * jnp.concatenate([jnp.ones((1,), dtype), disc_pows])[:, None]
    upper_paths = jnp.max(z - M, axis=0)

    upper, stderr, _ = masked_mean_stderr(upper_paths, eval_mask, axis_name,
                                          stat_pair_block)
    return upper, stderr


class BracketResult(NamedTuple):
    low: jnp.ndarray
    low_stderr: jnp.ndarray
    high: jnp.ndarray
    high_stderr: jnp.ndarray


def price_american_bracket(key: jax.Array, S0, T, spec: OptionSpec,
                           mc: MCConfig, *, poly_degree: int = 3,
                           engine: str = "auto", n_inner: int = 64,
                           model: str = "gbm",
                           heston: Optional[HestonParams] = None,
                           out_of_sample: bool = True) -> BracketResult:
    """Primal-dual bracket [low, high] for an American option on ONE
    simulation: the policy is fitted on alternating path blocks
    (american.oos_masks); the low-biased LSM estimate AND the Rogers dual
    upper bound are both evaluated on the complementary blocks, so the true
    price lies in [low - 2se, high + 2se] with high confidence — a bound on
    the estimator BIAS no point estimate can provide (module docstring).

    ``model='heston'`` (with ``heston``): the policy is fitted with the
    variance basis and the dual's inner sampler replicates the Euler
    transition — the bracket then brackets the discretized Heston American
    price with no PDE oracle in the loop (the ADI solver cross-checks it in
    the tests).

    ``out_of_sample=False`` fits and evaluates on all paths (cheaper, but the
    dual is then only an approximate bound — the policy has seen the eval
    paths).
    """
    use_v = model == "heston"
    if use_v:
        if heston is None:
            raise ValueError("model='heston' needs heston params")
    elif spec.sigma is None:
        raise ValueError("the one-step dual increments need spec.sigma "
                         "(GBM dynamics)")
    sim_key, inner_key = jax.random.split(key)
    out = simulate_paths(sim_key, S0, T, mc, model, sigma=spec.sigma,
                         rate=spec.rate, heston=heston, engine=engine,
                         div_yield=spec.div_yield, return_variance=use_v)
    S_paths, v_paths = out if use_v else (out, None)
    pb = _pair_block(mc, model, engine)
    stat_pb = pb if mc.antithetic else None
    n_paths = S_paths.shape[1]
    if out_of_sample:
        if n_paths < 2 * pb:
            raise ValueError("out_of_sample needs at least two path blocks")
        train_mask, eval_mask = oos_masks(n_paths, pb, S_paths.dtype)
    else:
        train_mask = eval_mask = jnp.ones((n_paths,), S_paths.dtype)

    policy, cash = fit_lsm_policy(S_paths, spec, T, poly_degree=poly_degree,
                                  train_mask=train_mask, v_paths=v_paths)
    low, low_se, _ = masked_mean_stderr(cash, eval_mask, None, stat_pb)
    high, high_se = dual_upper_from_policy(inner_key, S_paths, spec, T,
                                           policy, n_inner=n_inner,
                                           model=model, heston=heston,
                                           v_paths=v_paths,
                                           eval_mask=eval_mask,
                                           stat_pair_block=stat_pb)
    return BracketResult(low=low, low_stderr=low_se,
                         high=high, high_stderr=high_se)
