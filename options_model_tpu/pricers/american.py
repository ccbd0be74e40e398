"""American option pricing via Longstaff-Schwartz Monte Carlo.

Rebuilds AdvancedOptionPricer.price_american_enhanced_lsm and friends
(options_model_3/options_model_3.py:439-695) as pure jitted functions with
masked fixed shapes:

- ``lsm_poly``: classic per-exercise-date regression LSM. One ``lax.scan``
  backward over exercise dates carrying the cashflow vector; the dynamic ITM
  subset of the reference becomes a 0/1 weight vector feeding a masked weighted
  least squares on a masked-centered polynomial basis — plus variance columns
  under Heston (build_centered_basis; regressors.masked_wls_predict_centered).
  Supports exact path sharding: the small (d, d) Gram blocks psum across the
  mesh axis.

- ``lsm_nn``: the reference's two-pass shared-network scheme. Pass 1 collects
  (features, discounted-terminal-cashflow) pairs at every ITM (date, path) —
  exactly the reference's pass-1 targets (:482-516, where cashflows are only
  discounted, never re-set, before training). Pass 2 evaluates the trained net
  on the full (dates, paths) grid in one batched apply and takes the EARLIEST
  date where immediate > continuation as the exercise time.

Intended-behavior fixes over the reference (SURVEY.md §2.4 directive):
- the final discount step from the first exercise date back to t=0 is applied
  (the reference returned cashflows discounted only to t=dt, :619-651);
- pass 2 uses the earliest exercise date per path; the reference's backward loop
  with an ``exercised`` latch kept the LATEST date (:621-649), which is not the
  stopping rule LSM defines.
- the control variate uses the same paths' terminal values for the European MC
  leg (perfectly correlated, so the variate actually cancels path noise); the
  reference re-simulated an independent European run (:665).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, LSMConfig, MCConfig, OptionSpec
from options_model_tpu.core.payoff import vanilla_payoff
from options_model_tpu.core.stats import masked_mean_stderr
from options_model_tpu.ops.lsm_basis import regression_features
from options_model_tpu.pricers.blackscholes import bs_price
from options_model_tpu.pricers.regressors import (
    fit_continuation_mlp,
    masked_wls_predict_centered,
    mlp_predict,
)
from options_model_tpu.models.gbm import simulate_gbm
from options_model_tpu.models.heston import simulate_heston
from options_model_tpu.models.localvol import simulate_local_vol


def simulate_paths(key, S0, T, cfg: MCConfig, model: str = "gbm", *, sigma=None,
                   rate=0.0, heston: Optional[HestonParams] = None,
                   merton=None, bates=None, vg=None, sabr=None, rbergomi=None, sigma_fn=None,
                   first_block=0, engine: str = "auto",
                   heston_scheme: str = "euler",
                   localvol_table=None, div_yield=0.0,
                   return_variance: bool = False,
                   pallas_global_tiles: bool = False,
                   layout: str = "flat") -> jnp.ndarray:
    """Full path matrix (n_steps+1, n_paths) under the chosen dynamics.

    engine='auto' picks the fused Pallas kernel on TPU backends (gbm/heston,
    and localvol when a compiled Chebyshev ``localvol_table`` is supplied);
    otherwise localvol runs the exact surface network inside the XLA scan.

    ``layout="blocked"``: REQUEST the Pallas kernels' contiguous-slab output
    (n_tiles, n_steps+1, rows, 128) — ~1.8x the full-path kernel throughput
    (ops/pallas_heston.py module docstring); per-date vectors are identical
    to the flat rows, so ops/layout.py accessors make consumers
    layout-agnostic. Best-effort: the XLA simulators, the Bates jump overlay
    (its (dates, paths) factor matrix would need a transpose the layout
    exists to avoid) and the models without kernels always return flat —
    consumers MUST dispatch on ndim (ops.layout.is_blocked), never on the
    request.

    ``div_yield``: continuous dividend yield q — the risk-neutral drift every
    simulator sees is (rate - q); discounting (the pricers' job) stays at
    ``rate``. The simulators/kernels themselves are q-agnostic: their ``r``
    argument IS the drift.

    ``return_variance`` (heston only): also return the variance path matrix —
    the feed for the variance-augmented LSM basis (the continuation value is
    a function of the state (S, v); S-only regression prices ~0.7% below the
    ADI oracle, tests/test_fd_heston.py).

    ``pallas_global_tiles``: opt-in contract for path-sharded/chunked Pallas
    runs. The caller guarantees ``first_block * cfg.path_block`` is a whole
    number of kernel tiles (ops.pallas_heston.PATH_TILE) and ``cfg.n_paths``
    a whole number of tiles too; the kernels are then seeded with GLOBAL tile
    ids (first_tile + local tile) on the UN-folded key — so a mesh shard
    reproduces exactly the tiles an unsharded run would produce at its global
    offset, and path-sharded prices are device-count invariant (the kernel
    analogue of the XLA simulators' global-block-index streams). Without it
    (default), Pallas chunks fold ``first_block`` into the seed: disjoint but
    scheduling-dependent streams (european.py chunking notes).
    """
    from options_model_tpu.ops.engine import (is_pallas, resolve_engine,
                                              seed_from_key)

    if model in ("heston", "bates") and heston_scheme not in ("euler", "qe"):
        raise ValueError(f"heston_scheme must be 'euler' or 'qe', got "
                         f"{heston_scheme!r}")
    if return_variance and model not in ("heston", "bates", "sabr",
                                         "rbergomi"):
        raise ValueError("return_variance is a Heston/Bates/SABR/rBergomi "
                         "feature (the other dynamics carry no second "
                         "state; SABR returns its alpha paths, rBergomi its "
                         "instantaneous variance — the two-state LSM basis "
                         "feed)")
    rate = rate - div_yield  # risk-neutral growth under a dividend yield

    def _pallas_stream(k, interp):
        """(seed, first_tile, interpret-kwargs) under the active contract."""
        from options_model_tpu.ops.pallas_heston import PATH_TILE
        if pallas_global_tiles:
            # Global-tile seeding: exact by the caller's alignment guarantee
            # (first_block * path_block ≡ 0 mod PATH_TILE — enforced
            # statically by parallel/batch.py's geometry derivation). The
            # gcd reduction keeps the traced product inside int32 (path_block
            # is typically PATH_TILE itself, making ft == first_block).
            import math as _math
            g = _math.gcd(cfg.path_block, PATH_TILE)
            ft = (first_block * (cfg.path_block // g)) // (PATH_TILE // g)
            return seed_from_key(k), ft, {"interpret": interp}
        return (seed_from_key(jax.random.fold_in(k, first_block)), 0,
                {"interpret": interp})

    if model == "localvol" and localvol_table is not None:
        eng = resolve_engine(engine)
        if is_pallas(eng):
            from options_model_tpu.models.blocks import paths_rounded
            from options_model_tpu.ops.pallas_localvol import (
                localvol_paths_pallas)
            seed, ft, kw = _pallas_stream(key, eng == "pallas-interpret")
            return localvol_paths_pallas(seed, S0, rate, T, localvol_table,
                                         paths_rounded(cfg), cfg.n_steps,
                                         cfg.antithetic, first_tile=ft,
                                         layout=layout, **kw)
        if sigma_fn is None:
            from options_model_tpu.surface.cheb import table_sigma_fn
            sigma_fn = table_sigma_fn(localvol_table, T)
    eng = resolve_engine(engine) if model in ("gbm", "heston", "bates") else "xla"
    if is_pallas(eng):
        from options_model_tpu.models.blocks import paths_rounded
        from options_model_tpu.ops.pallas_gbm import gbm_paths_pallas
        from options_model_tpu.ops.pallas_heston import (
            heston_paths_pallas, heston_paths_qe_pallas)

        n_paths = paths_rounded(cfg)
        interp = eng == "pallas-interpret"
        if model == "bates":
            # Fused Heston kernel x independent jump overlay (models/bates.py:
            # the compound-Poisson component is independent of both Brownian
            # drivers, so it composes with the kernel without touching it).
            if bates is None:
                raise ValueError("bates params required for model='bates'")
            from options_model_tpu.models.bates import (
                jump_overlay_for, split_bates_keys)
            kh, kj = split_bates_keys(key)
            seed, ft, kw = _pallas_stream(kh, interp)
            kern = (heston_paths_qe_pallas if heston_scheme == "qe"
                    else heston_paths_pallas)
            out = kern(seed, S0, rate, T, bates.heston, n_paths, cfg.n_steps,
                       cfg.antithetic, return_variance=return_variance,
                       first_tile=ft, **kw)
            n_out = (out[0] if return_variance else out).shape[-1]
            if pallas_global_tiles:
                # Tile alignment makes n_out == local n_paths exactly, so the
                # overlay can key its jump blocks GLOBALLY like the XLA
                # simulators — preserving device-count invariance end to end.
                fac = jump_overlay_for(kj, T, bates.lam, bates.mu_j,
                                       bates.sigma_j, cfg, n_out,
                                       return_paths=True,
                                       first_block=first_block)
            else:
                # The kernel rounds n_paths up to ITS tile; build the overlay
                # at the kernel's actual width (jump_overlay_for's contract),
                # keyed per CALL like the kernel's own stream (fold
                # first_block into the key, local block ids): the
                # tile-rounded cover can exceed the chunk's global block
                # range, and global-block keying would then reuse jump blocks
                # across chunked calls.
                fac = jump_overlay_for(jax.random.fold_in(kj, first_block), T,
                                       bates.lam, bates.mu_j,
                                       bates.sigma_j, cfg, n_out,
                                       return_paths=True, first_block=0)
            if return_variance:
                S, v = out
                return S * fac, v
            return out * fac
        seed, ft, kw = _pallas_stream(key, interp)
        if model == "gbm":
            return gbm_paths_pallas(seed, S0, rate, sigma, T, n_paths,
                                    cfg.n_steps, cfg.antithetic,
                                    first_tile=ft, layout=layout, **kw)
        if heston_scheme == "qe":
            return heston_paths_qe_pallas(seed, S0, rate, T, heston, n_paths,
                                          cfg.n_steps, cfg.antithetic,
                                          return_variance=return_variance,
                                          first_tile=ft, layout=layout, **kw)
        return heston_paths_pallas(seed, S0, rate, T, heston, n_paths,
                                   cfg.n_steps, cfg.antithetic,
                                   return_variance=return_variance,
                                   first_tile=ft, layout=layout, **kw)
    if model == "gbm":
        return simulate_gbm(key, S0, rate, sigma, T, cfg, return_paths=True,
                            first_block=first_block)
    if model == "heston":
        return simulate_heston(key, S0, rate, T, heston, cfg, return_paths=True,
                               first_block=first_block, scheme=heston_scheme,
                               return_variance=return_variance)
    if model == "localvol":
        return simulate_local_vol(key, S0, rate, T, sigma_fn, cfg, return_paths=True,
                                  first_block=first_block)
    if model == "merton":
        if merton is None:
            raise ValueError("merton params required for model='merton'")
        from options_model_tpu.models.merton import simulate_merton
        return simulate_merton(key, S0, rate, T, merton, cfg,
                               return_paths=True, first_block=first_block)
    if model == "bates":
        if bates is None:
            raise ValueError("bates params required for model='bates'")
        from options_model_tpu.models.bates import simulate_bates
        return simulate_bates(key, S0, rate, T, bates, cfg, return_paths=True,
                              return_variance=return_variance,
                              first_block=first_block, scheme=heston_scheme)
    if model == "vg":
        if vg is None:
            raise ValueError("vg params required for model='vg'")
        from options_model_tpu.models.vg import simulate_vg
        return simulate_vg(key, S0, rate, T, vg, cfg,
                           return_paths=True, first_block=first_block)
    if model == "sabr":
        # SABR models the T-forward F (a martingale); the AMERICAN exercise
        # payoff acts on the spot, so convert each date's forward back:
        # S_t = F_t e^{-drift (T - t)} with F_0 = S0 e^{drift T}
        # (models/sabr.py simulator; drift = rate here, already net of q).
        # ``return_variance`` yields the alpha paths — the (S, alpha) LSM
        # basis feed (the variance-basis pattern; the continuation value
        # under SABR is a function of the state (F, alpha)).
        if sabr is None:
            raise ValueError("sabr params required for model='sabr'")
        from options_model_tpu.models.sabr import simulate_sabr
        dtype = cfg.dtype
        Tf = jnp.asarray(T, dtype)
        mu = jnp.asarray(rate, dtype)
        F0 = jnp.asarray(S0, dtype) * jnp.exp(mu * Tf)
        out = simulate_sabr(key, F0, T, sabr, cfg, return_paths=True,
                            return_alpha=return_variance,
                            first_block=first_block)
        F_paths, a_paths = out if return_variance else (out, None)
        t_grid = jnp.linspace(jnp.asarray(0.0, dtype), Tf, cfg.n_steps + 1)
        S_paths = F_paths * jnp.exp(mu * (t_grid - Tf))[:, None]
        return (S_paths, a_paths) if return_variance else S_paths
    if model == "rbergomi":
        # Rough Bergomi (models/rbergomi.py): spot dynamics with drift
        # ``rate`` directly (no forward conversion needed). The returned
        # variance matrix feeds the (S, v) LSM basis — under rough vol
        # (H < 1/2) that pair is NOT a sufficient statistic, so the
        # regressed exercise policy is a documented Markovian-projection
        # LOWER bound (still feasible; the Rogers dual brackets it).
        if rbergomi is None:
            raise ValueError("rbergomi params required for model='rbergomi'")
        from options_model_tpu.models.rbergomi import simulate_rbergomi
        return simulate_rbergomi(key, S0, T, rbergomi, cfg, rate=rate,
                                 return_paths=True,
                                 return_variance=return_variance,
                                 first_block=first_block)
    raise ValueError(f"unknown model {model!r}")


def _cv_adjustment(S_paths, spec: OptionSpec, T,
                   heston: Optional[HestonParams] = None,
                   model: str = "gbm", merton=None, bates=None, vg=None):
    """Per-path beta=1 control-variate adjustment (the European closed form
    minus the discounted terminal payoff of the SAME path) — shared by the CV
    pricer and the Richardson extrapolator.

    The closed-form leg MUST match the simulated dynamics (``model``), never
    merely whether the spec happens to carry a constant sigma: a BS leg under
    Heston paths has E[BS - EU_heston] != 0 and silently biases the price by
    that gap (observed: a ~130% shift behind an unchanged tiny stderr)."""
    from options_model_tpu.ops.layout import initial_scalar, terminal_slice

    dtype = S_paths.dtype
    S_init = initial_scalar(S_paths)
    discount = jnp.exp(-jnp.asarray(spec.rate, dtype) * jnp.asarray(T, dtype))
    pay_T = vanilla_payoff(terminal_slice(S_paths), spec.strike,
                           spec.cp) * discount
    if model == "heston":
        if heston is None:
            raise ValueError("model='heston' control variate needs heston "
                             "params for the COS leg")
        from options_model_tpu.calibration.charfn import heston_cos_price
        eu = heston_cos_price(S_init, spec.strike, T, spec.rate,
                              heston, cp=spec.cp, q=spec.div_yield)
    elif model == "merton":
        if merton is None:
            raise ValueError("model='merton' control variate needs merton "
                             "params for the jump-series leg")
        from options_model_tpu.models.merton import merton_price
        eu = merton_price(S_init, spec.strike, T, spec.rate, merton,
                          cp=spec.cp, q=spec.div_yield, dtype=dtype)
    elif model == "bates":
        if bates is None:
            raise ValueError("model='bates' control variate needs bates "
                             "params for the COS leg")
        from options_model_tpu.calibration.charfn import bates_cos_price
        eu = bates_cos_price(S_init, spec.strike, T, spec.rate, bates,
                             cp=spec.cp, q=spec.div_yield)
    elif model == "vg":
        if vg is None:
            raise ValueError("model='vg' control variate needs vg params "
                             "for the COS leg")
        from options_model_tpu.calibration.charfn import vg_cos_price
        eu = vg_cos_price(S_init, spec.strike, T, spec.rate, vg,
                          cp=spec.cp, q=spec.div_yield)
    else:
        eu = bs_price(S_init, spec.strike, T, spec.rate, spec.sigma,
                      spec.cp, q=spec.div_yield)
    return eu - pay_T


def _apply_cv(stat, adj, cv_beta: str, mask=None, axis_name=None,
              pair_block=None):
    """stat + beta * adj, beta per LSMConfig.cv_beta: 'opt' estimates the
    variance-minimizing coefficient over antithetic pair means
    (core/stats.optimal_cv_beta — psum-exact when ``axis_name`` is given, so
    every shard applies the GLOBAL beta); 'one' is the reference's fixed
    beta=1 (options_model_3/options_model_3.py:653-677)."""
    if cv_beta == "opt":
        from options_model_tpu.core.stats import optimal_cv_beta
        beta = optimal_cv_beta(stat, adj, mask, axis_name, pair_block)
        return stat + beta * adj
    return stat + adj


def _pair_block(mc: MCConfig, model: str, engine: str,
                has_table: bool = False) -> int:
    """Antithetic-pair granularity of the paths the resolved engine produces:
    the Pallas full-path kernels mirror within their own tile (ops/
    pallas_heston._PATH_ROWS x 128 paths), the XLA simulators within
    mc.path_block. The out-of-sample split must respect whichever applies.
    ``has_table``: localvol backed by a compiled Chebyshev table also runs
    the Pallas kernel (simulate_paths' dispatch rule)."""
    from options_model_tpu.ops.engine import is_pallas, resolve_engine

    kernel_model = (model in ("gbm", "heston", "bates")
                    or (model == "localvol" and has_table))
    if kernel_model and is_pallas(resolve_engine(engine)):
        import math

        from options_model_tpu.ops.pallas_heston import _LANES, _PATH_ROWS
        # lcm, not max: a block size that merely exceeds the kernel tile can
        # still cut tiles mid-mirror (e.g. path_block=4608 vs tile 4096).
        return math.lcm(mc.path_block, _PATH_ROWS * _LANES)
    return mc.path_block


# Standardized-covariate clamp for the regression basis (build_centered_basis
# docstring). 6 > dual._U_CLAMP=4 on purpose: fitting tolerates a wider range
# than the dual's extrapolating evaluator.
_BASIS_CLAMP = 6.0


def build_centered_basis(S_t, K, itm, poly_degree: int, allsum, v_t=None,
                         return_stats: bool = False, v_degree: int = 2):
    """[1, u, ..., u^degree, (x-1)^+] with u = x centered/scaled against the
    masked (ITM) measure BEFORE taking powers (the conditioning rule both LSM
    pricers depend on — see lsm_poly_backward's numerics note).

    ``v_t``: per-path variance state (Heston). Appends [w, w^2, u*w] with w
    the masked-centered/scaled variance — the continuation value under
    stochastic vol is a function of the STATE (S, v); regressing on S alone
    biases the exercise policy ~0.7% low vs the ADI oracle
    (pricers/fd_heston.py). ``v_degree=3`` appends the remaining cubic
    cross terms [w^3, u^2 w, u w^2] (LSMConfig.variance_basis_degree): the
    exercise boundary is a curve in the (S, v) plane and the quadratic
    block leaves a measurable policy gap (bench.py pooled-seed leg).

    ``return_stats``: also return (x_mean, x_rstd) — or, with ``v_t``,
    (x_mean, x_rstd, v_mean, v_rstd) — the affine maps behind u and w.
    Consumers that evaluate the fitted polynomial as a FUNCTION of the state
    (the martingale-dual bound's inner expectations, pricers/dual.py) need
    the maps, not just the design matrix.

    u and w are CLAMPED to +-_BASIS_CLAMP standardized units before the
    powers. Under jump dynamics the ITM design at early dates is a narrow
    diffusion bulk plus a handful of jump outliers many sigma out; a
    high-degree fit with that leverage oscillates Runge-style over the
    empty gap and craters the induced policy (measured, Merton deg-5
    2^15x50: price 4.86 vs the 6.237 COS-Bermudan oracle — a silent -22%.
    Clamped at 6: 6.225; GBM/Heston sit within +-4 ITM sigma, unaffected).
    The basis stays a measurable function of the state, so LSM validity is
    untouched; the dual's evaluator applies its own clamp (_U_CLAMP,
    pricers/dual.py:154) for the same reason."""
    x = S_t / K
    wsum = jnp.maximum(allsum(itm.sum()), 1.0)
    x_mean = allsum((x * itm).sum()) / wsum
    x_var = allsum(((x - x_mean) ** 2 * itm).sum()) / wsum
    x_rstd = jax.lax.rsqrt(jnp.maximum(x_var, 1e-12))
    u = jnp.clip((x - x_mean) * x_rstd, -_BASIS_CLAMP, _BASIS_CLAMP)
    cols = [u**d for d in range(poly_degree + 1)]
    cols.append(jnp.maximum(x - 1.0, 0.0))
    if v_t is not None:
        v_mean = allsum((v_t * itm).sum()) / wsum
        v_var = allsum(((v_t - v_mean) ** 2 * itm).sum()) / wsum
        v_rstd = jax.lax.rsqrt(jnp.maximum(v_var, 1e-12))
        w = jnp.clip((v_t - v_mean) * v_rstd, -_BASIS_CLAMP, _BASIS_CLAMP)
        cols += [w, w**2, u * w]
        if v_degree >= 3:
            cols += [w**3, u * u * w, u * w * w]
    X = jnp.stack(cols, axis=-1)
    if return_stats:
        if v_t is not None:
            return X, (x_mean, x_rstd, v_mean, v_rstd)
        return X, (x_mean, x_rstd)
    return X


def _pmean(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def oos_masks(n_paths: int, pair_block: int, dtype=jnp.float32):
    """(train_mask, eval_mask) for the out-of-sample estimator.

    Alternating whole path blocks: antithetic pairs live INSIDE a block (+Z
    rows mirrored by -Z rows of the same block), so assigning entire blocks
    keeps every pair on one side of the split — a contiguous half-split would
    put mirror paths of training paths into the eval set, silently restoring
    the foresight correlation the estimator exists to remove.
    """
    block_id = jnp.arange(n_paths) // pair_block
    train = (block_id % 2 == 0).astype(dtype)
    return train, 1.0 - train


def lsm_poly_backward(S_paths: jnp.ndarray, spec: OptionSpec, T,
                      axis_name: Optional[str] = None,
                      poly_degree: int = 3,
                      v_degree: int = 2,
                      out_of_sample: bool = False,
                      pair_block: Optional[int] = None,
                      stat_pair_block: Optional[int] = None,
                      return_cash: bool = False,
                      exercise_stride: int = 1,
                      v_paths: Optional[jnp.ndarray] = None):
    """Classic LSM backward induction with per-date masked WLS regression.

    S_paths: (n_steps+1, n_paths). Returns (price, stderr). With ``axis_name``
    set (inside shard_map over the path axis) the result equals the unsharded
    computation exactly. ``poly_degree`` restores the reference's
    lsm_poly_degree knob (Options_model.py:53); the basis is
    [1, u, ..., u^degree, (x-1)^+] in the masked-centered variable u.

    ``out_of_sample=True`` fits the per-date regressions on alternating path
    blocks and prices on the others — eliminating the foresight (look-ahead)
    bias of in-sample LSM at the cost of 2x the MC variance of the estimate
    (the classic Longstaff-Schwartz low-biased estimator). ``pair_block``
    (the simulator's path_block / kernel tile size) is REQUIRED then: the
    split must respect antithetic pairing (see oos_masks).

    Accepts flat (n_steps+1, n_paths) OR blocked kernel-layout matrices for
    both S_paths and v_paths (ops/layout.py): the blocked per-date vectors
    are identical to the flat rows, so every regression/decision below is
    bit-identical across layouts.
    """
    from options_model_tpu.ops.layout import (date_slice, num_paths,
                                              num_steps, terminal_slice)

    n_steps = num_steps(S_paths)
    dtype = S_paths.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    disc = jnp.exp(-jnp.asarray(spec.rate, dtype) * dt)
    K = jnp.asarray(spec.strike, dtype)

    cash = vanilla_payoff(terminal_slice(S_paths), K, spec.cp)  # t = n_steps

    n_paths = num_paths(S_paths)
    if out_of_sample:
        if pair_block is None:
            raise ValueError(
                "out_of_sample=True requires pair_block (the simulator's "
                "path_block) so the train/eval split respects antithetic pairs")
        if n_paths < 2 * pair_block:
            raise ValueError("out_of_sample needs at least two path blocks")
        train_mask, eval_mask = oos_masks(n_paths, pair_block, dtype)
    else:
        train_mask = eval_mask = jnp.ones((n_paths,), dtype)

    # Exercise dates t = n_steps-1 .. 1, visited backward.
    ts = jnp.arange(n_steps - 1, 0, -1)

    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    def step(cash, t):
        cash = cash * disc  # roll value back one step to date t
        S_t = date_slice(S_paths, t)
        v_t = date_slice(v_paths, t) if v_paths is not None else None

        def regress_and_exercise(cash):
            immediate = vanilla_payoff(S_t, K, spec.cp)
            itm = (immediate > 0).astype(dtype) * train_mask
            # Per-date basis [1, u, ..., u^deg, (x-1)^+] with u centered/scaled
            # against the masked (ITM) distribution BEFORE taking powers. Two
            # numerical traps this avoids (both observed as multi-percent price
            # errors on TPU):
            #  - within one date tau is constant, so sqrt(tau) columns are
            #    exactly collinear with [1, x] (singular Gram);
            #  - powers of raw x on a narrow ITM range are near-affine in x:
            #    column-standardizing AFTER the power leaves cond ~ 1e7+;
            #    centering first brings it to O(10), safe for f32 normals.
            # With v_paths the basis also spans the variance state (w, w^2,
            # u*w) — see build_centered_basis.
            X = build_centered_basis(S_t, K, itm, poly_degree, allsum,
                                     v_t=v_t, v_degree=v_degree)
            continuation = masked_wls_predict_centered(X, cash, itm,
                                                       axis_name=axis_name)
            exercise = (immediate > continuation) & (immediate > 0)
            return jnp.where(exercise, immediate, cash)

        if exercise_stride > 1:
            # Bermudan sub-grid on the SAME paths (Richardson extrapolation):
            # regression AND decision only every stride-th date — lax.cond
            # skips the (dominant) regression cost on the off-grid dates
            # instead of computing and discarding it.
            cash = jax.lax.cond(t % exercise_stride == 0,
                                regress_and_exercise, lambda c: c, cash)
        else:
            cash = regress_and_exercise(cash)
        return cash, None

    cash, _ = jax.lax.scan(step, cash, ts)
    cash = cash * disc  # discount the final step t=dt -> 0

    price, stderr, _ = masked_mean_stderr(cash, eval_mask, axis_name,
                                          stat_pair_block)
    if return_cash:
        return price, stderr, (cash, eval_mask)
    return price, stderr


def _policy_targets(immediate, cont, terminal, disc1):
    """Per-(date, path) continuation targets under the CURRENT policy: the
    cashflow, discounted to date-t dollars, of NOT exercising at t and then
    following the stopping rule induced by ``cont`` over dates t+1..n. One
    backward scan over dates. This is the classic Longstaff-Schwartz
    regression target; the reference's shared-net scheme instead regresses on
    the discounted TERMINAL cashflow (options_model_3.py:485-516) — the
    European continuation — whose induced policy exercises too early
    (LSMConfig.nn_policy_iters)."""
    exercise = (immediate > cont) & (immediate > 0)

    def step(v_next, inp):
        imm_t, ex_t = inp
        tgt_t = disc1 * v_next
        return jnp.where(ex_t, imm_t, tgt_t), tgt_t

    _, tgts_rev = jax.lax.scan(step, terminal,
                               (immediate[::-1], exercise[::-1]))
    return tgts_rev[::-1]


def _nn_continuation(key: jax.Array, S_paths: jnp.ndarray, spec: OptionSpec, T,
                     lsm: LSMConfig, v_paths: Optional[jnp.ndarray],
                     train_mask: Optional[jnp.ndarray],
                     return_net: bool = False,
                     heston: Optional[HestonParams] = None):
    """Two-pass core of the NN-LSM: train the shared continuation MLP
    (pass 1) and evaluate it on the full (dates, paths) grid (pass 2).

    Returns (immediate, cont, terminal, ts) — everything a stopping policy
    needs. ``train_mask``: 0/1 per-path weights restricting the TRAINING set
    (the out-of-sample split); pass 2 always evaluates every path.

    Residual regression: when the dynamics admit a closed-form European
    proxy (GBM: Black-Scholes at spec.sigma; Heston: BS at the
    moment-matched effective vol, models.heston.effective_bs_sigma), the net
    is trained on targets MINUS that baseline and the baseline is added back
    (with the residual floored at 0 — holding to expiry is one admissible
    continuation policy, so continuation >= European pointwise) at
    evaluation. The raw value surface spans ~0-30 and a global MLP fit
    misses it by O(1) deep ITM (measured: the induced policy exercises up to
    S~91.5 instead of ~88.5 and prices 2.6-3.4% BELOW CRR — the reference's
    shared-net scheme, which regresses the raw surface, has the same
    failure); the early-exercise premium is small and smooth, and the
    residual fit recovers the poly pricer's accuracy. No baseline (local
    vol): raw targets, the reference's exact scheme.

    ``return_net``: also return (params, x_mean, x_std, y_mean, y_std,
    has_baseline) — the trained net plus its standardization, for consumers
    that evaluate the continuation as a FUNCTION of fresh states (the
    martingale-dual bound's inner expectations, pricers/dual.fit_nn_policy);
    such consumers must reconstruct the SAME baseline at their own states."""
    n_steps = S_paths.shape[0] - 1
    dtype = S_paths.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    K = jnp.asarray(spec.strike, dtype)
    r = jnp.asarray(spec.rate, dtype)

    ts = jnp.arange(1, n_steps)                       # exercise dates
    taus = jnp.asarray(T, dtype) - ts.astype(dtype) * dt

    S_ex = S_paths[1:n_steps]                          # (n_dates, n_paths)
    immediate = vanilla_payoff(S_ex, K, spec.cp)       # (n_dates, n_paths)
    itm = (immediate > 0).astype(dtype)

    # Pass 1 targets: terminal cashflow discounted back to each date
    # (the reference's pass-1 cashflows are exactly this, :482-516).
    terminal = vanilla_payoff(S_paths[-1], K, spec.cp)
    disc_to_date = jnp.exp(-r * (jnp.asarray(T, dtype) - ts.astype(dtype) * dt))
    targets = disc_to_date[:, None] * terminal[None, :]

    # Closed-form European baseline at every (date, path) state (docstring).
    q = jnp.asarray(spec.div_yield, dtype)
    if v_paths is not None:
        from options_model_tpu.models.heston import effective_bs_sigma
        v_ex = v_paths[1:n_steps]
        sig_b = (effective_bs_sigma(v_ex, taus[:, None], heston, dtype)
                 if heston is not None
                 else jnp.sqrt(jnp.maximum(v_ex, 1e-8)))
        baseline = bs_price(S_ex, K, taus[:, None], r, sig_b, spec.cp, q=q)
        has_baseline = True
    elif spec.sigma is not None:
        baseline = bs_price(S_ex, K, taus[:, None], r,
                            jnp.asarray(spec.sigma, dtype), spec.cp, q=q)
        has_baseline = True
    else:
        baseline = jnp.zeros_like(immediate)
        has_baseline = False

    feats = jax.vmap(lambda S_t, tau: regression_features(S_t, K, tau))(S_ex, taus)
    if v_paths is not None:
        feats = jnp.concatenate(
            [feats, v_paths[1:n_steps][..., None]], axis=-1)
    X = feats.reshape(-1, feats.shape[-1])
    W = itm.reshape(-1)
    if train_mask is not None:
        # Fit only on training paths (every date of them); the standardization
        # below then describes the training distribution, as it must.
        W = W * jnp.tile(train_mask.astype(dtype), immediate.shape[0])

    # Standardize over ITM rows (reference scales targets and features, :550-563).
    wsum = jnp.maximum(W.sum(), 1.0)
    x_mean = (X * W[:, None]).sum(0) / wsum
    x_var = ((X - x_mean) ** 2 * W[:, None]).sum(0) / wsum
    x_std = jnp.sqrt(jnp.maximum(x_var, 1e-12))
    Xn = (X - x_mean) / x_std

    def fit_and_eval(fit_key, tgts):
        """Standardize (residual) targets on the (ITM x train) rows, train,
        and run pass 2 (continuation for every (date, path)) in one batched
        apply. With a baseline the de-standardized net output is the
        early-exercise premium, floored at 0 and added back."""
        Yf = (tgts - baseline).reshape(-1)
        ym = (Yf * W).sum() / wsum
        ys = jnp.sqrt(jnp.maximum(((Yf - ym) ** 2 * W).sum() / wsum, 1e-12))
        p, _ = fit_continuation_mlp(fit_key, Xn, (Yf - ym) / ys, W, lsm)
        out = mlp_predict(p, Xn, lsm).reshape(immediate.shape) * ys + ym
        c = baseline + jnp.maximum(out, 0.0) if has_baseline else out
        return p, ym, ys, c

    params, y_mean, y_std, cont = fit_and_eval(key, targets)

    # Policy iteration (nn_policy_iters >= 2): the first fit's targets are
    # the EUROPEAN continuation (the reference's scheme) whose induced policy
    # exercises too early; refit on the cashflows realized under the current
    # policy — the Longstaff-Schwartz target — until the policy is
    # self-consistent (core/config.LSMConfig.nn_policy_iters).
    disc1 = jnp.exp(-r * dt)
    for it in range(1, lsm.nn_policy_iters):
        targets = _policy_targets(immediate, cont, terminal, disc1)
        params, y_mean, y_std, cont = fit_and_eval(
            jax.random.fold_in(key, it), targets)
    if return_net:
        return immediate, cont, terminal, ts, (params, x_mean, x_std,
                                               y_mean, y_std, has_baseline)
    return immediate, cont, terminal, ts


def _nn_stopped_cash(immediate, cont, terminal, ts, spec: OptionSpec, T,
                     n_steps: int, exercise_stride: int = 1):
    """Per-path discounted cashflow of the earliest-exercise policy derived
    from the (dates, paths) continuation grid. ``exercise_stride``: restrict
    exercise to every stride-th date (the Bermudan sub-grid of the common-path
    Richardson extrapolation — same semantics as lsm_poly_backward's)."""
    dtype = immediate.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    r = jnp.asarray(spec.rate, dtype)

    exercise = (immediate > cont) & (immediate > 0)    # (n_dates, n_paths)
    if exercise_stride > 1:
        on_grid = (ts % exercise_stride == 0)
        exercise = exercise & on_grid[:, None]
    any_ex = jnp.any(exercise, axis=0)
    first_idx = jnp.argmax(exercise, axis=0)           # first True along dates
    t_star = jnp.where(any_ex, ts[first_idx].astype(dtype),
                       jnp.asarray(n_steps, dtype))
    value_at_stop = jnp.where(
        any_ex,
        jnp.take_along_axis(immediate, first_idx[None, :], axis=0)[0],
        terminal,
    )
    return jnp.exp(-r * t_star * dt) * value_at_stop


def lsm_nn_backward(key: jax.Array, S_paths: jnp.ndarray, spec: OptionSpec, T,
                    lsm: LSMConfig,
                    stat_pair_block: Optional[int] = None,
                    v_paths: Optional[jnp.ndarray] = None,
                    out_of_sample: bool = False,
                    pair_block: Optional[int] = None,
                    return_cash: bool = False,
                    heston: Optional[HestonParams] = None):
    """Reference-style two-pass LSM with one shared continuation-value MLP.

    ``stat_pair_block`` (the simulator's antithetic mirror granularity,
    _pair_block) makes the reported stderr pair-aware: per-path stopped
    cashflows inherit the paths' antithetic pairing, so raw-sample stderr
    misstates the estimator's error exactly as it does for the poly pricer.

    ``v_paths``: Heston variance matrix — appended as an 8th input feature
    (the state-completeness fix the poly basis gets from
    LSMConfig.variance_basis).

    ``out_of_sample=True`` trains the net on alternating path blocks and
    prices on the others (the low-biased estimator, same split discipline as
    lsm_poly_backward — ``pair_block`` required). ``return_cash`` also
    returns (cash, eval_mask), the feed for the control-variate and verbose
    statistics compositions.
    """
    n_steps = S_paths.shape[0] - 1
    dtype = S_paths.dtype
    n_paths = S_paths.shape[1]
    if out_of_sample:
        if pair_block is None:
            raise ValueError(
                "out_of_sample=True requires pair_block (the simulator's "
                "path_block) so the train/eval split respects antithetic pairs")
        if n_paths < 2 * pair_block:
            raise ValueError("out_of_sample needs at least two path blocks")
        train_mask, eval_mask = oos_masks(n_paths, pair_block, dtype)
    else:
        train_mask, eval_mask = None, jnp.ones((n_paths,), dtype)

    immediate, cont, terminal, ts = _nn_continuation(
        key, S_paths, spec, T, lsm, v_paths, train_mask, heston=heston)
    cash0 = _nn_stopped_cash(immediate, cont, terminal, ts, spec, T, n_steps)

    price, stderr, _ = masked_mean_stderr(cash0, eval_mask, None,
                                          stat_pair_block)
    if return_cash:
        return price, stderr, (cash0, eval_mask)
    return price, stderr


def richardson_nn_stat(key: jax.Array, S_paths, v_paths, spec: OptionSpec, T,
                       lsm: LSMConfig, *,
                       heston: Optional[HestonParams] = None, bates=None,
                       vg=None, model: str = "gbm",
                       pair_block: Optional[int] = None):
    """(per-path Richardson statistic, eval mask) for the NN-LSM — the nn
    sibling of richardson_cv_stat.

    One shared continuation net is trained (pass 1); the fine and coarse
    Bermudan levels are two STOPPING POLICIES read off the same continuation
    grid (every date vs the every-2nd-date sub-grid), so 2*P_n - P_{n/2} is
    computed on identical paths AND identical continuation estimates — the
    extrapolation statistic carries only the policy-grid difference, not
    training noise. The optional beta=1 control variate composes exactly as
    for the poly pricer."""
    n_steps = S_paths.shape[0] - 1
    dtype = S_paths.dtype
    n_paths = S_paths.shape[1]
    if lsm.out_of_sample:
        if pair_block is None:
            raise ValueError("out_of_sample richardson needs pair_block")
        if n_paths < 2 * pair_block:
            # Same guard as lsm_nn_backward: with a single block the split
            # degenerates to train=all / eval=none and masked_mean_stderr
            # would confidently report price 0.0 +/- 0.0.
            raise ValueError("out_of_sample needs at least two path blocks")
        train_mask, eval_mask = oos_masks(n_paths, pair_block, dtype)
    else:
        train_mask, eval_mask = None, jnp.ones((n_paths,), dtype)
    immediate, cont, terminal, ts = _nn_continuation(
        key, S_paths, spec, T, lsm, v_paths, train_mask,
        heston=_vol_params(heston, bates))
    cash_f = _nn_stopped_cash(immediate, cont, terminal, ts, spec, T, n_steps)
    cash_c = _nn_stopped_cash(immediate, cont, terminal, ts, spec, T, n_steps,
                              exercise_stride=2)
    stat = 2.0 * cash_f - cash_c
    cv_leg = ((spec.sigma is not None and model == "gbm")
              or (model == "heston" and heston is not None)
              or (model == "bates" and bates is not None)
              or (model == "vg" and vg is not None))
    if lsm.use_control_variate and cv_leg:
        stat = _apply_cv(stat, _cv_adjustment(S_paths, spec, T,
                                              heston=heston, model=model,
                                              bates=bates, vg=vg),
                         lsm.cv_beta, eval_mask, None, pair_block)
    return stat, eval_mask


def _vol_params(heston, bates):
    """The HestonParams governing the variance state: bates carries them
    nested (the NN-LSM's residual baseline uses the diffusion-only effective
    vol — the jump part of the European proxy is absorbed by the floored
    residual fit, like every other baseline approximation there)."""
    if heston is not None:
        return heston
    return bates.heston if bates is not None else None


def price_american_lsm(key: jax.Array, S0, T, spec: OptionSpec, mc: MCConfig,
                       lsm: LSMConfig, model: str = "gbm", *,
                       heston: Optional[HestonParams] = None, merton=None,
                       bates=None, vg=None, sabr=None, rbergomi=None, sigma_fn=None,
                       axis_name: Optional[str] = None,
                       return_paths_stats: bool = False, engine: str = "auto",
                       heston_scheme: str = "euler"):
    """Simulate + LSM backward induction. Returns (price, stderr[, S_paths])."""
    sim_key, fit_key = jax.random.split(key)
    want_v = model in ("heston", "bates", "sabr", "rbergomi") and lsm.variance_basis
    # The poly backward is layout-agnostic (ops/layout.py accessors), so ask
    # the Pallas kernels for their fast contiguous-slab output; the NN
    # backward builds dense (dates, paths) feature matrices and keeps flat.
    out = simulate_paths(sim_key, S0, T, mc, model, sigma=spec.sigma,
                         rate=spec.rate, heston=heston, merton=merton,
                         bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi, sigma_fn=sigma_fn,
                         engine=engine, div_yield=spec.div_yield,
                         return_variance=want_v, heston_scheme=heston_scheme,
                         layout="blocked" if lsm.regressor == "poly" else "flat")
    S_paths, v_paths = out if want_v else (out, None)
    pb = _pair_block(mc, model, engine)
    if lsm.regressor == "poly":
        price, stderr = lsm_poly_backward(S_paths, spec, T, axis_name=axis_name,
                                          poly_degree=lsm.poly_degree,
            v_degree=lsm.variance_basis_degree,
                                          out_of_sample=lsm.out_of_sample,
                                          pair_block=pb,
                                          stat_pair_block=pb if mc.antithetic else None,
                                          v_paths=v_paths)
    else:
        price, stderr = lsm_nn_backward(fit_key, S_paths, spec, T, lsm,
                                        stat_pair_block=pb if mc.antithetic else None,
                                        v_paths=v_paths,
                                        out_of_sample=lsm.out_of_sample,
                                        pair_block=pb,
                                        heston=_vol_params(heston, bates))
    if return_paths_stats:
        from options_model_tpu.ops.layout import to_flat
        return price, stderr, to_flat(S_paths)
    return price, stderr


def price_american_with_control_variate(
        key: jax.Array, S0, T, spec: OptionSpec, mc: MCConfig, lsm: LSMConfig,
        model: str = "gbm", *, heston: Optional[HestonParams] = None,
        merton=None, bates=None, vg=None, sabr=None, rbergomi=None,
        sigma_fn=None, axis_name: Optional[str] = None, engine: str = "auto",
        heston_scheme: str = "euler"):
    """American price with the European control variate (beta = 1):

        AM_cv = AM_lsm + (EU_closed_form - EU_mc_same_paths)

    (price_american_with_control_variate, options_model_3/options_model_3.py:
    653-677.) The closed-form leg is Black-Scholes for GBM (the reference's
    only case) or the COS characteristic-function price for Heston — the COS
    pricer extends the variate to stochastic vol with zero extra MC work.

    Both regressors compose: the reference's flagship estimator IS this CV
    wrapped around the shared-NETWORK scheme (:653-677 around :439-651); the
    variate acts on the stopped per-path cashflows, which both backwards
    produce identically shaped.
    """
    analytic = ((model == "gbm" and spec.sigma is not None)
                or (model == "heston" and heston is not None)
                or (model == "merton" and merton is not None)
                or (model == "bates" and bates is not None)
                or (model == "vg" and vg is not None))
    if not analytic:
        # No closed-form European leg: fall back to the plain price. SABR
        # lands here by design — Hagan's expansion is only O(T)-accurate,
        # and a beta=1 variate anchored on an approximate mean injects that
        # approximation error straight into the price (the _cv_adjustment
        # matched-dynamics rule).
        return price_american_lsm(key, S0, T, spec, mc, lsm, model,
                                  heston=heston, merton=merton, bates=bates,
                                  vg=vg, sabr=sabr, rbergomi=rbergomi,
                                  sigma_fn=sigma_fn,
                                  axis_name=axis_name, engine=engine)
    sim_key, fit_key = jax.random.split(key)
    want_v = model in ("heston", "bates") and lsm.variance_basis
    out = simulate_paths(sim_key, S0, T, mc, model, sigma=spec.sigma,
                         rate=spec.rate, heston=heston, merton=merton,
                         bates=bates, vg=vg, sigma_fn=sigma_fn,
                         engine=engine, div_yield=spec.div_yield,
                         return_variance=want_v, heston_scheme=heston_scheme,
                         layout="blocked" if lsm.regressor == "poly" else "flat")
    S_paths, v_paths = out if want_v else (out, None)
    pb = _pair_block(mc, model, engine)
    if lsm.regressor == "poly":
        price, _, (cash, eval_mask) = lsm_poly_backward(
            S_paths, spec, T, axis_name=axis_name, poly_degree=lsm.poly_degree,
            v_degree=lsm.variance_basis_degree,
            out_of_sample=lsm.out_of_sample, pair_block=pb, return_cash=True,
            v_paths=v_paths)
    else:
        price, _, (cash, eval_mask) = lsm_nn_backward(
            fit_key, S_paths, spec, T, lsm, v_paths=v_paths,
            out_of_sample=lsm.out_of_sample, pair_block=pb, return_cash=True,
            heston=_vol_params(heston, bates))
    # Per-path CV statistic cv_i = cash_i + beta*(EU - pay_i): the reported
    # stderr then describes the RETURNED estimator (the raw LSM stderr
    # overstates it by the variance the control variate removes).
    stat_pb = pb if mc.antithetic else None
    cv = _apply_cv(cash, _cv_adjustment(S_paths, spec, T, heston=heston,
                                        model=model, merton=merton,
                                        bates=bates, vg=vg),
                   lsm.cv_beta, eval_mask, axis_name, stat_pb)
    return masked_mean_stderr(cv, eval_mask, axis_name, stat_pb)[:2]


def price_american(key: jax.Array, S0, T, spec: OptionSpec, mc: MCConfig,
                   lsm: LSMConfig, model: str = "gbm", *,
                   heston: Optional[HestonParams] = None, merton=None,
                   bates=None, vg=None, sabr=None, rbergomi=None, sigma_fn=None,
                   axis_name: Optional[str] = None, engine: str = "auto"):
    """Dispatcher mirroring price_american_option
    (options_model_3/options_model_3.py:679-695): European approximation when
    requested, control variate when a constant sigma exists, plain LSM otherwise."""
    if lsm.european_approximation:
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        # engine forwarded: an explicit engine='xla' request must not resolve
        # to the Pallas sampler (different RNG stream than requested).
        sampler = make_terminal_sampler(model, S0, spec.rate, T, sigma=spec.sigma,
                                        heston=heston, merton=merton,
                                        bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi,
                                        sigma_fn=sigma_fn,
                                        engine=engine,
                                        div_yield=spec.div_yield)
        price, stderr, _ = price_european_mc(key, sampler, spec, T, mc)
        return price, stderr
    if lsm.richardson:
        return price_american_richardson(key, S0, T, spec, mc, lsm, model,
                                         heston=heston, merton=merton,
                                         bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi,
                                         sigma_fn=sigma_fn,
                                         engine=engine)
    cv_leg = ((spec.sigma is not None and model == "gbm")
              or (model == "heston" and heston is not None)
              or (model == "merton" and merton is not None)
              or (model == "bates" and bates is not None)
              or (model == "vg" and vg is not None))
    if lsm.use_control_variate and cv_leg:
        return price_american_with_control_variate(
            key, S0, T, spec, mc, lsm, model, heston=heston, merton=merton,
            bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi, sigma_fn=sigma_fn,
            axis_name=axis_name, engine=engine)
    return price_american_lsm(key, S0, T, spec, mc, lsm, model, heston=heston,
                              merton=merton, bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi,
                              sigma_fn=sigma_fn, axis_name=axis_name,
                              engine=engine)


def price_american_with_stats(key: jax.Array, S0, T, spec: OptionSpec,
                              mc: MCConfig, lsm: LSMConfig,
                              model: str = "gbm", *,
                              heston: Optional[HestonParams] = None,
                              merton=None, bates=None, vg=None,
                              sigma_fn=None, engine: str = "auto"):
    """(price, stderr, cashflow_stats) — the reference's verbose pricing
    report (mean/std/min/max/P(worthless) of the per-path discounted
    cashflows, options_model_2.py:316-333). Both regressors."""
    from options_model_tpu.core.stats import cashflow_statistics

    sim_key, fit_key = jax.random.split(key)
    want_v = model in ("heston", "bates") and lsm.variance_basis
    out = simulate_paths(sim_key, S0, T, mc, model, sigma=spec.sigma,
                         rate=spec.rate, heston=heston, merton=merton,
                         bates=bates, vg=vg, sigma_fn=sigma_fn,
                         engine=engine, div_yield=spec.div_yield,
                         return_variance=want_v,
                         layout="blocked" if lsm.regressor == "poly" else "flat")
    S_paths, v_paths = out if want_v else (out, None)
    pb = _pair_block(mc, model, engine)
    if lsm.regressor == "poly":
        price, stderr, (cash, eval_mask) = lsm_poly_backward(
            S_paths, spec, T, poly_degree=lsm.poly_degree,
            v_degree=lsm.variance_basis_degree,
            out_of_sample=lsm.out_of_sample, pair_block=pb,
            stat_pair_block=pb if mc.antithetic else None, return_cash=True,
            v_paths=v_paths)
    else:
        price, stderr, (cash, eval_mask) = lsm_nn_backward(
            fit_key, S_paths, spec, T, lsm,
            stat_pair_block=pb if mc.antithetic else None, v_paths=v_paths,
            out_of_sample=lsm.out_of_sample, pair_block=pb, return_cash=True,
            heston=_vol_params(heston, bates))
    stats = {k: float(v)
             for k, v in cashflow_statistics(cash, eval_mask).items()}
    return price, stderr, stats


def price_american_richardson(key: jax.Array, S0, T, spec: OptionSpec,
                              mc: MCConfig, lsm: LSMConfig, model: str = "gbm",
                              *, heston: Optional[HestonParams] = None,
                              merton=None, bates=None, vg=None, sabr=None, rbergomi=None,
                              sigma_fn=None, engine: str = "auto",
                              heston_scheme: str = "euler"):
    """Richardson-extrapolated continuous-exercise American price.

    An n-date LSM prices a BERMUDAN option; the exact gap to the continuous
    American is O(1/n) (measured: -0.129% at 50 dates for the benchmark ATM
    put — larger than the LSM regression error itself). The two levels price
    on the SAME simulated paths: the fine level exercises at every date, the
    coarse level on the every-2nd-date sub-grid (exercise_stride=2), so the
    extrapolation 2*P_n - P_{n/2} is nearly noise-free (the independent-
    streams variant's variance swamped the bias it removes). With the same-
    path control variate on both levels, measured accuracy vs the 4096-step
    CRR oracle: |rel| ~ 0.03% at 2^19 paths. Returns (price, stderr of the
    extrapolated per-path statistic). Both regressors: the poly backward
    re-regresses the coarse level per sub-grid date (richardson_cv_stat); the
    nn scheme reads both policies off ONE shared continuation net
    (richardson_nn_stat).
    """
    sim_key, fit_key = jax.random.split(key)
    pb = _pair_block(mc, model, engine)
    want_v = model in ("heston", "bates", "sabr", "rbergomi") and lsm.variance_basis
    out = simulate_paths(sim_key, S0, T, mc, model, sigma=spec.sigma,
                         rate=spec.rate, heston=heston, merton=merton,
                         bates=bates, vg=vg, sabr=sabr, rbergomi=rbergomi, sigma_fn=sigma_fn,
                         engine=engine, div_yield=spec.div_yield,
                         return_variance=want_v, heston_scheme=heston_scheme,
                         layout="blocked" if lsm.regressor == "poly" else "flat")
    S_paths, v_paths = out if want_v else (out, None)
    if lsm.regressor == "poly":
        stat, mask = richardson_cv_stat(S_paths, v_paths, spec, T, lsm,
                                        heston=heston, merton=merton,
                                        bates=bates, vg=vg, model=model,
                                        pair_block=pb)
    else:
        stat, mask = richardson_nn_stat(fit_key, S_paths, v_paths, spec, T,
                                        lsm, heston=heston, bates=bates,
                                        vg=vg,
                                        model=model,
                                        pair_block=pb)
    price, stderr, _ = masked_mean_stderr(stat, mask, None,
                                          pb if mc.antithetic else None)
    return price, stderr


def richardson_cv_stat(S_paths, v_paths, spec: OptionSpec, T, lsm: LSMConfig,
                       *, heston: Optional[HestonParams] = None, merton=None,
                       bates=None, vg=None,
                       model: str = "gbm", pair_block: Optional[int] = None,
                       axis_name: Optional[str] = None):
    """(per-path Richardson statistic, eval mask) on given paths — the single
    owner of the fine/coarse common-path extrapolation shared by
    price_american_richardson and the grid pricers' richardson branches.
    ``axis_name``: psum the per-date regressions over a path-sharded mesh
    axis (the 2-D grid pricer)."""
    kwargs = dict(axis_name=axis_name, poly_degree=lsm.poly_degree,
            v_degree=lsm.variance_basis_degree,
                  out_of_sample=lsm.out_of_sample, pair_block=pair_block,
                  return_cash=True, v_paths=v_paths)
    _, _, (cash_f, mask) = lsm_poly_backward(S_paths, spec, T, **kwargs)
    _, _, (cash_c, _) = lsm_poly_backward(S_paths, spec, T,
                                          exercise_stride=2, **kwargs)
    stat = 2.0 * cash_f - cash_c
    cv_leg = ((spec.sigma is not None and model == "gbm")
              or (model == "heston" and heston is not None)
              or (model == "merton" and merton is not None)
              or (model == "bates" and bates is not None)
              or (model == "vg" and vg is not None))
    if lsm.use_control_variate and cv_leg:
        stat = _apply_cv(stat, _cv_adjustment(S_paths, spec, T,
                                              heston=heston, model=model,
                                              merton=merton, bates=bates,
                                              vg=vg),
                         lsm.cv_beta, mask, axis_name, pair_block)
    return stat, mask
