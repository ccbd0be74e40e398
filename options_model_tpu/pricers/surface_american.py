"""American option SURFACE pricing: strike x maturity grids on shared paths.

The BASELINE.json headline workload (configs[4]: "64x64 strike x maturity
American grid under Heston"). The task-per-cell design (parallel/batch.py)
re-simulates paths for every cell; this pricer exploits the structure instead:

1. paths do not depend on the strike, so ALL strikes of a maturity share ONE
   path matrix — a 64x reduction in simulation work for a 64-strike grid;

2. the per-strike LSM regression basis [1, u_k, u_k^2, u_k^3] with
   u_k = (S/K_k - m_k)/s_k is, for every strike, a linear reparametrization of
   the SAME strike-independent basis B = [1, u, u^2, u^3] in the globally
   centered u — the fitted values only depend on span(B) and the per-strike
   ITM mask. So the whole per-date, all-strikes regression collapses to TWO
   MXU-shaped matmuls: (n_K, P) masks/mask-weighted-cashflows against the
   (P, 14) products [B_i B_j, B_i], then a batched (n_K, 4, 4) unrolled
   Cholesky and one predict matmul. The naive per-strike vmap ran rank-7
   matmuls at <1% MXU utilization;

   (the (x-1)^+ kink feature is dropped here: on ITM-only rows it is exactly
   affine in S for both calls and puts, so it adds nothing to the span)

3. maturities run under ``lax.map`` (sequential) so peak memory stays at one
   path matrix, with the fused Pallas kernel feeding each iteration.

All maturities share ``n_steps`` (dt varies) — one compile for the whole grid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, MCConfig
from options_model_tpu.pricers.american import simulate_paths
from options_model_tpu.pricers.regressors import solve_spd_small

_HI = jax.lax.Precision.HIGHEST


def lsm_surface_backward(S_paths: jnp.ndarray, strikes: jnp.ndarray, rate, T,
                         cp: float = -1.0, ridge: float = 1e-6) -> jnp.ndarray:
    """LSM backward induction for ALL strikes at once on shared paths.

    S_paths: (n_steps+1, P); strikes: (n_K,). Returns prices (n_K,).
    """
    n_steps = S_paths.shape[0] - 1
    P = S_paths.shape[1]
    dtype = S_paths.dtype
    dt = jnp.asarray(T, dtype) / n_steps
    disc = jnp.exp(-jnp.asarray(rate, dtype) * dt)
    K = strikes.astype(dtype)                       # (n_K,)

    cash0 = jnp.maximum(cp * (S_paths[-1][None, :] - K[:, None]), 0.0)
    ts = jnp.arange(n_steps - 1, 0, -1)

    # Index pairs of the upper triangle of the 4x4 Gram, plus the static
    # (4, 4) -> pair-index map that reassembles the full symmetric matrix
    # with one gather (a scatter loop here ballooned compile time).
    d = 4
    pairs = [(i, j) for i in range(d) for j in range(i, d)]
    pair_of = {}
    for idx, (i, j) in enumerate(pairs):
        pair_of[(i, j)] = idx
        pair_of[(j, i)] = idx
    gram_gather = jnp.array([[pair_of[(i, j)] for j in range(d)]
                             for i in range(d)], jnp.int32)

    def step(cash, t):
        S_t = S_paths[t]                            # (P,)
        cash = cash * disc                          # (n_K, P)

        # Strike-independent conditioned basis: center/scale S_t globally.
        s_mean = jnp.mean(S_t)
        s_std = jnp.sqrt(jnp.maximum(jnp.mean((S_t - s_mean) ** 2), 1e-12))
        u = (S_t - s_mean) / s_std
        B = jnp.stack([jnp.ones_like(u), u, u**2, u**3], axis=-1)  # (P, 4)

        immediate = jnp.maximum(cp * (S_t[None, :] - K[:, None]), 0.0)
        W = (immediate > 0).astype(dtype)           # (n_K, P)

        # All per-strike sufficient statistics in two MXU matmuls:
        #   A_k[i,j] = sum_p W_k(p) B_i(p) B_j(p)  <- W @ prods
        #   b_k[i]   = sum_p W_k(p) cash_k(p) B_i(p) <- (W*cash) @ B
        prods = jnp.stack([B[:, i] * B[:, j] for i, j in pairs], axis=-1)
        Astats = jnp.matmul(W, prods, precision=_HI)            # (n_K, 10)
        bstats = jnp.matmul(W * cash, B, precision=_HI)         # (n_K, 4)

        A = Astats[:, gram_gather]                  # (n_K, 4, 4), symmetric
        lam = ridge * (jnp.trace(A, axis1=-2, axis2=-1)[:, None, None] / d + 1.0)
        A = A + lam * jnp.eye(d, dtype=dtype)
        theta = solve_spd_small(A, bstats)                       # (n_K, 4)

        continuation = jnp.matmul(theta, B.T, precision=_HI)     # (n_K, P)
        exercise = (immediate > continuation) & (immediate > 0)
        return jnp.where(exercise, immediate, cash), None

    cash, _ = jax.lax.scan(step, cash0, ts)
    return jnp.mean(cash * disc, axis=1)


def price_american_surface(key: jax.Array, S0, strikes, maturities, rate,
                           mc: MCConfig, *, cp: float = -1.0,
                           model: str = "heston", sigma=None,
                           heston: Optional[HestonParams] = None,
                           engine: str = "auto",
                           heston_scheme: str = "euler",
                           div_yield=0.0) -> jnp.ndarray:
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
                                 rate=rate, heston=heston, engine=engine,
                                 heston_scheme=heston_scheme,
                                 div_yield=div_yield)
        return lsm_surface_backward(S_paths, strikes, rate, T, cp)

    ti = jnp.arange(maturities.shape[0])
    # Plain sequential map: vmapping maturity groups (batch_size=8) measured
    # SLOWER on-chip (4.0s vs 2.7s for the 64x64 grid) — the batched Pallas
    # simulation loses its tuned tile shape.
    return jax.lax.map(one_maturity, (ti, maturities))


def price_european_surface_mc(key: jax.Array, S0, strikes, maturities, rate,
                              mc: MCConfig, *, cp: float = 1.0,
                              model: str = "heston", sigma=None,
                              heston: Optional[HestonParams] = None,
                              engine: str = "auto",
                              div_yield=0.0) -> jnp.ndarray:
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
                                        heston=heston, engine=engine,
                                        div_yield=div_yield)
        S_T = sampler(mkey, 0, mc)
        disc = jnp.exp(-jnp.asarray(rate, S_T.dtype) * T)

        def one_strike(K):
            return jnp.mean(jnp.maximum(cp * (S_T - K), 0.0)) * disc

        return jax.vmap(one_strike)(strikes)

    ti = jnp.arange(maturities.shape[0])
    return jax.lax.map(one_maturity, (ti, maturities))
