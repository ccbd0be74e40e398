"""Matrix-free American LSM via RNG-counter path rematerialization.

The long-context trick of SURVEY.md §7 ("checkpoint RNG counters and
rematerialize path segments"): the standard LSM backward pass needs the full
(n_steps+1, n_paths) path matrix, which caps the path count at
HBM / (4 bytes * steps). For GBM the step map is INVERTIBLE —
S_{t+1} = S_t * exp(inc_t) — and every increment is a pure function of its
global (block, step) RNG counter. So:

  forward:  stream to the terminal prices only (O(paths) memory);
  backward: regenerate each step's normals from the same counters and DIVIDE
            the increment back out, recovering S_t on the fly.

Peak memory is O(n_paths) instead of O(n_steps * n_paths): ~128x more paths
per chip at 130 steps, at the cost of one extra RNG generation per step.
Agrees with the stored-matrix pricer to f32 roundoff (tested).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import MCConfig, OptionSpec
from options_model_tpu.core.payoff import vanilla_payoff
from options_model_tpu.core.stats import masked_mean_stderr
from options_model_tpu.models.gbm import gbm_step_normals, simulate_gbm
from options_model_tpu.pricers.american import build_centered_basis
from options_model_tpu.pricers.regressors import masked_wls_predict_centered


def price_american_lsm_gbm_replay(key: jax.Array, S0, T, spec: OptionSpec,
                                  mc: MCConfig, *, first_block=0,
                                  axis_name: Optional[str] = None,
                                  poly_degree: int = 3,
                                  stat_pair_block="auto"
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """American LSM under GBM with reverse-replayed paths. Returns (price, stderr).

    ``stat_pair_block``: the simulator's antithetic mirror granularity. The
    default ("auto") derives it from ``mc`` exactly like every sibling
    estimator — mc.path_block when mc.antithetic, else None — so no caller
    has to remember to thread it. The stopped cashflows inherit the paths'
    antithetic pairing, so the reported stderr must be over pair means — raw
    antithetic samples are not i.i.d. (core/stats.pair_mean_reduce; same
    discipline as every other estimator, tests/test_stats_discipline.py).
    Pass an explicit None to get the raw-sample stderr."""
    if isinstance(stat_pair_block, str) and stat_pair_block == "auto":
        # mc.path_block is the XLA GBM stream's mirror granularity (the
        # stream this pricer replays; american._pair_block's engine='xla'
        # case).
        stat_pair_block = mc.path_block if mc.antithetic else None
    dtype = mc.dtype
    n_steps = mc.n_steps
    dt = jnp.asarray(T, dtype) / n_steps
    growth = spec.rate - spec.div_yield  # risk-neutral drift under q
    drift = (jnp.asarray(growth, dtype) - 0.5 * jnp.asarray(spec.sigma, dtype) ** 2) * dt
    diffusion = jnp.asarray(spec.sigma, dtype) * jnp.sqrt(dt)
    disc = jnp.exp(-jnp.asarray(spec.rate, dtype) * dt)
    K = jnp.asarray(spec.strike, dtype)

    # Forward: terminal prices only — same stream the backward pass replays.
    S_T = simulate_gbm(key, S0, growth, spec.sigma, T, mc,
                       return_paths=False, first_block=first_block)

    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    cash0 = vanilla_payoff(S_T, K, spec.cp)
    ts = jnp.arange(n_steps - 1, 0, -1)

    def step(carry, t):
        cash, S_next = carry                       # S_next = S_{t+1}
        # Regenerate increment t (the one that produced S_{t+1}) and invert.
        z = gbm_step_normals(key, t, mc, first_block)
        S_t = S_next * jnp.exp(-(drift + diffusion * z))

        cash = cash * disc
        immediate = vanilla_payoff(S_t, K, spec.cp)
        itm = (immediate > 0).astype(dtype)
        X = build_centered_basis(S_t, K, itm, poly_degree, allsum)
        continuation = masked_wls_predict_centered(X, cash, itm,
                                                   axis_name=axis_name)
        exercise = (immediate > continuation) & (immediate > 0)
        cash = jnp.where(exercise, immediate, cash)
        return (cash, S_t), None

    (cash, _), _ = jax.lax.scan(step, (cash0, S_T), ts)
    cash = cash * disc

    price, stderr, _ = masked_mean_stderr(cash, None, axis_name,
                                          stat_pair_block)
    return price, stderr
