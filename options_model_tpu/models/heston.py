"""Heston stochastic-volatility path simulation, full-truncation Euler.

Scheme (matches the reference semantics, options_model_3/options_model_3.py:211-251):

    v_plus = max(v_{t-1}, 0)
    v_t    = max(v_plus + kappa (theta - v_plus) dt + xi sqrt(v_plus dt) W2, 0)
    S_t    = S_{t-1} exp((r - v_plus/2) dt + sqrt(v_plus dt) W1)
    W1 = Z1,  W2 = rho Z1 + sqrt(1-rho^2) Z2,  Z antithetic-paired.

The variance recursion is genuinely sequential, so the step loop is a
``lax.scan`` (compiled once; no per-step Python). The log-price is carried (not
exponentiated per step) and paths are emitted as scan outputs only when the
caller needs the full matrix. The fused Pallas kernel in ops/pallas_heston.py
implements the identical scheme with on-chip RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import HestonParams, MCConfig
from options_model_tpu.models.blocks import block_normals, num_blocks


def effective_bs_sigma(v, tau, heston: HestonParams, dtype=None):
    """Effective Black-Scholes vol matching the expected integrated Heston
    variance over remaining time tau from variance state v:
    E[bar v] = theta + (v - theta)(1 - e^{-kappa tau})/(kappa tau).

    Shared by the martingale-dual surrogate (pricers/dual._vhat and
    _vhat_nn) and the NN-LSM's residual regression baseline
    (pricers/american._nn_continuation): both need a closed-form European
    proxy at an arbitrary Heston state."""
    if dtype is None:
        dtype = jnp.asarray(v).dtype
    kappa = jnp.asarray(heston.kappa, dtype)
    theta = jnp.asarray(heston.theta, dtype)
    kt = jnp.maximum(kappa * tau, 1e-6)
    frac = -jnp.expm1(-kt) / kt
    return jnp.sqrt(jnp.maximum(theta + (v - theta) * frac, 1e-8))


@jax.custom_jvp
def _safe_sqrt(x):
    """sqrt with a bounded derivative at 0.

    The full-truncation scheme pins v at 0 on some paths; sqrt'(0) = inf turns
    every AD sensitivity (pricers/greeks.mc_greeks_heston) into NaN. The
    primal is exact; the tangent uses the valid subgradient 0 at the boundary.
    """
    return jnp.sqrt(x)


@_safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (xdot,) = primals, tangents
    y = jnp.sqrt(x)
    dydx = jnp.where(x > 1e-12, 0.5 / jnp.maximum(y, 1e-6), 0.0)
    return y, dydx * xdot


def simulate_heston(key: jax.Array, S0, r, T, params: HestonParams, cfg: MCConfig,
                    return_paths: bool = True, return_variance: bool = False,
                    first_block=0, scheme: str = "euler"):
    """Simulate Heston paths.

    scheme: 'euler' (full truncation, the reference's scheme) or 'qe'
    (Andersen 2008 quadratic-exponential with martingale correction — far
    better weak convergence: ~8x fewer steps for the same European-price
    bias, see tests/test_qe.py).

    Returns:
      return_paths=True:  S (n_steps+1, n_paths)  [and v likewise if return_variance]
      return_paths=False: S_T (n_paths,)
    """
    if scheme == "qe":
        return _simulate_heston_qe(key, S0, r, T, params, cfg, return_paths,
                                   return_variance, first_block)
    if scheme != "euler":
        raise ValueError(f"scheme must be 'euler' or 'qe', got {scheme!r}")
    dtype = cfg.dtype
    n_steps = cfg.n_steps
    dt = jnp.asarray(T, dtype) / n_steps
    sqrt_dt = jnp.sqrt(dt)
    half = cfg.path_block // 2
    nb = num_blocks(cfg)

    kappa = jnp.asarray(params.kappa, dtype)
    theta = jnp.asarray(params.theta, dtype)
    xi = jnp.asarray(params.xi, dtype)
    rho = jnp.asarray(params.rho, dtype)
    rho_bar = jnp.sqrt(1.0 - rho**2)
    r_ = jnp.asarray(r, dtype)

    def sim_block(block_key):
        # Tie the scan carries to the key's data so their sharding "varying"
        # annotation matches the per-step randomness under shard_map/lax.map
        # (constants would be axis-invariant and fail the scan carry check).
        vary0 = (jax.random.key_data(block_key).astype(dtype) * 0).sum()
        logS_init = jnp.full((cfg.path_block,), jnp.log(jnp.asarray(S0, dtype)), dtype) + vary0
        v_init = jnp.full((cfg.path_block,), jnp.asarray(params.v0, dtype), dtype) + vary0

        def step(carry, t):
            logS, v = carry
            z1, z2 = block_normals(block_key, t, half, 2, cfg.antithetic, dtype)
            w1 = z1
            w2 = rho * z1 + rho_bar * z2
            v_plus = jnp.maximum(v, 0.0)
            sqrt_v_dt = _safe_sqrt(v_plus) * sqrt_dt
            v_new = jnp.maximum(v_plus + kappa * (theta - v_plus) * dt + xi * sqrt_v_dt * w2, 0.0)
            logS_new = logS + (r_ - 0.5 * v_plus) * dt + sqrt_v_dt * w1
            out = (logS_new, v_new) if return_paths else None
            return (logS_new, v_new), out

        (logS_T, v_T), ys = jax.lax.scan(step, (logS_init, v_init), jnp.arange(n_steps))
        if return_paths:
            logS_rows, v_rows = ys
            S = jnp.exp(jnp.concatenate([logS_init[None], logS_rows], axis=0))
            if return_variance:
                v = jnp.concatenate([v_init[None], v_rows], axis=0)
                return S, v
            return S
        if return_variance:
            return jnp.exp(logS_T), v_T
        return jnp.exp(logS_T)

    block_keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(first_block + jnp.arange(nb))
    out = jax.vmap(sim_block)(block_keys)

    def merge(x):
        if x.ndim == 3:  # (nb, n_steps+1, block) -> (n_steps+1, n_paths)
            return jnp.transpose(x, (1, 0, 2)).reshape(n_steps + 1, nb * cfg.path_block)
        return x.reshape(nb * cfg.path_block)

    if isinstance(out, tuple):
        return tuple(merge(x) for x in out)
    return merge(out)


def _simulate_heston_qe(key, S0, r, T, params: HestonParams, cfg: MCConfig,
                        return_paths, return_variance, first_block):
    """Andersen (2008) QE-M scheme, branchless/vectorized.

    Variance: moment-matched quadratic a(b+Z)^2 when psi = s2/m2 <= 1.5, else
    the exponential-mixture inverse CDF. Log-price: the integrated-variance
    discretization K0..K4 (gamma1 = gamma2 = 1/2) with Andersen's martingale
    correction replacing K0 on the quadratic branch (exact martingality).
    Both branches are computed and selected by mask — no data-dependent
    control flow. Draws per step: Z_v (variance), U (mixture), Z_s (price).
    """
    dtype = cfg.dtype
    n_steps = cfg.n_steps
    dt = jnp.asarray(T, dtype) / n_steps
    half = cfg.path_block // 2
    nb = num_blocks(cfg)

    kappa = jnp.asarray(params.kappa, dtype)
    theta = jnp.asarray(params.theta, dtype)
    xi = jnp.asarray(params.xi, dtype)
    rho = jnp.asarray(params.rho, dtype)
    r_ = jnp.asarray(r, dtype)

    ekt = jnp.exp(-kappa * dt)
    c1 = xi**2 * ekt * (1.0 - ekt) / kappa
    c2 = theta * xi**2 * (1.0 - ekt) ** 2 / (2.0 * kappa)
    psi_c = 1.5

    g1 = g2 = 0.5
    K1 = g1 * dt * (kappa * rho / xi - 0.5) - rho / xi
    K2 = g2 * dt * (kappa * rho / xi - 0.5) + rho / xi
    K3 = g1 * dt * (1.0 - rho**2)
    K4 = g2 * dt * (1.0 - rho**2)
    A = K2 + 0.5 * K4

    def sim_block(block_key):
        vary0 = (jax.random.key_data(block_key).astype(dtype) * 0).sum()
        logS_init = jnp.full((cfg.path_block,), jnp.log(jnp.asarray(S0, dtype)),
                             dtype) + vary0
        v_init = jnp.full((cfg.path_block,), jnp.asarray(params.v0, dtype),
                          dtype) + vary0

        def step(carry, t):
            logS, v = carry
            z_v, z_s, z_u = block_normals(block_key, t, half, 3, cfg.antithetic,
                                          dtype)
            # uniform for the mixture branch from the third draw
            u = jax.scipy.special.ndtr(z_u)

            m = theta + (v - theta) * ekt
            s2 = v * c1 + c2
            psi = s2 / jnp.maximum(m**2, 1e-20)

            # Quadratic branch (psi <= psi_c)
            two_over = 2.0 / jnp.maximum(psi, 1e-12)
            b2 = jnp.maximum(two_over - 1.0
                             + jnp.sqrt(jnp.maximum(two_over, 0.0))
                             * jnp.sqrt(jnp.maximum(two_over - 1.0, 0.0)), 0.0)
            a = m / (1.0 + b2)
            b = jnp.sqrt(b2)
            v_quad = a * (b + z_v) ** 2

            # Exponential-mixture branch (psi > psi_c)
            p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
            beta = (1.0 - p) / jnp.maximum(m, 1e-20)
            v_exp = jnp.where(u <= p, 0.0,
                              jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-12))
                              / jnp.maximum(beta, 1e-20))

            quad = psi <= psi_c
            v_new = jnp.where(quad, v_quad, v_exp)

            # Martingale-corrected K0 per branch (Andersen eq. 33-34).
            Aa = A * a
            k0_quad = (-Aa * b2 / jnp.maximum(1.0 - 2.0 * Aa, 1e-6)
                       + 0.5 * jnp.log(jnp.maximum(1.0 - 2.0 * Aa, 1e-6)))
            k0_exp = -jnp.log(jnp.maximum(
                p + beta * (1.0 - p) / jnp.maximum(beta - A, 1e-12), 1e-12))
            K0_star = jnp.where(quad, k0_quad, k0_exp) - (K1 + 0.5 * K3) * v

            logS_new = (logS + r_ * dt + K0_star + K1 * v + K2 * v_new
                        + jnp.sqrt(jnp.maximum(K3 * v + K4 * v_new, 0.0)) * z_s)
            out = (logS_new, v_new) if return_paths else None
            return (logS_new, v_new), out

        (logS_T, v_T), ys = jax.lax.scan(step, (logS_init, v_init),
                                         jnp.arange(n_steps))
        if return_paths:
            logS_rows, v_rows = ys
            S = jnp.exp(jnp.concatenate([logS_init[None], logS_rows], axis=0))
            if return_variance:
                return S, jnp.concatenate([v_init[None], v_rows], axis=0)
            return S
        if return_variance:
            return jnp.exp(logS_T), v_T
        return jnp.exp(logS_T)

    block_keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(
        first_block + jnp.arange(nb))
    out = jax.vmap(sim_block)(block_keys)

    def merge(x):
        if x.ndim == 3:
            return jnp.transpose(x, (1, 0, 2)).reshape(n_steps + 1,
                                                       nb * cfg.path_block)
        return x.reshape(nb * cfg.path_block)

    if isinstance(out, tuple):
        return tuple(merge(x) for x in out)
    return merge(out)
