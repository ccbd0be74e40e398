"""Fused local-volatility path-simulation Pallas kernel (Chebyshev surface).

Same architecture as ops/pallas_gbm.py, with the per-step volatility evaluated
from the compiled Chebyshev slices (surface/cheb.py) of the IV surface:

    u     = clip((log K - log S) / m_half - m_center', -1, 1)
    sigma = Clenshaw(coeffs[t], u)

The kernel carries log S, so the moneyness needs NO transcendental — the whole
sigma lookup is ~2*degree FMAs on the VPU. This replaces the XLA scan's
per-step surface-MLP matmuls (~0.6 G path-steps/s) with near-GBM-kernel
throughput. Coefficients live in SMEM ((n_steps, 8) floats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from options_model_tpu.ops.pallas_gbm import _gbm_step_normals
from options_model_tpu.ops.pallas_heston import (_LANES, _TERM_ROWS,
                                                 _round_up, _seed_array,
                                                 _tile_seed)
from options_model_tpu.surface.cheb import LocalVolTable


def _localvol_terminal_kernel(seed_ref, par_ref, coef_ref, out_ref, *,
                              n_steps, degree, antithetic):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    r = par_ref[0, 1]
    dt = par_ref[0, 2]
    logK = par_ref[0, 3]
    m_center = par_ref[0, 4]
    inv_m_half = par_ref[0, 5]
    sqrt_dt = jnp.sqrt(dt)
    rows = _TERM_ROWS

    logS = jnp.full((rows, _LANES), jnp.log(S0), jnp.float32)

    def body(t, logS):
        z = _gbm_step_normals(rows, antithetic)
        u = jnp.clip(((logK - logS) - m_center) * inv_m_half, -1.0, 1.0)
        # Clenshaw over the degree+1 coefficients of step t
        b1 = jnp.zeros((rows, _LANES), jnp.float32)
        b2 = jnp.zeros((rows, _LANES), jnp.float32)
        for k in range(degree, 0, -1):
            b1, b2 = coef_ref[t, k] + 2.0 * u * b1 - b2, b1
        sig = jnp.maximum(coef_ref[t, 0] + u * b1 - b2, 1e-6)
        return logS + (r - 0.5 * sig * sig) * dt + sig * sqrt_dt * z

    logS = jax.lax.fori_loop(0, n_steps, body, logS)
    out_ref[:] = jnp.exp(logS)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret"))
def localvol_terminal_pallas(seed, S0, r, T, table: LocalVolTable,
                             n_paths: int, n_steps: int,
                             antithetic: bool = True, interpret: bool = False,
                             first_tile=0):
    """Terminal prices S_T (n_paths_rounded,) under the compiled local-vol
    surface. ``table.coeffs`` must have at least n_steps rows."""
    if table.coeffs.shape[0] < n_steps:
        raise ValueError(
            f"localvol table has {table.coeffs.shape[0]} step slices but "
            f"n_steps={n_steps}; recompile with compile_localvol_table(..., "
            f"n_steps={n_steps})")
    tile = _TERM_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    degree = table.coeffs.shape[1] - 1

    dt = jnp.float32(T) / n_steps
    par = jnp.array([[S0, r, dt, jnp.log(jnp.float32(table.K)),
                      table.m_center, 1.0 / table.m_half, 0.0, 0.0]],
                    jnp.float32)
    seed_arr = _seed_array(seed, first_tile)

    kernel = functools.partial(_localvol_terminal_kernel, n_steps=n_steps,
                               degree=degree, antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TERM_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _TERM_ROWS, _LANES), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par, table.coeffs)
    return out.reshape(-1)


def _localvol_paths_kernel(seed_ref, par_ref, coef_ref, out_ref, *,
                           n_steps, degree, antithetic, unroll=1,
                           blocked=False):
    from options_model_tpu.ops.pallas_heston import (_PATH_ROWS, _paths_emit,
                                                     _row0)

    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    r = par_ref[0, 1]
    dt = par_ref[0, 2]
    logK = par_ref[0, 3]
    m_center = par_ref[0, 4]
    inv_m_half = par_ref[0, 5]
    sqrt_dt = jnp.sqrt(dt)
    rows = _PATH_ROWS

    _row0(out_ref, jnp.full((rows, _LANES), jnp.log(S0), jnp.float32), blocked)
    emit = _paths_emit(out_ref, unroll, blocked)
    assert n_steps % unroll == 0, (n_steps, unroll)

    # absolute logS in the loop (the Chebyshev moneyness lookup needs it);
    # one bulk exp over the VMEM block after — hoisting the per-step exp is
    # a measured +34% on the Heston path kernel (scripts/exp_paths_kernel.py);
    # per-chunk slab stores per _pick_unroll.
    def body(c, logS):
        outs = []
        for j in range(unroll):
            t = c * unroll + j
            z = _gbm_step_normals(rows, antithetic)
            u = jnp.clip(((logK - logS) - m_center) * inv_m_half, -1.0, 1.0)
            b1 = jnp.zeros((rows, _LANES), jnp.float32)
            b2 = jnp.zeros((rows, _LANES), jnp.float32)
            for k in range(degree, 0, -1):
                b1, b2 = coef_ref[t, k] + 2.0 * u * b1 - b2, b1
            sig = jnp.maximum(coef_ref[t, 0] + u * b1 - b2, 1e-6)
            logS = logS + (r - 0.5 * sig * sig) * dt + sig * sqrt_dt * z
            outs.append(logS)
        emit(c * unroll, jnp.stack(outs), None)
        return logS

    jax.lax.fori_loop(0, n_steps // unroll, body,
                      jnp.full((rows, _LANES), jnp.log(S0), jnp.float32))
    out_ref[:] = jnp.exp(out_ref[:])


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret", "layout"))
def localvol_paths_pallas(seed, S0, r, T, table: LocalVolTable,
                          n_paths: int, n_steps: int,
                          antithetic: bool = True, interpret: bool = False,
                          first_tile=0, layout: str = "flat"):
    """Full path matrix under the compiled local-vol surface — the
    American/LSM feed at fused-kernel speed. ``layout`` as in
    heston_paths_pallas ("blocked" = contiguous per-tile slabs)."""
    from options_model_tpu.ops.pallas_heston import (_PATH_ROWS, _paths_out,
                                                     _pick_unroll)

    if table.coeffs.shape[0] < n_steps:
        raise ValueError(
            f"localvol table has {table.coeffs.shape[0]} step slices but "
            f"n_steps={n_steps}")
    tile = _PATH_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    degree = table.coeffs.shape[1] - 1

    dt = jnp.float32(T) / n_steps
    par = jnp.array([[S0, r, dt, jnp.log(jnp.float32(table.K)),
                      table.m_center, 1.0 / table.m_half, 0.0, 0.0]],
                    jnp.float32)
    seed_arr = _seed_array(seed, first_tile)

    shape, spec, unflat = _paths_out(grid, n_steps, layout)
    kernel = functools.partial(_localvol_paths_kernel, n_steps=n_steps,
                               degree=degree, antithetic=antithetic,
                               unroll=_pick_unroll(n_steps),
                               blocked=layout == "blocked")
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=spec,
        out_shape=shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par, table.coeffs)
    return unflat(out)
