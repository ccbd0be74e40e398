"""Fused GBM path-simulation Pallas kernels (SURVEY.md §2.3 kernel #1).

Same architecture as ops/pallas_heston.py (tile-resident state, on-chip
Box-Muller RNG seeded by (seed, tile_id), antithetic row mirroring) with the
one-factor log-Euler recursion. The terminal kernel accumulates the log-return
sum in registers — a single HBM store per tile for the whole simulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from options_model_tpu.ops.pallas_heston import (
    _LANES,
    _PATH_ROWS,
    _TERM_ROWS,
    _box_muller,
    _paths_emit,
    _paths_out,
    _pick_unroll,
    _round_up,
    _row0,
    _seed_array,
    _tile_seed,
)


def _gbm_step_normals(rows, antithetic):
    """One normal per path per step with BOTH Box-Muller outputs consumed
    (the two-factor helper discarded the sine branch — half the RNG and
    transcendental work wasted in a compute-bound loop). Antithetic mirror
    layout is unchanged: rows [0, rows/2) mirrored into [rows/2, rows)."""
    if antithetic:
        q = rows // 4
        z1h, z2h = _box_muller((q, _LANES))
        zh = jnp.concatenate([z1h, z2h], axis=0)   # rows/2 distinct normals
        return jnp.concatenate([zh, -zh], axis=0)
    q = rows // 2
    z1, z2 = _box_muller((q, _LANES))
    return jnp.concatenate([z1, z2], axis=0)


def _gbm_terminal_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    drift = par_ref[0, 1]      # (r - sigma^2/2) dt
    diffusion = par_ref[0, 2]  # sigma sqrt(dt)

    acc = jnp.zeros((_TERM_ROWS, _LANES), jnp.float32)

    def body(t, acc):
        return acc + _gbm_step_normals(_TERM_ROWS, antithetic)

    acc = jax.lax.fori_loop(0, n_steps, body, acc)
    out_ref[:] = S0 * jnp.exp(drift * n_steps + diffusion * acc)


def _gbm_paths_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic,
                      unroll=1, blocked=False):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    drift = par_ref[0, 1]
    diffusion = par_ref[0, 2]

    _row0(out_ref, jnp.zeros((_PATH_ROWS, _LANES), jnp.float32), blocked)
    emit = _paths_emit(out_ref, unroll, blocked)
    assert n_steps % unroll == 0, (n_steps, unroll)

    # relative logS in the loop; one bulk exp over the VMEM block after —
    # hoisting the per-step exp is a measured +34% on the Heston path kernel
    # (ops/pallas_heston._paths_kernel, scripts/exp_paths_kernel.py); per-
    # chunk slab stores per _pick_unroll.
    def body(c, logS):
        outs = []
        for _ in range(unroll):
            logS = logS + drift + diffusion * _gbm_step_normals(_PATH_ROWS,
                                                                antithetic)
            outs.append(logS)
        emit(c * unroll, jnp.stack(outs), None)
        return logS

    jax.lax.fori_loop(0, n_steps // unroll, body,
                      jnp.zeros((_PATH_ROWS, _LANES), jnp.float32))
    out_ref[:] = S0 * jnp.exp(out_ref[:])


def _gbm_params(S0, r, sigma, T, n_steps):
    dt = jnp.float32(T) / n_steps
    return jnp.array([[S0, (r - 0.5 * sigma**2) * dt, sigma * jnp.sqrt(dt),
                       0.0]], jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret"))
def gbm_terminal_pallas(seed, S0, r, sigma, T, n_paths: int, n_steps: int,
                        antithetic: bool = True, interpret: bool = False,
                        first_tile=0):
    """Terminal prices S_T (n_paths_rounded,). ``first_tile`` offsets the
    global tile ids that seed the on-chip PRNG (pallas_heston module note)."""
    tile = _TERM_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    seed_arr = _seed_array(seed, first_tile)
    kernel = functools.partial(_gbm_terminal_kernel, n_steps=n_steps,
                               antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_TERM_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _TERM_ROWS, _LANES), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, _gbm_params(S0, r, sigma, T, n_steps))
    return out.reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret", "layout"))
def gbm_paths_pallas(seed, S0, r, sigma, T, n_paths: int, n_steps: int,
                     antithetic: bool = True, interpret: bool = False,
                     first_tile=0, layout: str = "flat"):
    """Full path matrix (n_steps+1, n_paths_rounded). ``first_tile`` offsets
    the global tile ids that seed the on-chip PRNG; ``layout`` as in
    heston_paths_pallas ("blocked" = contiguous per-tile slabs, ~1.8x the
    HBM-write throughput, same values/date order)."""
    tile = _PATH_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    seed_arr = _seed_array(seed, first_tile)
    shape, spec, unflat = _paths_out(grid, n_steps, layout)
    kernel = functools.partial(_gbm_paths_kernel, n_steps=n_steps,
                               antithetic=antithetic,
                               unroll=_pick_unroll(n_steps),
                               blocked=layout == "blocked")
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, _gbm_params(S0, r, sigma, T, n_steps))
    return unflat(out)
