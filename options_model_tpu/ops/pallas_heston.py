"""Fused Heston path-simulation Pallas kernels (SURVEY.md §2.3 kernel #2).

One kernel program owns a tile of paths resident in VMEM registers and runs the
ENTIRE time loop on-chip: per step it draws raw bits from the hardware PRNG,
Box-Mullers them into correlated normals, and advances (log S, v) with the
full-truncation Euler scheme — zero HBM traffic until the final write. This is
what the reference's memory-capped torch batching (option_model_3_gpu.py:150-248)
becomes when the whole step loop fuses.

RNG discipline: the PRNG is seeded with (user_seed, first_tile + tile_index),
so every tile's stream is a pure function of its GLOBAL tile id — results are
independent of grid scheduling and, with tiles sharded across chips, of the
device count. ``first_tile`` is the caller's global tile offset (the kernel
analogue of the XLA simulators' ``first_block``): a mesh shard covering global
paths [first_tile*tile, ...) reproduces exactly the tiles a single device
would have produced there, so path-sharded pricing equals the unsharded run
draw-for-draw (parallel/batch.py passes it via simulate_paths'
pallas_global_tiles contract). Antithetic pairing mirrors the top half of each
tile's rows.

Two variants share one body:
- terminal-only: returns S_T (n_paths,) — the calibration/European hot path;
  never materializes a path matrix (compute-bound, ~zero bytes moved).
- full paths:    returns S (n_steps+1, n_paths) for the LSM backward pass
  (HBM-write-bound; layout (T, P/128, 128) so each step's store is tiled).

Full-path output layouts (``layout=`` on the paths entries):
- "flat" (default): (n_steps+1, n_paths) — the natural per-date matrix, but
  each program's copy-out is a STRIDED DMA of (n_steps+1) chunks of
  _PATH_ROWS*512 bytes. Measured on v5e at (2^20, 100): ~20e9 path-steps/s,
  ~80 GB/s effective HBM write — the r4 regression's root cause (the write
  pattern, not libtpu: an A/B at identical seeding confirms layout alone
  moves it).
- "blocked": (n_tiles, n_steps+1, _PATH_ROWS, 128) — each program's copy-out
  is ONE contiguous slab. Measured ~36e9 path-steps/s, ~145 GB/s write
  (storeless compute bound: ~50e9). The per-date path vector
  ``blocked[:, t].reshape(-1)`` is ELEMENT-FOR-ELEMENT IDENTICAL to the flat
  matrix's row ``flat[t]`` (same tile-major path order), so LSM consumers
  index per date with zero transpose cost (ops/layout.py accessors) and the
  two layouts are interchangeable: blocked.transpose(1,0,2,3).reshape ==
  flat, bitwise (tested in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from options_model_tpu.core.config import HestonParams

# Tile geometry: ROWS x 128 paths per program instance. 128 rows won an
# on-chip sweep (dependency-chained slope timing, v5e, 2^22 paths x 100 steps):
# 46.9 G path-steps/s vs 44.1 at 64 rows, 41.9 at 32, 25.5 at 16 — small tiles
# underfill the VPU pipeline, larger ones blow up compile time.
_LANES = 128
_TERM_ROWS = 128      # 16384 paths/tile for the terminal kernel
_PATH_ROWS = 32       # 4096 paths/tile for the full-path kernel. In the
                      # blocked layout: ~36e9 path-steps/s at (2^20, 100) on
                      # v5e (rows=64 measured the same within noise but
                      # halves the max n_steps the 16MB scoped-VMEM double
                      # buffer admits); the flat layout's strided copy-out
                      # runs ~20e9 at any row count (32/64/128 measured
                      # 19-22), and the storeless body ~50e9 — see
                      # scripts/exp_fullpath_layout.py

_TWO_PI = 6.283185307179586

# Paths per program instance — the granularity of the global tile ids that
# seed the on-chip PRNG (and so the unit of ``first_tile``).
TERMINAL_TILE = _TERM_ROWS * _LANES
PATH_TILE = _PATH_ROWS * _LANES


def _seed_array(seed, first_tile) -> jnp.ndarray:
    """(1, 2) int32 SMEM payload [seed, first_tile] shared by every kernel."""
    return jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                      jnp.asarray(first_tile, jnp.int32).reshape(())]
                     ).reshape(1, 2)


def _tile_seed(seed_ref):
    """Seed the on-chip PRNG with this program's GLOBAL tile id."""
    pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + pl.program_id(0))


def _uniform_from_bits(bits):
    """uint32 -> float32 uniform in [0, 1): set exponent to [1,2), subtract 1."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _box_muller(shape):
    """Two independent N(0,1) arrays of ``shape`` from the seeded on-chip PRNG."""
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    # 1 - u1 in (0, 1] keeps the log finite.
    rad = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
    ang = _TWO_PI * u2
    return rad * jnp.cos(ang), rad * jnp.sin(ang)


def _step_normals(rows, antithetic):
    """Correlated-normal building blocks z1, z2 of shape (rows, 128)."""
    if antithetic:
        z1h, z2h = _box_muller((rows // 2, _LANES))
        z1 = jnp.concatenate([z1h, -z1h], axis=0)
        z2 = jnp.concatenate([z2h, -z2h], axis=0)
    else:
        z1, z2 = _box_muller((rows, _LANES))
    return z1, z2


def _pick_unroll(n_steps: int) -> int:
    """Steps per chunked store: the largest candidate dividing n_steps.
    Batching u consecutive (rows, 128) stores into one (u, rows, 128) slab
    is a measured ~+8% on the blocked full-path kernel (33.5 -> 36e9 at
    u=4..10, scripts/exp_fullpath_layout.py) — per-store overhead, not VMEM
    bandwidth. RNG stream is unchanged (same draw order)."""
    return next(u for u in (8, 5, 4, 3, 2, 1) if n_steps % u == 0)


def _heston_body(par_ref, rows, n_steps, antithetic, emit, unroll: int = 1):
    """Shared step loop. ``emit(t0, logS_chunk, v_chunk)`` stores a chunk of
    ``unroll`` consecutive steps — (unroll, rows, 128) stacks whose first step
    is t0 (0-based) — or None for terminal-only use."""
    S0 = par_ref[0, 0]
    r = par_ref[0, 1]
    dt = par_ref[0, 2]
    kappa = par_ref[0, 3]
    theta = par_ref[0, 4]
    xi = par_ref[0, 5]
    rho = par_ref[0, 6]
    rho_bar = par_ref[0, 7]
    v0 = par_ref[0, 8]
    sqrt_dt = jnp.sqrt(dt)

    def step(logS, v):
        z1, z2 = _step_normals(rows, antithetic)
        w2 = rho * z1 + rho_bar * z2
        v_plus = jnp.maximum(v, 0.0)
        sq = jnp.sqrt(v_plus) * sqrt_dt
        v_new = jnp.maximum(v_plus + kappa * (theta - v_plus) * dt + xi * sq * w2, 0.0)
        logS_new = logS + (r - 0.5 * v_plus) * dt + sq * z1
        return logS_new, v_new

    logS = jnp.zeros((rows, _LANES), jnp.float32)
    v = jnp.full((rows, _LANES), v0, jnp.float32)

    if emit is None:
        def body(t, carry):
            return step(*carry)

        logS, v = jax.lax.fori_loop(0, n_steps, body, (logS, v))
    else:
        assert n_steps % unroll == 0, (n_steps, unroll)

        def body(c, carry):
            logS, v = carry
            s_out, v_out = [], []
            for _ in range(unroll):
                logS, v = step(logS, v)
                s_out.append(logS)
                v_out.append(v)
            emit(c * unroll, jnp.stack(s_out), jnp.stack(v_out))
            return logS, v

        logS, v = jax.lax.fori_loop(0, n_steps // unroll, body, (logS, v))
    return jnp.log(S0) + logS, v


def _terminal_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
    _tile_seed(seed_ref)
    logS, _ = _heston_body(par_ref, _TERM_ROWS, n_steps, antithetic, emit=None)
    out_ref[:] = jnp.exp(logS)


def _paths_emit(out_ref, unroll, blocked):
    """Chunked-store emit writing logS slabs into a full-path output ref.
    ``blocked``: out_ref is the (1, n_steps+1, rows, 128) slab of the
    blocked layout (leading tile axis) instead of (n_steps+1, rows, 128)."""
    if blocked:
        def emit(t0, s_chunk, v_chunk):
            out_ref[0, pl.ds(t0 + 1, unroll)] = s_chunk
    else:
        def emit(t0, s_chunk, v_chunk):
            out_ref[pl.ds(t0 + 1, unroll)] = s_chunk
    return emit


def _paths_sv_emit(s_ref, v_ref, unroll, blocked):
    """As _paths_emit, also storing the variance chunk."""
    if blocked:
        def emit(t0, s_chunk, v_chunk):
            s_ref[0, pl.ds(t0 + 1, unroll)] = s_chunk
            v_ref[0, pl.ds(t0 + 1, unroll)] = v_chunk
    else:
        def emit(t0, s_chunk, v_chunk):
            s_ref[pl.ds(t0 + 1, unroll)] = s_chunk
            v_ref[pl.ds(t0 + 1, unroll)] = v_chunk
    return emit


def _row0(ref, value, blocked):
    if blocked:
        ref[0, 0] = value
    else:
        ref[0] = value


def _paths_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic,
                  unroll=1, blocked=False):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]

    # Store RELATIVE logS per step; one bulk exp over the whole VMEM block
    # after the loop. A per-step exp in emit() serializes a transcendental
    # into every loop iteration — hoisting it is a measured 17.0 -> 22.8
    # G path-steps/s on v5e (scripts/exp_paths_kernel.py; the no-exp upper
    # bound is 23.6, so the bulk pass costs ~3%).
    _row0(out_ref, jnp.zeros((_PATH_ROWS, _LANES), jnp.float32), blocked)
    _heston_body(par_ref, _PATH_ROWS, n_steps, antithetic,
                 emit=_paths_emit(out_ref, unroll, blocked), unroll=unroll)
    out_ref[:] = jnp.exp(jnp.log(S0) + out_ref[:])


def _paths_v_kernel(seed_ref, par_ref, s_ref, v_ref, *, n_steps, antithetic,
                    unroll=1, blocked=False):
    """Full-path kernel that also stores the variance path — the feed for the
    variance-augmented LSM basis (the continuation value under Heston depends
    on the state (S, v); regressing on S alone biases the exercise policy
    ~0.7% low vs the ADI oracle, pricers/fd_heston.py)."""
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    v0 = par_ref[0, 8]

    # relative logS in the loop, one bulk exp after (see _paths_kernel)
    _row0(s_ref, jnp.zeros((_PATH_ROWS, _LANES), jnp.float32), blocked)
    _row0(v_ref, jnp.full((_PATH_ROWS, _LANES), v0, jnp.float32), blocked)
    _heston_body(par_ref, _PATH_ROWS, n_steps, antithetic,
                 emit=_paths_sv_emit(s_ref, v_ref, unroll, blocked),
                 unroll=unroll)
    s_ref[:] = jnp.exp(jnp.log(S0) + s_ref[:])


def _params_array(S0, r, T, params: HestonParams, n_steps) -> jnp.ndarray:
    dt = jnp.float32(T) / n_steps
    rho = jnp.float32(params.rho)
    return jnp.array([[S0, r, dt, params.kappa, params.theta, params.xi,
                       params.rho, jnp.sqrt(1.0 - rho**2), params.v0,
                       0.0, 0.0, 0.0]], jnp.float32)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret"))
def heston_terminal_pallas(seed, S0, r, T, params: HestonParams,
                           n_paths: int, n_steps: int, antithetic: bool = True,
                           interpret: bool = False, first_tile=0):
    """Terminal prices S_T (n_paths_rounded,) from the fused kernel.

    ``seed`` is an int32 scalar; global tile ids (first_tile + local tile)
    extend it on-chip. n_paths rounds up to whole TERMINAL_TILE tiles.
    """
    tile = _TERM_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    par = _params_array(S0, r, T, params, n_steps)
    seed_arr = _seed_array(seed, first_tile)

    kernel = functools.partial(_terminal_kernel, n_steps=n_steps,
                               antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TERM_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _TERM_ROWS, _LANES), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par)
    return out.reshape(-1)


def _paths_out(grid, n_steps, layout):
    """(out_shape, out_spec, unflatten) for a full-path output under either
    layout. "flat": (n_steps+1, n_paths) — per-program copy-out is a strided
    DMA (~80 GB/s effective on v5e, the r4 regression). "blocked":
    (n_tiles, n_steps+1, _PATH_ROWS, 128) — one contiguous slab per program
    (~145 GB/s, ~1.8x the kernel rate); per-date vectors are identical to the
    flat rows (module docstring), so consumers pay nothing to index dates."""
    if layout == "blocked":
        shape = jax.ShapeDtypeStruct((grid, n_steps + 1, _PATH_ROWS, _LANES),
                                     jnp.float32)
        spec = pl.BlockSpec((1, n_steps + 1, _PATH_ROWS, _LANES),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        return shape, spec, lambda out: out
    if layout != "flat":
        raise ValueError(f"layout must be 'flat' or 'blocked', got {layout!r}")
    shape = jax.ShapeDtypeStruct((n_steps + 1, grid * _PATH_ROWS, _LANES),
                                 jnp.float32)
    spec = pl.BlockSpec((n_steps + 1, _PATH_ROWS, _LANES),
                        lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return shape, spec, lambda out: out.reshape(n_steps + 1, -1)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret", "return_variance",
                                             "layout"))
def heston_paths_pallas(seed, S0, r, T, params: HestonParams,
                        n_paths: int, n_steps: int, antithetic: bool = True,
                        interpret: bool = False,
                        return_variance: bool = False, first_tile=0,
                        layout: str = "flat"):
    """Full path matrix from the fused kernel; with ``return_variance`` also
    the variance matrix (same layout) — the variance-augmented LSM basis
    feed. ``layout``: "flat" (n_steps+1, n_paths_rounded) or "blocked"
    (n_tiles, n_steps+1, _PATH_ROWS, 128) — same values, same per-date path
    order, ~1.8x the HBM-write throughput (module docstring)."""
    tile = _PATH_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    par = _params_array(S0, r, T, params, n_steps)
    seed_arr = _seed_array(seed, first_tile)

    shape, spec, unflat = _paths_out(grid, n_steps, layout)
    unroll = _pick_unroll(n_steps)
    blocked = layout == "blocked"
    if return_variance:
        kernel = functools.partial(_paths_v_kernel, n_steps=n_steps,
                                   antithetic=antithetic, unroll=unroll,
                                   blocked=blocked)
        S, V = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(spec, spec), out_shape=(shape, shape),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seed_arr, par)
        return unflat(S), unflat(V)
    kernel = functools.partial(_paths_kernel, n_steps=n_steps,
                               antithetic=antithetic, unroll=unroll,
                               blocked=blocked)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=spec,
        out_shape=shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par)
    return unflat(out)


# --- Andersen QE-M variant -----------------------------------------------

def _qe_body(par_ref, rows, n_steps, antithetic, emit, unroll: int = 1):
    """Shared QE-M step loop (scheme of models/heston._simulate_heston_qe).
    Per step: one Box-Muller pair (z_v, z_s) + one raw uniform for the
    exponential-mixture branch — the hardware PRNG supplies the uniform
    directly, no ndtr needed. Constants are precomputed host-side and read
    from SMEM. ``emit(t0, logS_chunk, v_chunk)`` stores a chunk of ``unroll``
    consecutive steps (the _heston_body contract), or None."""
    r = par_ref[0, 1]
    dt = par_ref[0, 2]
    theta = par_ref[0, 4]
    v0 = par_ref[0, 8]
    ekt = par_ref[0, 9]
    c1 = par_ref[0, 10]
    c2 = par_ref[0, 11]
    K1 = par_ref[0, 12]
    K2 = par_ref[0, 13]
    K3 = par_ref[0, 14]
    K4 = par_ref[0, 15]
    A = K2 + 0.5 * K4
    half = rows // 2

    logS = jnp.zeros((rows, _LANES), jnp.float32)
    v = jnp.full((rows, _LANES), v0, jnp.float32)

    def step(logS, v):
        if antithetic:
            z_vh, z_sh = _box_muller((half, _LANES))
            z_v = jnp.concatenate([z_vh, -z_vh], axis=0)
            z_s = jnp.concatenate([z_sh, -z_sh], axis=0)
            uh = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits((half, _LANES)), jnp.uint32))
            u = jnp.concatenate([uh, 1.0 - uh], axis=0)
        else:
            z_v, z_s = _box_muller((rows, _LANES))
            u = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits((rows, _LANES)), jnp.uint32))

        m = theta + (v - theta) * ekt
        s2 = v * c1 + c2
        psi = s2 / jnp.maximum(m**2, 1e-20)

        two_over = 2.0 / jnp.maximum(psi, 1e-12)
        b2 = jnp.maximum(two_over - 1.0
                         + jnp.sqrt(jnp.maximum(two_over, 0.0))
                         * jnp.sqrt(jnp.maximum(two_over - 1.0, 0.0)), 0.0)
        a = m / (1.0 + b2)
        b = jnp.sqrt(b2)
        v_quad = a * (b + z_v) ** 2

        p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
        beta = (1.0 - p) / jnp.maximum(m, 1e-20)
        v_exp = jnp.where(u <= p, 0.0,
                          jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-12))
                          / jnp.maximum(beta, 1e-20))

        quad = psi <= 1.5
        v_new = jnp.where(quad, v_quad, v_exp)

        Aa = A * a
        k0_quad = (-Aa * b2 / jnp.maximum(1.0 - 2.0 * Aa, 1e-6)
                   + 0.5 * jnp.log(jnp.maximum(1.0 - 2.0 * Aa, 1e-6)))
        k0_exp = -jnp.log(jnp.maximum(
            p + beta * (1.0 - p) / jnp.maximum(beta - A, 1e-12), 1e-12))
        K0_star = jnp.where(quad, k0_quad, k0_exp) - (K1 + 0.5 * K3) * v

        logS_new = (logS + r * dt + K0_star + K1 * v + K2 * v_new
                    + jnp.sqrt(jnp.maximum(K3 * v + K4 * v_new, 0.0)) * z_s)
        return logS_new, v_new

    if emit is None:
        def body(t, carry):
            return step(*carry)

        return jax.lax.fori_loop(0, n_steps, body, (logS, v))
    assert n_steps % unroll == 0, (n_steps, unroll)

    def body(c, carry):
        logS, v = carry
        s_out, v_out = [], []
        for _ in range(unroll):
            logS, v = step(logS, v)
            s_out.append(logS)
            v_out.append(v)
        emit(c * unroll, jnp.stack(s_out), jnp.stack(v_out))
        return logS, v

    return jax.lax.fori_loop(0, n_steps // unroll, body, (logS, v))


def _qe_terminal_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    logS, _ = _qe_body(par_ref, _TERM_ROWS, n_steps, antithetic, emit=None)
    out_ref[:] = jnp.exp(jnp.log(S0) + logS)


def _qe_paths_kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic,
                     unroll=1, blocked=False):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]

    # relative logS in the loop, one bulk exp after (see _paths_kernel)
    _row0(out_ref, jnp.zeros((_PATH_ROWS, _LANES), jnp.float32), blocked)
    _qe_body(par_ref, _PATH_ROWS, n_steps, antithetic,
             emit=_paths_emit(out_ref, unroll, blocked), unroll=unroll)
    out_ref[:] = jnp.exp(jnp.log(S0) + out_ref[:])


def _qe_paths_v_kernel(seed_ref, par_ref, s_ref, v_ref, *, n_steps,
                       antithetic, unroll=1, blocked=False):
    _tile_seed(seed_ref)
    S0 = par_ref[0, 0]
    v0 = par_ref[0, 8]

    # relative logS in the loop, one bulk exp after (see _paths_kernel)
    _row0(s_ref, jnp.zeros((_PATH_ROWS, _LANES), jnp.float32), blocked)
    _row0(v_ref, jnp.full((_PATH_ROWS, _LANES), v0, jnp.float32), blocked)
    _qe_body(par_ref, _PATH_ROWS, n_steps, antithetic,
             emit=_paths_sv_emit(s_ref, v_ref, unroll, blocked),
             unroll=unroll)
    s_ref[:] = jnp.exp(jnp.log(S0) + s_ref[:])


def _qe_params_array(S0, r, T, params: HestonParams, n_steps) -> jnp.ndarray:
    dt = jnp.float32(T) / n_steps
    kappa = jnp.float32(params.kappa)
    theta = jnp.float32(params.theta)
    xi = jnp.float32(params.xi)
    rho = jnp.float32(params.rho)
    ekt = jnp.exp(-kappa * dt)
    c1 = xi**2 * ekt * (1.0 - ekt) / kappa
    c2 = theta * xi**2 * (1.0 - ekt) ** 2 / (2.0 * kappa)
    g = 0.5
    K1 = g * dt * (kappa * rho / xi - 0.5) - rho / xi
    K2 = g * dt * (kappa * rho / xi - 0.5) + rho / xi
    K3 = g * dt * (1.0 - rho**2)
    K4 = K3
    return jnp.array([[S0, r, dt, kappa, theta, xi, rho, 0.0, params.v0,
                       ekt, c1, c2, K1, K2, K3, K4]], jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret"))
def heston_terminal_qe_pallas(seed, S0, r, T, params: HestonParams,
                              n_paths: int, n_steps: int,
                              antithetic: bool = True, interpret: bool = False,
                              first_tile=0):
    """Terminal prices under the fused QE-M kernel (n_paths_rounded,)."""
    tile = _TERM_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    par = _qe_params_array(S0, r, T, params, n_steps)
    seed_arr = _seed_array(seed, first_tile)

    kernel = functools.partial(_qe_terminal_kernel, n_steps=n_steps,
                               antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TERM_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _TERM_ROWS, _LANES), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par)
    return out.reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic",
                                             "interpret", "return_variance",
                                             "layout"))
def heston_paths_qe_pallas(seed, S0, r, T, params: HestonParams,
                           n_paths: int, n_steps: int, antithetic: bool = True,
                           interpret: bool = False,
                           return_variance: bool = False, first_tile=0,
                           layout: str = "flat"):
    """Full path matrix under the fused QE-M kernel — the LSM/surface feed at
    QE accuracy (16 QE dates match 50+ Euler dates, so the backward pass
    shrinks accordingly). ``return_variance`` also emits the variance matrix;
    ``layout`` as in heston_paths_pallas."""
    tile = _PATH_ROWS * _LANES
    n_pad = _round_up(n_paths, tile)
    grid = n_pad // tile
    par = _qe_params_array(S0, r, T, params, n_steps)
    seed_arr = _seed_array(seed, first_tile)

    shape, spec, unflat = _paths_out(grid, n_steps, layout)
    unroll = _pick_unroll(n_steps)
    blocked = layout == "blocked"
    if return_variance:
        kernel = functools.partial(_qe_paths_v_kernel, n_steps=n_steps,
                                   antithetic=antithetic, unroll=unroll,
                                   blocked=blocked)
        S, V = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(spec, spec), out_shape=(shape, shape),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seed_arr, par)
        return unflat(S), unflat(V)
    kernel = functools.partial(_qe_paths_kernel, n_steps=n_steps,
                               antithetic=antithetic, unroll=unroll,
                               blocked=blocked)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=spec,
        out_shape=shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, par)
    return unflat(out)
