"""Experiment: full-path Heston kernel HBM-write layout (VERDICT r4 next #1).

The full-path kernel (the engine under every LSM/American workload) runs at
~20e9 path-steps/s = ~84 GB/s effective HBM write, ~10% of the chip's ~800
GB/s — while the storeless body runs 41.9e9. Suspect: the step-major output
layout (T+1, n_paths) makes each program's copy-out a strided DMA of (T+1)
chunks of rows*512 bytes (16 KB at rows=32), and/or the per-step VMEM stores
stall the loop.

Variants, slope-timed on the real chip at (2^20 paths, 100 steps):
  A  current kernel (rows=32, step-major strided copy-out)      [baseline]
  B  rows=64 / 128 / 256, same layout (bigger strided chunks)
  C  contiguous per-program block: out (grid, T+1, rows, 128), index (i,0,0,0)
     -> each program's copy-out is ONE contiguous slab; consumer pays an XLA
     transpose to (T+1, n_paths). Reported with and without the transpose.
  D  storeless upper bound (terminal body at the same rows).
Each row reports path-steps/s and achieved HBM write GB/s.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from options_model_tpu.core.config import HestonParams
from options_model_tpu.ops.pallas_heston import (
    _LANES, _heston_body, _params_array, _round_up, _seed_array, _tile_seed,
    heston_paths_pallas)


def _make_strided(rows):
    """Current layout at configurable rows: out (T+1, grid*rows, 128)."""
    def kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
        _tile_seed(seed_ref)
        S0 = par_ref[0, 0]

        def emit(t, logS, v):
            out_ref[t + 1] = logS

        out_ref[0] = jnp.zeros((rows, _LANES), jnp.float32)
        _heston_body(par_ref, rows, n_steps, antithetic, emit=emit)
        out_ref[:] = jnp.exp(jnp.log(S0) + out_ref[:])

    @functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
    def run(seed, S0, r, T, params, n_paths, n_steps):
        tile = rows * _LANES
        grid = _round_up(n_paths, tile) // tile
        par = _params_array(S0, r, T, params, n_steps)
        k = functools.partial(kernel, n_steps=n_steps, antithetic=True)
        out = pl.pallas_call(
            k, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((n_steps + 1, rows, _LANES),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_steps + 1, grid * rows, _LANES), jnp.float32),
        )(_seed_array(seed, 0), par)
        return out.reshape(n_steps + 1, -1)

    return run


def _make_contig(rows, transpose, vmem_mb=None):
    """Contiguous per-program slab: out (grid, T+1, rows, 128)."""
    def kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
        _tile_seed(seed_ref)
        S0 = par_ref[0, 0]

        def emit(t, logS, v):
            out_ref[0, t + 1] = logS

        out_ref[0, 0] = jnp.zeros((rows, _LANES), jnp.float32)
        _heston_body(par_ref, rows, n_steps, antithetic, emit=emit)
        out_ref[:] = jnp.exp(jnp.log(S0) + out_ref[:])

    @functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
    def run(seed, S0, r, T, params, n_paths, n_steps):
        tile = rows * _LANES
        grid = _round_up(n_paths, tile) // tile
        par = _params_array(S0, r, T, params, n_steps)
        k = functools.partial(kernel, n_steps=n_steps, antithetic=True)
        kw = {}
        if vmem_mb is not None:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024)
        out = pl.pallas_call(
            k, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, n_steps + 1, rows, _LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (grid, n_steps + 1, rows, _LANES), jnp.float32),
            **kw,
        )(_seed_array(seed, 0), par)
        if transpose:
            return jnp.transpose(out, (1, 0, 2, 3)).reshape(n_steps + 1, -1)
        return out

    return run


def _make_storeless(rows):
    """Upper bound: same body, terminal-only output."""
    def kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
        _tile_seed(seed_ref)
        logS, _ = _heston_body(par_ref, rows, n_steps, antithetic, emit=None)
        out_ref[:] = jnp.exp(logS)

    @functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
    def run(seed, S0, r, T, params, n_paths, n_steps):
        tile = rows * _LANES
        grid = _round_up(n_paths, tile) // tile
        par = _params_array(S0, r, T, params, n_steps)
        k = functools.partial(kernel, n_steps=n_steps, antithetic=True)
        out = pl.pallas_call(
            k, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * rows, _LANES), jnp.float32),
        )(_seed_array(seed, 0), par)
        return out.reshape(-1)

    return run


def _time_per_call(kernel_call, k1=2, k2=12, reps=5):
    def make(k):
        @jax.jit
        def f(seed0):
            def body(i, acc):
                return acc + jnp.mean(kernel_call(seed0 + i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return f

    f1, f2 = make(k1), make(k2)
    float(f1(0)); float(f2(0))

    def wt(f, s):
        t0 = time.perf_counter(); float(f(s * 100 + 1))
        return time.perf_counter() - t0

    t1 = min(wt(f1, r) for r in range(reps))
    t2 = min(wt(f2, r) for r in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    n_paths, n_steps = 1 << 20, 100
    gb = (n_steps + 1) * n_paths * 4 / 1e9
    print(f"backend {jax.default_backend()} {jax.devices()[0]}  "
          f"shape ({n_paths}, {n_steps})  out {gb:.2f} GB", flush=True)

    def report(label, dt, wrote_gb=gb):
        rate = n_paths * n_steps / dt
        print(f"{label:42s} {rate/1e9:6.1f}e9 path-steps/s   "
              f"{wrote_gb/dt:6.0f} GB/s write", flush=True)

    # does raising the compiler's 16MB scoped-VMEM default help bigger tiles?
    for rows, mb in ((64, None), (64, 100), (128, 100), (256, 100), (512, 100)):
        fn = _make_contig(rows, False, vmem_mb=mb)
        try:
            dt = _time_per_call(lambda s, fn=fn: fn(
                s, 100.0, 0.05, 1.0, hp, n_paths, n_steps)[..., -1])
        except Exception as e:
            print(f"C  contig rows={rows} vmem={mb}MB: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        report(f"C  contig rows={rows} vmem={mb}MB", dt)


if __name__ == "__main__":
    main()
