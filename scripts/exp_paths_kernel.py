"""Experiment: full-path Heston kernel — per-step exp vs bulk exp after loop.

Hypothesis: the ~2.5x throughput gap between the terminal kernel (45.6e9
path-steps/s) and the full-path kernel (18.2e9) is the per-step jnp.exp in
emit() (terminal does ONE exp at the end), not the HBM stores (1.7 GB at
819 GB/s is ~2 ms of a ~23 ms kernel).

Variants, slope-timed on the real chip:
  A. current: emit stores exp(logS) per step          (_PATH_ROWS=32)
  B. emit stores logS; one bulk exp over the whole VMEM block after the loop
  C. B at _PATH_ROWS=64
  D. B with no exp at all (consumer exps lazily) — upper bound
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
    _LANES, _heston_body, _params_array, _round_up, _step_normals,
    heston_paths_pallas)


def _make_paths_fn(rows, mode, unroll=1):
    def kernel(seed_ref, par_ref, out_ref, *, n_steps, antithetic):
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        S0 = par_ref[0, 0]
        logS0 = jnp.log(S0)

        if mode == "batched":
            # E: unroll U steps per fori iteration, ONE (U, rows, 128) slab
            # store instead of U row stores — tests whether the store cost
            # is per-instruction overhead or raw VMEM bandwidth.
            r = par_ref[0, 1]
            dt = par_ref[0, 2]
            kappa = par_ref[0, 3]
            theta = par_ref[0, 4]
            xi = par_ref[0, 5]
            rho = par_ref[0, 6]
            rho_bar = par_ref[0, 7]
            v0 = par_ref[0, 8]
            sqrt_dt = jnp.sqrt(dt)
            assert n_steps % unroll == 0

            def body(c, carry):
                logS, v = carry
                outs = []
                for _ in range(unroll):
                    z1, z2 = _step_normals(rows, antithetic)
                    w2 = rho * z1 + rho_bar * z2
                    v_plus = jnp.maximum(v, 0.0)
                    sq = jnp.sqrt(v_plus) * sqrt_dt
                    v = jnp.maximum(
                        v_plus + kappa * (theta - v_plus) * dt + xi * sq * w2,
                        0.0)
                    logS = logS + (r - 0.5 * v_plus) * dt + sq * z1
                    outs.append(logS)
                out_ref[pl.ds(c * unroll + 1, unroll)] = jnp.stack(outs)
                return logS, v

            out_ref[0] = jnp.zeros((rows, _LANES), jnp.float32)
            jax.lax.fori_loop(0, n_steps // unroll, body,
                              (jnp.zeros((rows, _LANES), jnp.float32),
                               jnp.full((rows, _LANES), v0, jnp.float32)))
            out_ref[:] = jnp.exp(logS0 + out_ref[:])
        elif mode == "per_step_exp":
            def emit(t, logS, v):
                out_ref[t + 1] = jnp.exp(logS0 + logS)
            out_ref[0] = jnp.full((rows, _LANES), S0, jnp.float32)
            _heston_body(par_ref, rows, n_steps, antithetic, emit=emit)
        else:
            def emit(t, logS, v):
                out_ref[t + 1] = logS
            out_ref[0] = jnp.zeros((rows, _LANES), jnp.float32)
            _heston_body(par_ref, rows, n_steps, antithetic, emit=emit)
            if mode == "bulk_exp":
                out_ref[:] = jnp.exp(logS0 + out_ref[:])

    @functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
    def run(seed, S0, r, T, params, n_paths, n_steps):
        tile = rows * _LANES
        n_pad = _round_up(n_paths, tile)
        grid = n_pad // tile
        par = _params_array(S0, r, T, params, n_steps)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        shape = jax.ShapeDtypeStruct((n_steps + 1, grid * rows, _LANES),
                                     jnp.float32)
        spec = pl.BlockSpec((n_steps + 1, rows, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        k = functools.partial(kernel, n_steps=n_steps, antithetic=True)
        out = pl.pallas_call(
            k, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=spec, out_shape=shape,
        )(seed_arr, par)
        return out.reshape(n_steps + 1, -1)

    return run


def _time_per_call(kernel_call, k1=1, k2=6, reps=3):
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
    n_paths, n_steps = 1 << 19, 100
    print("backend", jax.default_backend(), jax.devices()[0])

    dt0 = _time_per_call(lambda s: heston_paths_pallas(
        s, 100.0, 0.05, 1.0, hp, n_paths, n_steps)[-1])
    print(f"current (per-step exp, rows=32): {n_paths*n_steps/dt0/1e9:.1f}e9 path-steps/s")

    for rows, mode, unroll, label in [
        (32, "bulk_exp", 1, "B bulk-exp rows=32"),
        (32, "batched", 2, "E2 batched-store U=2"),
        (32, "batched", 4, "E4 batched-store U=4"),
        (32, "batched", 10, "E10 batched-store U=10"),
        (16, "batched", 4, "E4/16 batched-store U=4 rows=16"),
        (32, "no_exp", 1, "D log-only rows=32 (upper bound)"),
    ]:
        fn = _make_paths_fn(rows, mode, unroll)
        # correctness pin vs current variant (same RNG stream per tile size
        # only when rows match: rows=32 variants must agree exactly)
        if rows == 32:
            a = heston_paths_pallas(7, 100.0, 0.05, 1.0, hp, 1 << 14, 20)
            b = fn(7, 100.0, 0.05, 1.0, hp, 1 << 14, 20)
            if mode in ("bulk_exp", "batched"):
                err = float(jnp.max(jnp.abs(a - b) / a))
            else:
                err = float(jnp.max(jnp.abs(a - jnp.exp(jnp.log(100.0) + b.at[0].set(0.0)))
                                    / a))
            print(f"  {label}: max rel diff vs current = {err:.2e}")
        dt = _time_per_call(lambda s, fn=fn: fn(
            s, 100.0, 0.05, 1.0, hp, n_paths, n_steps)[-1])
        print(f"{label}: {n_paths*n_steps/dt/1e9:.1f}e9 path-steps/s")


if __name__ == "__main__":
    main()
