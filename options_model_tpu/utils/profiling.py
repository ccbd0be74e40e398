"""Profiling and timing harness.

Rebuilds the reference's wall-clock spans and GPU telemetry (SURVEY.md §5
"Tracing / profiling"): Timer context, the pilot-run ETA feature
(options_model_v1.5.py:349-361), device memory stats (the TPU analogue of
torch.cuda.memory_allocated, option_model_3_gpu.py:54-59), plus the
dependency-chained slope timer that measures true device time on backends
where dispatch is asynchronous and block_until_ready is unreliable.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


class Timer:
    """Wall-clock span: ``with Timer("phase") as t: ...; t.elapsed``."""

    def __init__(self, name: str = "", log=None):
        self.name = name
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.log is not None:
            self.log.info(f"{self.name}: {self.elapsed:.2f}s")
        return False


def estimate_total_runtime(pilot_seconds: float, n_pilot_tasks: int,
                           n_total_tasks: int, n_parallel: int = 1) -> float:
    """Pilot-run ETA: extrapolate one task group's wall time to the full grid
    (the reference timed one S0 curve and multiplied,
    options_model_v1.5.py:349-361)."""
    if n_pilot_tasks <= 0:
        return 0.0
    per_task = pilot_seconds / n_pilot_tasks
    return per_task * n_total_tasks / max(n_parallel, 1)


def device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device memory telemetry in MB (empty dict when the backend doesn't
    expose stats — e.g. CPU)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    mb = 1024 * 1024
    return {k: v / mb for k, v in stats.items()
            if isinstance(v, (int, float)) and "bytes" in k}


def time_per_call(kernel_call: Callable, k1: int = 2, k2: int = 12,
                  reps: int = 3) -> float:
    """True per-invocation device time via dependency-chained slope timing.

    Runs ``kernel_call(seed)`` k times inside one jit with a serial data
    dependency, forces completion with a scalar host read, and returns
    (t(k2) - t(k1)) / (k2 - k1) — constant dispatch/transfer overhead cancels.
    Use this instead of block_until_ready timing on remote-relay backends.
    """
    def make(k):
        @jax.jit
        def f(seed0):
            def body(i, acc):
                return acc + jnp.mean(kernel_call(seed0 + i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return f

    f1, f2 = make(k1), make(k2)
    float(f1(0)); float(f2(0))  # compile

    def best(f):
        out = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(f(r * 100 + 1))
            out = min(out, time.perf_counter() - t0)
        return out

    return max((best(f2) - best(f1)) / (k2 - k1), 1e-9)


def trace(path: str):
    """jax.profiler trace context for deep dives: ``with trace('/tmp/tr'): ...``"""
    return jax.profiler.trace(path)
