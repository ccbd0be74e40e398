"""Engine selection: fused Pallas kernels on TPU, XLA scan elsewhere.

Both engines implement the same simulator contract (models/__init__.py); they
produce different (equally valid) random streams — the Pallas engine's RNG is
the on-chip hardware PRNG keyed by (seed, tile), the XLA engine's is threefry
keyed by (key, block, step). Prices agree within Monte-Carlo error; tests pin
both to their oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PALLAS_BACKENDS = ("tpu", "axon")


def pallas_available() -> bool:
    try:
        return jax.default_backend() in _PALLAS_BACKENDS
    except Exception:
        return False


def resolve_engine(engine: str) -> str:
    """'auto' -> 'pallas' on TPU-like backends else 'xla'.

    'pallas-interpret' runs the kernels through the Pallas TPU interpreter —
    kernel STRUCTURE (tiling, seeding plumbing, shard wiring) on any backend;
    note the interpreter's hardware PRNG emits zero bits, so dynamics
    degenerate to their deterministic drift (tests/test_pallas_kernels.py).
    """
    if engine == "auto":
        return "pallas" if pallas_available() else "xla"
    if engine not in ("xla", "pallas", "pallas-interpret"):
        raise ValueError("engine must be 'auto', 'xla', 'pallas' or "
                         f"'pallas-interpret', got {engine!r}")
    return engine


def is_pallas(engine_resolved: str) -> bool:
    """True for both the hardware and interpreter Pallas engines."""
    return engine_resolved in ("pallas", "pallas-interpret")


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Deterministic int32 seed for the on-chip PRNG from a jax PRNG key."""
    return jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)


def enable_compilation_cache(cache_dir: str = "/tmp/options_tpu_jit_cache",
                             min_compile_time_secs: float = 1.0) -> None:
    """Turn on JAX's persistent compilation cache.

    On the remote-compile TPU backend, first compiles of the large programs
    (64-maturity surface map, big LSM sweeps) take minutes; the persistent
    cache amortizes them across processes/rounds. Call once at app startup
    (the CLIs, bench.py and scripts/drive_tpu.py do). Safe to call twice.
    """
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
        # Accept cache hits for anything we ever wrote (default only caches
        # 'some' backends' keys).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # config names can drift across jax versions
        pass
