"""Path-block bookkeeping shared by all simulators."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from options_model_tpu.core.config import MCConfig


def paths_rounded(cfg: MCConfig) -> int:
    """n_paths rounded up to a whole number of blocks (each block is internally
    antithetic-paired, so blocks are always even)."""
    b = cfg.path_block
    return ((cfg.n_paths + b - 1) // b) * b


def num_blocks(cfg: MCConfig) -> int:
    return paths_rounded(cfg) // cfg.path_block


def block_normals(block_key: jax.Array, step: int, half: int, n_draws: int,
                  antithetic: bool, dtype) -> tuple:
    """Per-step standard normals for one block: n_draws arrays of shape (2*half,).

    With antithetic=True draw (half,) and mirror to (+Z, -Z); otherwise draw the
    full (2*half,). Keyed by (block_key, step, draw-index): fully counter-based.
    """
    out = []
    for d in range(n_draws):
        k = jax.random.fold_in(jax.random.fold_in(block_key, step), d)
        if antithetic:
            zh = jax.random.normal(k, (half,), dtype)
            out.append(jnp.concatenate([zh, -zh]))
        else:
            out.append(jax.random.normal(k, (2 * half,), dtype))
    return tuple(out)
