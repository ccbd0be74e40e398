"""Branch-free payoff functions.

cp-flag convention: +1 call / -1 put (core/config.py). Everything is elementwise
jnp so payoffs vmap over paths, strikes and grids alike.
"""

from __future__ import annotations

import jax.numpy as jnp


def vanilla_payoff(S, K, cp):
    """max(cp * (S - K), 0) — the reference's _payoff
    (options_model_3/options_model_3.py:376-380) without the string branch."""
    return jnp.maximum(cp * (S - K), 0.0)


def barrier_knockout_mask(S_paths, barrier, is_up: bool):
    """1.0 for paths that never crossed the barrier (knock-out survives).

    S_paths: (n_steps+1, n_paths). Implements the capability behind the
    reference's ExoticOptionPricer.price_barrier_option stub (options_model_2.py:62-66).
    """
    if is_up:
        crossed = jnp.any(S_paths >= barrier, axis=0)
    else:
        crossed = jnp.any(S_paths <= barrier, axis=0)
    return jnp.where(crossed, 0.0, 1.0)


def barrier_knockin_mask(S_paths, barrier, is_up: bool):
    """1.0 for paths that did cross the barrier (knock-in activates)."""
    return 1.0 - barrier_knockout_mask(S_paths, barrier, is_up)
