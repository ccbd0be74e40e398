"""PRNG key discipline: explicit, counter-based, sharding-invariant.

The principled rebuild of the reference's ``RNGManager`` (master seed -> stream of
child seeds, options_model_3/options_model_3.py:69-79). Instead of mutating a
master generator, every consumer receives an explicit ``jax.random`` key and
derives sub-streams with ``fold_in`` on *semantic indices* (path-block index,
time-step index, task index).

The critical property — prices identical for any chip count or chunk schedule —
comes from keying randomness by GLOBAL path-block index, never by device or chunk
position (SURVEY.md §7 "Reproducibility across sharding").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spawn_key(seed: int) -> jax.Array:
    """Master key from an integer seed (RNGManager.__init__ analogue)."""
    return jax.random.key(seed)


def child_keys(key: jax.Array, n: int) -> jax.Array:
    """n independent child keys (RNGManager.get_child_rng analogue)."""
    return jax.random.split(key, n)


def path_block_keys(key: jax.Array, first_block: int, n_blocks: int) -> jax.Array:
    """Keys for a contiguous range of global path blocks.

    Block ``b`` always receives ``fold_in(key, b)`` regardless of which device or
    chunk iteration processes it, so results are bitwise independent of the
    chunking/sharding schedule.
    """
    blocks = first_block + jnp.arange(n_blocks)
    return jax.vmap(lambda b: jax.random.fold_in(key, b))(blocks)


def task_key(key: jax.Array, task_index) -> jax.Array:
    """Key for an orchestration task (one (S0, curve-point) cell of a batch grid).

    Replaces the reference's pre-derived per-worker seeds
    (options_model_3/options_model_3.py:1044-1051).
    """
    return jax.random.fold_in(key, task_index)
