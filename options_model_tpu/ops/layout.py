"""Path-matrix layout accessors: flat (n_steps+1, n_paths) vs blocked
(n_tiles, n_steps+1, rows, 128).

The fused Pallas full-path kernels emit either layout (ops/pallas_heston.py
module docstring): "blocked" makes each kernel program's HBM copy-out ONE
contiguous slab instead of a strided DMA — measured ~1.8x the kernel
throughput on v5e — and its per-date path vector ``blocked[:, t].reshape(-1)``
is element-for-element identical to the flat matrix's row ``flat[t]`` (both
flatten paths tile-major: path p = tile*rows*128 + row*128 + lane). LSM
consumers therefore index dates through these accessors and run bit-identically
on either layout, paying zero transpose cost.

The XLA simulators always produce flat matrices; only the Pallas engine emits
blocked ones, and only when a consumer asks (pricers/american.simulate_paths
``layout=``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_blocked(paths) -> bool:
    """True for the blocked kernel layout (n_tiles, n_steps+1, rows, 128)."""
    return paths.ndim == 4


def num_steps(paths) -> int:
    """n_steps (the matrix holds n_steps+1 dates including t=0)."""
    return (paths.shape[1] if is_blocked(paths) else paths.shape[0]) - 1


def num_paths(paths) -> int:
    if is_blocked(paths):
        g, _, r, l = paths.shape
        return g * r * l
    return paths.shape[1]


def date_slice(paths, t):
    """The (n_paths,) state vector at date ``t`` (python int or traced scalar).
    Blocked: identical element order to the flat row (module docstring)."""
    if not is_blocked(paths):
        return paths[t]
    g, _, r, l = paths.shape
    return jax.lax.dynamic_index_in_dim(paths, t, axis=1,
                                        keepdims=False).reshape(g * r * l)


def terminal_slice(paths):
    """The (n_paths,) terminal state S_T."""
    if not is_blocked(paths):
        return paths[-1]
    g, _, r, l = paths.shape
    return paths[:, -1].reshape(g * r * l)


def initial_scalar(paths):
    """S_0 as a scalar (every path starts at the same spot)."""
    if not is_blocked(paths):
        return paths[0][0]
    return paths[0, 0, 0, 0]


def date_range(paths, lo: int, hi: int):
    """The (hi-lo, n_paths) sub-matrix of dates [lo, hi) — materializes a
    transpose for blocked input; only for consumers that genuinely need the
    dense (dates, paths) matrix (e.g. the NN-LSM's batched feature build)."""
    if not is_blocked(paths):
        return paths[lo:hi]
    g, _, r, l = paths.shape
    return jnp.transpose(paths[:, lo:hi], (1, 0, 2, 3)).reshape(
        hi - lo, g * r * l)


def to_flat(paths):
    """Full (n_steps+1, n_paths) matrix — materializes a transpose for
    blocked input (one extra HBM round trip; avoid on hot paths)."""
    if not is_blocked(paths):
        return paths
    g, d, r, l = paths.shape
    return jnp.transpose(paths, (1, 0, 2, 3)).reshape(d, g * r * l)
