"""LSM regression feature basis.

The 7-feature basis of the reference (create_regression_features,
options_model_3/options_model_3.py:105-121):

    x = S / K,  st = sqrt(max(tau, 1e-6))
    [1, x, x^2, x^3, max(x-1, 0), st, x*st]

Built branch-free in jnp so it vmaps over (time, path) and fuses into the
surrounding regression matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_FEATURES = 7


def regression_features(S, K, tau):
    """Features for continuation-value regression.

    S: (...,) spot values; tau: scalar or broadcastable time-to-expiry.
    Returns (..., 7).
    """
    x = S / K
    st = jnp.sqrt(jnp.maximum(tau, 1e-6))
    st = jnp.broadcast_to(jnp.asarray(st, x.dtype), x.shape)
    return jnp.stack(
        [jnp.ones_like(x), x, x**2, x**3, jnp.maximum(x - 1.0, 0.0), st, x * st],
        axis=-1,
    )


def poly_features(S, K, tau, degree: int = 2):
    """Plain polynomial basis in x = S/K up to ``degree`` — restores the
    reference's vestigial lsm_poly_degree knob (Options_model.py:53) as a
    first-class alternative basis."""
    x = S / K
    cols = [x**d for d in range(degree + 1)]
    return jnp.stack(cols, axis=-1)
