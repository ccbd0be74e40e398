"""Path simulators: martingale properties, antithetic symmetry, RNG invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import HestonParams, MCConfig
from options_model_tpu.models import (
    gbm_terminal_exact,
    simulate_gbm,
    simulate_heston,
    simulate_local_vol,
)

HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
CFG = MCConfig(n_paths=8192, n_steps=32, path_block=2048)


class TestGBM:
    def test_shapes(self, key):
        S = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, CFG, return_paths=True)
        assert S.shape == (33, 8192)
        S_T = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, CFG, return_paths=False)
        assert S_T.shape == (8192,)

    def test_initial_value(self, key):
        S = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, CFG)
        np.testing.assert_allclose(S[0], 100.0, rtol=1e-6)

    def test_terminal_consistent_with_paths(self, key):
        S = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, CFG, return_paths=True)
        S_T = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, CFG, return_paths=False)
        np.testing.assert_allclose(S[-1], S_T, rtol=1e-5)

    def test_martingale(self, key):
        # E[S_T] = S0 * exp(rT) under the risk-neutral measure.
        cfg = MCConfig(n_paths=2**17, n_steps=16, path_block=4096)
        S_T = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0, cfg, return_paths=False)
        expected = 100.0 * np.exp(0.05)
        stderr = float(jnp.std(S_T)) / np.sqrt(S_T.size)
        assert abs(float(jnp.mean(S_T)) - expected) < 4 * stderr

    def test_antithetic_pairing(self, key):
        # Within each block, path i and path i + block/2 use mirrored normals:
        # log-returns must be exactly opposite.
        S = simulate_gbm(key, 100.0, 0.0, 0.2, 1.0, MCConfig(
            n_paths=2048, n_steps=8, path_block=2048))
        logret = np.log(np.asarray(S[1]) / 100.0)
        drift = (0.0 - 0.5 * 0.2**2) * (1.0 / 8)
        z = logret - drift
        np.testing.assert_allclose(z[:1024], -z[1024:], atol=1e-5)

    def test_chunk_invariance(self, key):
        # Same stream regardless of first_block chunking.
        full = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0,
                            MCConfig(n_paths=4096, n_steps=8, path_block=1024),
                            return_paths=False)
        c1 = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0,
                          MCConfig(n_paths=2048, n_steps=8, path_block=1024),
                          return_paths=False, first_block=0)
        c2 = simulate_gbm(key, 100.0, 0.05, 0.2, 1.0,
                          MCConfig(n_paths=2048, n_steps=8, path_block=1024),
                          return_paths=False, first_block=2)
        np.testing.assert_allclose(full, jnp.concatenate([c1, c2]), rtol=1e-6)

    def test_exact_terminal_moments(self, key):
        S_T = gbm_terminal_exact(key, 100.0, 0.05, 0.2, 1.0, 2**18)
        np.testing.assert_allclose(float(jnp.mean(jnp.log(S_T / 100.0))),
                                   0.05 - 0.5 * 0.04, atol=3e-3)
        np.testing.assert_allclose(float(jnp.std(jnp.log(S_T / 100.0))), 0.2, rtol=2e-2)


class TestHeston:
    def test_shapes(self, key):
        S = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, CFG)
        assert S.shape == (33, 8192)
        S, v = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, CFG, return_variance=True)
        assert v.shape == (33, 8192)

    def test_variance_nonnegative(self, key):
        _, v = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, CFG, return_variance=True)
        assert float(jnp.min(v)) >= 0.0

    def test_martingale(self, key):
        cfg = MCConfig(n_paths=2**17, n_steps=64, path_block=4096)
        S_T = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, cfg, return_paths=False)
        expected = 100.0 * np.exp(0.05)
        stderr = float(jnp.std(S_T)) / np.sqrt(S_T.size)
        # Euler discretization bias allows a slightly wider band.
        assert abs(float(jnp.mean(S_T)) - expected) < max(5 * stderr, 0.15)

    def test_terminal_consistent_with_paths(self, key):
        S = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, CFG, return_paths=True)
        S_T = simulate_heston(key, 100.0, 0.05, 1.0, HESTON, CFG, return_paths=False)
        np.testing.assert_allclose(S[-1], S_T, rtol=1e-5)

    def test_variance_mean_reverts(self, key):
        # Start far above theta; long horizon mean must approach theta.
        params = HestonParams(kappa=5.0, theta=0.04, xi=0.2, rho=0.0, v0=0.5)
        cfg = MCConfig(n_paths=2**14, n_steps=128, path_block=4096)
        _, v = simulate_heston(key, 100.0, 0.05, 2.0, params, cfg, return_variance=True)
        v_end = float(jnp.mean(v[-1]))
        assert 0.02 < v_end < 0.08

    def test_zero_vol_of_vol_reduces_to_gbm_variance(self, key):
        # xi -> 0, v0 = theta: variance stays pinned at v0.
        params = HestonParams(kappa=2.0, theta=0.04, xi=1e-8, rho=0.0, v0=0.04)
        _, v = simulate_heston(key, 100.0, 0.05, 1.0, params, CFG, return_variance=True)
        np.testing.assert_allclose(np.asarray(v), 0.04, rtol=1e-4)

    def test_chunk_invariance(self, key):
        full = simulate_heston(key, 100.0, 0.05, 1.0, HESTON,
                               MCConfig(n_paths=4096, n_steps=8, path_block=1024),
                               return_paths=False)
        c1 = simulate_heston(key, 100.0, 0.05, 1.0, HESTON,
                             MCConfig(n_paths=2048, n_steps=8, path_block=1024),
                             return_paths=False, first_block=0)
        c2 = simulate_heston(key, 100.0, 0.05, 1.0, HESTON,
                             MCConfig(n_paths=2048, n_steps=8, path_block=1024),
                             return_paths=False, first_block=2)
        np.testing.assert_allclose(full, jnp.concatenate([c1, c2]), rtol=1e-6)


class TestLocalVol:
    def test_constant_sigma_fn_matches_gbm(self, key):
        # sigma_fn == const must reproduce the GBM law (same RNG pattern differs
        # by draw indexing, so compare distributions via moments).
        sigma_fn = lambda S, tau: jnp.full_like(S, 0.2)
        cfg = MCConfig(n_paths=2**16, n_steps=16, path_block=4096)
        S_T = simulate_local_vol(key, 100.0, 0.05, 1.0, sigma_fn, cfg, return_paths=False)
        logret = jnp.log(S_T / 100.0)
        np.testing.assert_allclose(float(jnp.mean(logret)), 0.05 - 0.02, atol=4e-3)
        np.testing.assert_allclose(float(jnp.std(logret)), 0.2, rtol=2e-2)

    def test_state_dependent_vol(self, key):
        # Vol that explodes below 90 should fatten the left tail vs constant vol.
        sigma_lo = lambda S, tau: jnp.where(S < 90.0, 0.6, 0.2)
        sigma_const = lambda S, tau: jnp.full_like(S, 0.2)
        cfg = MCConfig(n_paths=2**15, n_steps=32, path_block=4096)
        S_lv = simulate_local_vol(key, 100.0, 0.05, 1.0, sigma_lo, cfg, return_paths=False)
        S_c = simulate_local_vol(key, 100.0, 0.05, 1.0, sigma_const, cfg, return_paths=False)
        q_lv = float(jnp.quantile(S_lv, 0.01))
        q_c = float(jnp.quantile(S_c, 0.01))
        assert q_lv < q_c
