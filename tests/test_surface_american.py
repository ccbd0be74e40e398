"""Shared-path American/European surface pricers (BASELINE configs[4])."""

import jax
import jax.numpy as jnp
import numpy as np

from options_model_tpu.core.config import HestonParams, MCConfig
from options_model_tpu.calibration import heston_cos_price
from options_model_tpu.pricers import bs_price, crr_american
from options_model_tpu.pricers.surface_american import (
    price_american_surface,
    price_european_surface_mc,
)

BS_LIMIT = HestonParams(kappa=2.0, theta=0.04, xi=1e-3, rho=0.0, v0=0.04)
HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
MC = MCConfig(n_paths=16384, n_steps=25, path_block=4096)


class TestAmericanSurface:
    def test_grid_shape_and_monotonicity(self, key):
        Ks = jnp.linspace(80.0, 120.0, 8)
        Ts = jnp.array([0.25, 0.5, 1.0])
        P = np.asarray(price_american_surface(key, 100.0, Ks, Ts, 0.05, MC,
                                              cp=-1.0, heston=HESTON,
                                              engine="xla"))
        assert P.shape == (3, 8)
        # put value increases in strike at fixed maturity
        assert np.all(np.diff(P, axis=1) > -1e-3)
        # and (weakly) increases in maturity ATM-ish
        assert P[2, 4] >= P[0, 4] - 0.05

    def test_bs_limit_matches_crr(self, key):
        Ks = jnp.array([95.0, 100.0, 105.0])
        Ts = jnp.array([0.5])
        mc = MCConfig(n_paths=65536, n_steps=50, path_block=4096)
        P = np.asarray(price_american_surface(key, 100.0, Ks, Ts, 0.05, mc,
                                              cp=-1.0, heston=BS_LIMIT,
                                              engine="xla"))
        for i, K in enumerate([95.0, 100.0, 105.0]):
            oracle = crr_american(100.0, K, 0.5, 0.05, 0.2, cp=-1.0, n_steps=2048)
            assert abs(P[0, i] - oracle) / oracle < 0.015, (K, P[0, i], oracle)

    def test_independent_maturity_streams(self, key):
        # Same maturity listed twice gets different fold_in streams but must
        # agree within MC noise.
        Ks = jnp.array([100.0])
        Ts = jnp.array([0.5, 0.5])
        P = np.asarray(price_american_surface(key, 100.0, Ks, Ts, 0.05, MC,
                                              cp=-1.0, heston=HESTON,
                                              engine="xla"))
        assert abs(P[0, 0] - P[1, 0]) < 0.3


class TestEuropeanSurfaceMC:
    def test_matches_cos(self, key):
        Ks = jnp.linspace(90.0, 110.0, 5)
        Ts = jnp.array([0.25, 0.5])
        mc = MCConfig(n_paths=2**16, n_steps=64, path_block=4096)
        P = np.asarray(price_european_surface_mc(key, 100.0, Ks, Ts, 0.05, mc,
                                                 cp=1.0, heston=HESTON,
                                                 engine="xla"))
        cos = np.asarray(heston_cos_price(100.0, Ks[None, :], Ts[:, None],
                                          0.05, HESTON, 1.0))
        np.testing.assert_allclose(P, cos, atol=0.25)

    def test_gbm_matches_bs(self, key):
        Ks = jnp.array([95.0, 105.0])
        Ts = jnp.array([0.5])
        mc = MCConfig(n_paths=2**16, n_steps=16, path_block=4096)
        P = np.asarray(price_european_surface_mc(key, 100.0, Ks, Ts, 0.05, mc,
                                                 cp=1.0, model="gbm", sigma=0.2,
                                                 engine="xla"))
        bs = np.asarray(bs_price(100.0, Ks, 0.5, 0.05, 0.2, 1.0))
        np.testing.assert_allclose(P[0], bs, atol=0.15)
