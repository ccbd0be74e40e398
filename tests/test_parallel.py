"""Distributed pricing on the virtual 8-device CPU mesh: task grids, sharded
paths with exact psum equivalence, device-count invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (
    PUT,
    HestonParams,
    LSMConfig,
    MCConfig,
    OptionSpec,
)
from options_model_tpu.parallel import (
    make_mesh,
    price_american_grid,
    price_american_sharded_paths,
    price_european_sharded,
)
from options_model_tpu.pricers import bs_price, crr_american, price_american_lsm
from options_model_tpu.pricers.american import lsm_poly_backward, simulate_paths
from options_model_tpu.pricers.european import make_terminal_sampler, price_european_mc

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
PUT_SPEC = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)


class TestMesh:
    def test_make_mesh_default(self, devices8):
        mesh = make_mesh()
        assert mesh.devices.size >= 8
        assert mesh.axis_names == ("tasks",)

    def test_make_mesh_2d(self, devices8):
        mesh = make_mesh(("grid", "paths"), shape=(2, 4), devices=devices8)
        assert mesh.devices.shape == (2, 4)

    def test_bad_shape_raises(self, devices8):
        with pytest.raises(ValueError):
            make_mesh(("a",), shape=(3,), devices=devices8)


class TestEuropeanSharded:
    def test_matches_unsharded(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 2048, n_steps=16, path_block=1024)
        mean_s, se_s, n_s = price_european_sharded(
            key, S0, T, PUT_SPEC, cfg, mesh)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG, engine="xla")
        mean_u, se_u, n_u = price_european_mc(key, sampler, PUT_SPEC, T, cfg)
        # identical global block ids -> identical streams -> same price
        np.testing.assert_allclose(float(mean_s), float(mean_u), rtol=1e-5)
        assert int(n_s) == int(n_u)

    def test_heston_sharded_close_to_cos(self, key, devices8):
        from options_model_tpu.calibration import heston_cos_price

        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 8192, n_steps=64, path_block=1024)
        spec = OptionSpec(strike=K, rate=R, cp=1.0, sigma=None)
        mean, se, _ = price_european_sharded(key, S0, T, spec, cfg, mesh,
                                             model="heston", heston=HESTON)
        cos = float(heston_cos_price(S0, K, T, R, HESTON, 1.0))
        assert abs(float(mean) - cos) < max(4 * float(se), 0.05)


class TestAmericanShardedPaths:
    def test_matches_unsharded_exactly(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 2048, n_steps=20, path_block=1024)
        p_s, se_s = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg, mesh)

        S_paths = simulate_paths(key, S0, T, cfg, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        p_u, se_u = lsm_poly_backward(S_paths, PUT_SPEC, T)
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        np.testing.assert_allclose(float(se_s), float(se_u), rtol=1e-3)

    def test_accuracy_vs_crr(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 8192, n_steps=50, path_block=1024)
        price, _ = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg, mesh)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(float(price) - oracle) / oracle < 0.01


class TestAmericanGrid:
    def test_grid_prices_sane(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        S0s = jnp.array([90.0, 95.0, 100.0, 105.0, 110.0] * 2)
        Ks = jnp.full((10,), K)
        Ts = jnp.full((10,), T)
        cfg = MCConfig(n_paths=4096, n_steps=20, path_block=1024)
        prices = price_american_grid(key, S0s, Ks, Ts, R, cfg, mesh,
                                     cp=-1.0, sigma=SIG, engine="xla")
        assert prices.shape == (10,)
        p = np.asarray(prices)
        # put value decreasing in S0
        assert p[0] > p[2] > p[4]
        # duplicate tasks at different global indices use different streams but
        # must agree within MC noise
        np.testing.assert_allclose(p[:5], p[5:], atol=0.5)

    def test_nonmultiple_task_count(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 11  # not a multiple of 8
        S0s = jnp.linspace(90.0, 110.0, n)
        cfg = MCConfig(n_paths=2048, n_steps=10, path_block=1024)
        prices = price_american_grid(key, S0s, jnp.full((n,), K),
                                     jnp.full((n,), T), R, cfg, mesh,
                                     cp=-1.0, sigma=SIG, engine="xla")
        assert prices.shape == (n,)
        assert np.all(np.isfinite(np.asarray(prices)))

    def test_heston_grid(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 8
        S0s = jnp.linspace(95.0, 105.0, n)
        cfg = MCConfig(n_paths=4096, n_steps=20, path_block=1024)
        prices = price_american_grid(key, S0s, jnp.full((n,), K),
                                     jnp.full((n,), T), R, cfg, mesh,
                                     cp=-1.0, sigma=None, heston=HESTON,
                                     model="heston", engine="xla")
        assert np.all(np.isfinite(np.asarray(prices)))
        assert np.all(np.diff(np.asarray(prices)) < 0.5)  # roughly decreasing
