"""Heston characteristic function, COS pricing, and calibration
(BASELINE.json configs[3])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import CalibrationConfig, HestonParams, MCConfig
from options_model_tpu.calibration import (
    MarketSurface,
    calibrate_heston_to_data,
    create_synthetic_heston_surface,
    detect_regime,
    heston_charfn,
    heston_cos_price,
)
from options_model_tpu.calibration.calibrator import _objective_core
from options_model_tpu.models.heston import simulate_heston
from options_model_tpu.pricers.blackscholes import bs_price, implied_vol

TRUE = HestonParams(kappa=2.5, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
S0, R = 100.0, 0.05


class TestCharFn:
    def test_at_zero_frequency(self):
        # phi(0) = 1 exactly.
        phi = heston_charfn(jnp.array([0.0]), 1.0, R, TRUE)
        np.testing.assert_allclose(np.asarray(phi), 1.0 + 0.0j, atol=1e-5)

    def test_conjugate_symmetry(self):
        # phi(-u) = conj(phi(u)) for real u.
        u = jnp.array([0.5, 1.0, 5.0, 20.0])
        a = np.asarray(heston_charfn(u, 1.0, R, TRUE))
        b = np.asarray(heston_charfn(-u, 1.0, R, TRUE))
        np.testing.assert_allclose(b, np.conj(a), rtol=1e-4)

    def test_modulus_bounded(self):
        u = jnp.linspace(0.1, 100.0, 64)
        phi = np.asarray(heston_charfn(u, 2.0, R, TRUE))
        assert np.all(np.abs(phi) <= 1.0 + 1e-5)

    def test_long_maturity_stable(self):
        # The little-trap branch must not blow up at long T.
        u = jnp.linspace(0.1, 50.0, 32)
        phi = np.asarray(heston_charfn(u, 10.0, R, TRUE))
        assert np.all(np.isfinite(phi.real)) and np.all(np.isfinite(phi.imag))


class TestCOSPricer:
    def test_bs_limit(self):
        # xi -> 0 with v0 = theta reduces Heston to BS at sigma = sqrt(theta).
        p = HestonParams(kappa=2.0, theta=0.04, xi=0.02, rho=0.0, v0=0.04)
        cos = float(heston_cos_price(S0, 100.0, 1.0, R, p, 1.0))
        bs = float(bs_price(S0, 100.0, 1.0, R, 0.2, 1.0))
        np.testing.assert_allclose(cos, bs, rtol=2e-3)

    def test_matches_monte_carlo(self, key):
        cfg = MCConfig(n_paths=2**19, n_steps=200, path_block=4096)
        S_T = simulate_heston(key, S0, R, 0.5, TRUE, cfg, return_paths=False)
        disc = np.exp(-R * 0.5)
        for K in [90.0, 100.0, 110.0]:
            mc_pay = jnp.maximum(S_T - K, 0.0) * disc
            mc = float(jnp.mean(mc_pay))
            se = float(jnp.std(mc_pay)) / np.sqrt(S_T.size)
            cos = float(heston_cos_price(S0, K, 0.5, R, TRUE, 1.0))
            assert abs(cos - mc) < max(4 * se, 0.02), (
                f"K={K}: COS {cos:.4f} vs MC {mc:.4f} +- {se:.4f}")

    def test_put_call_parity(self):
        Ks = jnp.array([85.0, 100.0, 115.0])
        call = heston_cos_price(S0, Ks, 0.5, R, TRUE, 1.0)
        put = heston_cos_price(S0, Ks, 0.5, R, TRUE, -1.0)
        np.testing.assert_allclose(np.asarray(call - put),
                                   S0 - np.asarray(Ks) * np.exp(-R * 0.5),
                                   atol=2e-3)

    def test_surface_vectorization(self):
        Ks = jnp.linspace(80.0, 120.0, 8)
        Ts = jnp.linspace(0.1, 1.0, 5)
        Km, Tm = jnp.meshgrid(Ks, Ts)
        prices = heston_cos_price(S0, Km, Tm, R, TRUE, 1.0)
        assert prices.shape == (5, 8)
        # monotone decreasing in strike at fixed T
        assert np.all(np.diff(np.asarray(prices), axis=1) < 0)

    def test_differentiable_in_params(self):
        def price_of(x):
            p = HestonParams(kappa=x[0], theta=x[1], xi=x[2], rho=x[3], v0=x[4])
            return heston_cos_price(S0, 100.0, 0.5, R, p, 1.0)

        g = np.asarray(jax.grad(lambda x: price_of(x).sum())(
            jnp.array([2.5, 0.04, 0.3, -0.7, 0.04], jnp.float32)))
        assert np.all(np.isfinite(g))
        assert g[4] > 0  # price increases in v0


class TestRegime:
    def test_thresholds(self):
        assert detect_regime(0.10) == "low_vol"
        assert detect_regime(0.25) == "normal_vol"
        assert detect_regime(0.50) == "high_vol"


class TestMarketSurface:
    def test_filters_invalid_rows(self):
        s = MarketSurface(strikes=[100.0, -5.0, 100.0, 100.0],
                          expiries=[0.5, 0.5, 0.0001, 0.5],
                          ivs=[0.2, 0.2, 0.2, 5.0], S0=100.0)
        assert len(s) == 1

    def test_rejects_all_invalid(self):
        with pytest.raises(ValueError):
            MarketSurface(strikes=[-1.0], expiries=[0.5], ivs=[0.2], S0=100.0)


class TestCalibration:
    def test_objective_zero_at_truth(self):
        K, T, iv = create_synthetic_heston_surface(TRUE)
        v = _objective_core(jnp.array([2.5, 0.04, 0.3, -0.7, 0.04], jnp.float32),
                            jnp.asarray(K, jnp.float32), jnp.asarray(T, jnp.float32),
                            jnp.asarray(iv, jnp.float32), S0, R)
        assert float(v) < 1e-3

    def test_objective_increases_away_from_truth(self):
        K, T, iv = create_synthetic_heston_surface(TRUE)
        args = (jnp.asarray(K, jnp.float32), jnp.asarray(T, jnp.float32),
                jnp.asarray(iv, jnp.float32), S0, R)
        at_truth = float(_objective_core(
            jnp.array([2.5, 0.04, 0.3, -0.7, 0.04], jnp.float32), *args))
        away = float(_objective_core(
            jnp.array([2.5, 0.09, 0.3, -0.7, 0.09], jnp.float32), *args))
        assert away > at_truth + 1e-3

    def test_round_trip_recovers_parameters(self):
        # Full round trip with the gradient-driven stage only (fast path).
        K, T, iv = create_synthetic_heston_surface(TRUE)
        cfg = CalibrationConfig(optimization_methods=("L-BFGS-B",), verbose=False)
        params, summary = calibrate_heston_to_data(K, T, iv, S0=S0, config=cfg)
        assert summary["error"] < 0.01  # < 1 vol point weighted RMSE
        assert abs(params.theta - TRUE.theta) < 0.02
        assert abs(params.v0 - TRUE.v0) < 0.02
        assert abs(params.rho - TRUE.rho) < 0.25

    def test_feller_penalty_active(self):
        K, T, iv = create_synthetic_heston_surface(TRUE)
        args = (jnp.asarray(K, jnp.float32), jnp.asarray(T, jnp.float32),
                jnp.asarray(iv, jnp.float32), S0, R)
        violating = float(_objective_core(
            jnp.array([0.6, 0.02, 2.0, -0.7, 0.04], jnp.float32), *args))
        assert violating > 100.0  # dominated by the Feller penalty


class TestSyntheticSurface:
    def test_smile_shape(self):
        K, T, iv = create_synthetic_heston_surface(TRUE)
        # negative rho -> downward-sloping skew in strike at fixed expiry
        row = iv[:15]  # first expiry block
        assert row[0] > row[-1]

    def test_noise_reproducible(self):
        _, _, a = create_synthetic_heston_surface(TRUE, noise_std=0.005, seed=1)
        _, _, b = create_synthetic_heston_surface(TRUE, noise_std=0.005, seed=1)
        np.testing.assert_array_equal(a, b)


class TestCosLKnob:
    def test_cos_l_has_effect(self):
        """CalibrationConfig.cos_L must actually reach the COS pricer
        (VERDICT r1 weak #4: dead knob). A far-too-narrow truncation width
        visibly degrades the objective at the true parameters."""
        K, T, iv = create_synthetic_heston_surface(TRUE)
        args = (jnp.asarray(K, jnp.float32), jnp.asarray(T, jnp.float32),
                jnp.asarray(iv, jnp.float32), S0, R)
        x_true = jnp.array([2.5, 0.04, 0.3, -0.7, 0.04], jnp.float32)
        wide = float(_objective_core(x_true, *args, cos_L=12.0))
        narrow = float(_objective_core(x_true, *args, cos_L=1.0))
        assert wide < 1e-3
        assert narrow > wide * 5.0

    def test_cos_l_flows_from_config(self):
        """The calibrator's jitted objective closes over cfg.cos_L."""
        from options_model_tpu.calibration.calibrator import (
            HestonCalibrator, MarketSurface)
        K, T, iv = create_synthetic_heston_surface(TRUE)
        surface = MarketSurface(strikes=K, expiries=T, ivs=iv, S0=S0, rate=R)
        good = HestonCalibrator(CalibrationConfig(cos_L=12.0))
        bad = HestonCalibrator(CalibrationConfig(cos_L=1.0))
        x = np.array([2.5, 0.04, 0.3, -0.7, 0.04], np.float64)
        f_good = good._make_objective(surface)[0](x)
        f_bad = bad._make_objective(surface)[0](x)
        assert f_bad > f_good * 5.0
