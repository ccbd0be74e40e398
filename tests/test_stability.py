"""Numerical stability at extreme parameters (the reference's
test_numerical_stability, options_model_3/test_improvements.py:411-430,
extended across the whole stack): extreme strikes, times, vols and spots must
produce finite numbers, never NaN/Inf."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (
    CALL, PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)


def finite(x):
    return bool(np.all(np.isfinite(np.asarray(x))))


class TestScalerStability:
    def test_extreme_observations(self):
        from options_model_tpu.surface.scaler import SurfaceScaler
        m = np.array([-10.0, 10.0, 0.0])
        tau = np.array([1e-6, 10.0, 0.5])
        sc = SurfaceScaler.fit(m, tau, S0=100.0)
        mn, tn = sc.transform(m, tau)
        assert finite(mn) and finite(tn)

    def test_degenerate_observations(self):
        from options_model_tpu.surface.scaler import SurfaceScaler
        sc = SurfaceScaler.fit(np.zeros(4), np.full(4, 0.25), S0=1e-6)
        mn, tn = sc.transform(np.zeros(4), np.full(4, 0.25))
        assert finite(mn) and finite(tn)


class TestClosedFormStability:
    @pytest.mark.parametrize("K", [1e-4, 1.0, 1e6])
    @pytest.mark.parametrize("T", [1e-6, 10.0])
    @pytest.mark.parametrize("sig", [1e-3, 0.999, 3.0])
    def test_bs_price_finite(self, K, T, sig):
        from options_model_tpu.pricers.blackscholes import bs_price
        for cp in (CALL, PUT):
            p = float(bs_price(100.0, K, T, 0.05, sig, cp))
            assert np.isfinite(p) and p >= -1e-5, (K, T, sig, cp, p)

    def test_implied_vol_extremes(self):
        from options_model_tpu.pricers.blackscholes import bs_price, implied_vol
        # near-intrinsic and near-zero prices stay inside the bracket
        deep_itm = float(bs_price(100.0, 10.0, 0.5, 0.05, 0.2, CALL))
        iv1 = float(implied_vol(deep_itm, 100.0, 10.0, 0.5, 0.05, CALL))
        iv2 = float(implied_vol(1e-8, 100.0, 300.0, 0.5, 0.05, CALL))
        assert np.isfinite(iv1) and np.isfinite(iv2)

    def test_greeks_near_expiry(self):
        from options_model_tpu.pricers.blackscholes import bs_greeks
        g = bs_greeks(100.0, 100.0, 1e-5, 0.05, 0.2, CALL)
        assert all(np.isfinite(float(v)) for v in g.values())


class TestCOSStability:
    def test_extreme_maturities_and_strikes(self):
        from options_model_tpu.calibration.charfn import heston_cos_price
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        K = jnp.array([20.0, 100.0, 400.0])
        for T in (0.01, 5.0):
            p = np.asarray(heston_cos_price(100.0, K, T, 0.05, hp, 1.0))
            assert finite(p) and (p >= 0).all(), (T, p)

    def test_near_feller_violation(self):
        from options_model_tpu.calibration.charfn import heston_cos_price
        hp = HestonParams(kappa=0.5, theta=0.02, xi=1.5, rho=-0.9, v0=0.02)
        p = float(heston_cos_price(100.0, 100.0, 1.0, 0.05, hp, 1.0))
        assert np.isfinite(p) and p > 0


class TestPricerStability:
    def test_lsm_deep_itm_and_otm(self, key):
        from options_model_tpu.pricers import price_american
        mc = MCConfig(n_paths=8192, n_steps=10, path_block=2048)
        for K in (20.0, 100.0, 500.0):
            spec = OptionSpec(strike=K, rate=0.05, cp=PUT, sigma=0.2)
            p, se = price_american(key, 100.0, 0.5, spec, mc,
                                   LSMConfig(use_control_variate=False),
                                   engine="xla")
            assert np.isfinite(float(p)) and np.isfinite(float(se)), K
            assert float(p) >= -1e-5

    def test_lsm_tiny_and_long_maturity(self, key):
        from options_model_tpu.pricers import price_american
        mc = MCConfig(n_paths=8192, n_steps=10, path_block=2048)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2)
        for T in (1e-4, 10.0):
            p, _ = price_american(key, 100.0, T, spec, mc,
                                  LSMConfig(use_control_variate=False),
                                  engine="xla")
            assert np.isfinite(float(p)), T

    def test_heston_extreme_vol_of_vol(self, key):
        from options_model_tpu.pricers import price_american
        hp = HestonParams(kappa=1.0, theta=0.09, xi=2.5, rho=-0.9,
                          v0=0.09)  # strong Feller violation
        mc = MCConfig(n_paths=8192, n_steps=25, path_block=2048)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        for scheme in ("euler", "qe"):
            p, _ = price_american(key, 100.0, 0.5, spec, mc,
                                  LSMConfig(use_control_variate=False),
                                  model="heston", heston=hp, engine="xla",
                                  # scheme is threaded through simulate_paths
                                  )
            assert np.isfinite(float(p)) and float(p) > 0, scheme

    def test_high_vol_gbm(self, key):
        from options_model_tpu.pricers import price_american
        mc = MCConfig(n_paths=8192, n_steps=25, path_block=2048)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=CALL, sigma=2.0)
        p, _ = price_american(key, 100.0, 1.0, spec, mc,
                              LSMConfig(use_control_variate=False),
                              engine="xla")
        assert np.isfinite(float(p)) and float(p) > 0


class TestSurfaceNetStability:
    @pytest.mark.slow
    def test_training_on_extreme_ivs_stays_finite(self):
        from options_model_tpu.core.config import SurfaceTrainConfig
        from options_model_tpu.surface.train import train_iv_surface
        rng = np.random.default_rng(0)
        K = rng.uniform(20.0, 400.0, 60)
        T = rng.uniform(1e-3, 5.0, 60)
        iv = rng.uniform(0.011, 1.9, 60)  # reference sanity-range extremes
        res = train_iv_surface(K, T, iv, 100.0, SurfaceTrainConfig(
            epochs=20, hidden_dim=16, num_hidden_layers=1, dropout=0.0,
            patience=20, use_vega_weighting=True))
        assert np.isfinite(res.best_val_loss)
        assert all(np.isfinite(v) for v in res.train_losses)
