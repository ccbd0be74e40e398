"""Pathwise AD Greeks through the MC pricers vs closed forms and finite
differences."""

import jax
import numpy as np
import pytest

from options_model_tpu.core.config import CALL, PUT, LSMConfig, MCConfig, OptionSpec
from options_model_tpu.pricers.blackscholes import bs_greeks
from options_model_tpu.pricers.greeks import mc_greeks

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
MC = MCConfig(n_paths=2**16, n_steps=25, path_block=4096)


class TestEuropeanADGreeks:
    def test_matches_closed_form(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG)
        g = mc_greeks(key, S0, T, spec, MC, style="european")
        cf = bs_greeks(S0, K, T, R, SIG, CALL)
        assert abs(float(g["Delta"]) - float(cf["Delta"])) < 0.01
        assert abs(float(g["Vega"]) - float(cf["Vega"])) < 0.01
        assert abs(float(g["Rho"]) - float(cf["Rho"])) < 0.01
        assert abs(float(g["Theta"]) - float(cf["Theta"])) < 0.003

    def test_put_delta_negative(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
        g = mc_greeks(key, S0, T, spec, MC, style="european")
        assert -1.0 < float(g["Delta"]) < 0.0

    def test_gamma_matches_closed_form(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG)
        g = mc_greeks(key, S0, T, spec, MC, style="european")
        cf = bs_greeks(S0, K, T, R, SIG, CALL)
        assert abs(float(g["Gamma"]) - float(cf["Gamma"])) < 0.005


class TestAmericanADGreeks:
    def test_delta_vs_finite_difference(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
        g = mc_greeks(key, S0, T, spec, MC, style="american")
        # central bump with common random numbers
        h = 0.5
        gp = mc_greeks(key, S0 + h, T, spec, MC, style="american")
        gm = mc_greeks(key, S0 - h, T, spec, MC, style="american")
        fd_delta = (float(gp["Price"]) - float(gm["Price"])) / (2 * h)
        assert abs(float(g["Delta"]) - fd_delta) < 0.02, (float(g["Delta"]), fd_delta)

    def test_sane_signs_and_ranges(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
        g = mc_greeks(key, S0, T, spec, MC, style="american")
        assert -1.0 < float(g["Delta"]) < 0.0   # put delta
        assert float(g["Vega"]) > 0.0           # long vol
        assert float(g["Gamma"]) > 0.0
        assert float(g["Theta"]) < 0.0          # time decay
        assert float(g["Rho"]) < 0.0            # put rho

    def test_american_delta_more_negative_than_european(self, key):
        # Early exercise makes the ITM put behave closer to -1 delta.
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
        am = mc_greeks(key, 90.0, T, spec, MC, style="american")
        eu = mc_greeks(key, 90.0, T, spec, MC, style="european")
        assert float(am["Delta"]) <= float(eu["Delta"]) + 0.02

    def test_requires_sigma(self, key):
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        with pytest.raises(ValueError):
            mc_greeks(key, S0, T, spec, MC)


class TestHestonGreeks:
    HP = None  # set below

    @pytest.mark.slow
    def test_cos_greeks_exact_vs_fd(self):
        from options_model_tpu.core.config import HestonParams
        from options_model_tpu.pricers.greeks import cos_greeks_heston
        from options_model_tpu.calibration import heston_cos_price

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
        g = cos_greeks_heston(S0, K, T, R, hp, 1.0)
        # finite-difference delta on the closed-form pricer
        h = 0.01
        fd = (float(heston_cos_price(S0 + h, K, T, R, hp, 1.0))
              - float(heston_cos_price(S0 - h, K, T, R, hp, 1.0))) / (2 * h)
        assert abs(float(g["Delta"]) - fd) < 1e-3
        assert float(g["dV0"]) > 0 and float(g["Gamma"]) > 0

    @pytest.mark.slow
    def test_cos_bs_limit_matches_bs_greeks(self):
        from options_model_tpu.core.config import HestonParams
        from options_model_tpu.pricers.greeks import cos_greeks_heston

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.02, rho=0.0, v0=0.04)
        g = cos_greeks_heston(S0, K, T, R, hp, 1.0)
        cf = bs_greeks(S0, K, T, R, SIG, 1.0)
        assert abs(float(g["Delta"]) - float(cf["Delta"])) < 0.01
        assert abs(float(g["Gamma"]) - float(cf["Gamma"])) < 0.005

    @pytest.mark.slow
    def test_mc_heston_american_sensitivities(self, key):
        from options_model_tpu.core.config import HestonParams
        from options_model_tpu.pricers.greeks import mc_greeks_heston

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        g = mc_greeks_heston(key, S0, T, spec,
                             MCConfig(n_paths=2**15, n_steps=32,
                                      path_block=4096), hp)
        assert -1.0 < float(g["Delta"]) < 0.0
        assert float(g["dV0"]) > 0.0      # more variance -> dearer put
        assert float(g["dTheta"]) > 0.0
        assert float(g["Theta"]) < 0.0
        assert np.isfinite(float(g["dXi"])) and np.isfinite(float(g["dRhoCorr"]))


class TestJumpFamilyGreeks:
    """Exact AD Greeks through the jump-model closed forms — parameter
    sensitivities (incl. the jump triple) that pathwise MC AD cannot even
    define (the Poisson count has zero pathwise derivative in lam)."""

    def test_merton_greeks_lam_zero_is_black_scholes(self):
        from options_model_tpu.core.config import MertonParams
        from options_model_tpu.pricers.greeks import merton_greeks
        mp = MertonParams(sigma=0.2, lam=0.0, mu_j=-0.1, sigma_j=0.15)
        g = merton_greeks(100.0, 100.0, 1.0, 0.05, mp, cp=1.0)
        bs = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0)
        np.testing.assert_allclose(float(g["Delta"]), float(bs["Delta"]),
                                   atol=2e-3)
        np.testing.assert_allclose(float(g["Gamma"]), float(bs["Gamma"]),
                                   atol=2e-3)
        np.testing.assert_allclose(float(g["Vega"]), float(bs["Vega"]),
                                   rtol=0.02)

    def test_merton_dlam_matches_finite_difference(self):
        from options_model_tpu.core.config import MertonParams
        from options_model_tpu.models.merton import merton_price
        from options_model_tpu.pricers.greeks import merton_greeks
        mp = MertonParams(sigma=0.2, lam=0.5, mu_j=-0.1, sigma_j=0.15)
        g = merton_greeks(100.0, 100.0, 1.0, 0.05, mp, cp=1.0)
        h = 1e-2
        up = MertonParams(sigma=0.2, lam=0.5 + h, mu_j=-0.1, sigma_j=0.15)
        dn = MertonParams(sigma=0.2, lam=0.5 - h, mu_j=-0.1, sigma_j=0.15)
        fd = (float(merton_price(100.0, 100.0, 1.0, 0.05, up, cp=1.0))
              - float(merton_price(100.0, 100.0, 1.0, 0.05, dn, cp=1.0))) / (2 * h)
        np.testing.assert_allclose(float(g["dLam"]), fd, rtol=0.02, atol=5e-3)

    @pytest.mark.slow
    def test_bates_greeks_lam_zero_matches_heston(self):
        from options_model_tpu.core.config import BatesParams, HestonParams
        from options_model_tpu.pricers.greeks import (cos_greeks_bates,
                                                      cos_greeks_heston)
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
        bp = BatesParams(heston=hp, lam=0.0, mu_j=-0.1, sigma_j=0.15)
        gb = cos_greeks_bates(100.0, 100.0, 1.0, 0.05, bp, cp=1.0)
        gh = cos_greeks_heston(100.0, 100.0, 1.0, 0.05, hp, cp=1.0)
        for k in ("Price", "Delta", "Gamma", "dKappa", "dXi", "dV0"):
            np.testing.assert_allclose(float(gb[k]), float(gh[k]),
                                       rtol=0.02, atol=5e-3, err_msg=k)

    @pytest.mark.slow
    def test_bates_dlam_matches_finite_difference(self):
        from options_model_tpu.core.config import BatesParams, HestonParams
        from options_model_tpu.calibration.charfn import bates_cos_price
        from options_model_tpu.pricers.greeks import cos_greeks_bates
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
        bp = BatesParams(heston=hp, lam=0.4, mu_j=-0.12, sigma_j=0.18)
        g = cos_greeks_bates(100.0, 100.0, 1.0, 0.05, bp, cp=1.0)
        h = 2e-2
        def price(lam):
            b = BatesParams(heston=hp, lam=lam, mu_j=-0.12, sigma_j=0.18)
            return float(bates_cos_price(100.0, 100.0, 1.0, 0.05, b, cp=1.0))
        fd = (price(0.4 + h) - price(0.4 - h)) / (2 * h)
        np.testing.assert_allclose(float(g["dLam"]), fd, rtol=0.05, atol=1e-2)
        # more jumps = more variance = more ATM optionality
        assert float(g["dLam"]) > 0
