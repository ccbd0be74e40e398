"""Merton jump-diffusion: closed-form series oracle, MC convergence, wiring."""

import jax
import numpy as np
import pytest

from options_model_tpu.core.config import (
    CALL, PUT, MCConfig, MertonParams, OptionSpec)
from options_model_tpu.models.merton import merton_price, simulate_merton
from options_model_tpu.pricers import bs_price

S0, K, T, R = 100.0, 100.0, 0.5, 0.05
MP = MertonParams(sigma=0.2, lam=1.0, mu_j=-0.10, sigma_j=0.15)
MC = MCConfig(n_paths=1 << 16, n_steps=32, path_block=4096)
KEY = jax.random.key(11)


class TestClosedForm:
    def test_lam_zero_reduces_to_bs(self):
        p0 = MertonParams(sigma=0.2, lam=0.0, mu_j=0.0, sigma_j=0.0)
        assert abs(float(merton_price(S0, K, T, R, p0))
                   - float(bs_price(S0, K, T, R, 0.2, 1.0))) < 1e-4

    def test_put_call_parity(self):
        c = float(merton_price(S0, K, T, R, MP, cp=1.0))
        p = float(merton_price(S0, K, T, R, MP, cp=-1.0))
        rhs = S0 - K * np.exp(-R * T)
        assert abs((c - p) - rhs) < 1e-3

    def test_jumps_raise_otm_prices(self):
        # Fat tails: deep-OTM options are worth MORE than BS at the same
        # diffusive vol.
        otm_put_m = float(merton_price(S0, 80.0, T, R, MP, cp=-1.0))
        otm_put_bs = float(bs_price(S0, 80.0, T, R, 0.2, -1.0))
        assert otm_put_m > otm_put_bs

    def test_dividend_yield(self):
        c_q = float(merton_price(S0, K, T, R, MP, cp=1.0, q=0.04))
        c_0 = float(merton_price(S0, K, T, R, MP, cp=1.0))
        assert c_q < c_0

    def test_validate(self):
        with pytest.raises(ValueError):
            MertonParams(sigma=-0.1, lam=1.0, mu_j=0.0,
                         sigma_j=0.1).validate()
        with pytest.raises(ValueError):
            MertonParams(sigma=0.2, lam=-1.0, mu_j=0.0,
                         sigma_j=0.1).validate()


class TestSimulator:
    def test_martingale(self):
        S_T = np.asarray(simulate_merton(KEY, S0, R, T, MP, MC,
                                         return_paths=False))
        assert abs(S_T.mean() / (S0 * np.exp(R * T)) - 1.0) < 5e-3

    def test_terminal_agrees_with_paths(self):
        cfg = MCConfig(n_paths=1 << 13, n_steps=8, path_block=4096)
        S_T = np.asarray(simulate_merton(KEY, S0, R, T, MP, cfg,
                                         return_paths=False))
        S = np.asarray(simulate_merton(KEY, S0, R, T, MP, cfg,
                                       return_paths=True))
        np.testing.assert_allclose(S_T, S[-1], rtol=1e-5)

    def test_european_mc_hits_series(self):
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        sampler = make_terminal_sampler("merton", S0, R, T, merton=MP)
        price, se, _ = price_european_mc(KEY, sampler, spec, T, MC)
        ref = float(merton_price(S0, K, T, R, MP, cp=-1.0))
        assert abs(float(price) - ref) < 4.0 * float(se) + 2e-3

    def test_chunk_invariance(self):
        cfg = MCConfig(n_paths=1 << 13, n_steps=4, path_block=4096)
        one = np.asarray(simulate_merton(KEY, S0, R, T, MP, cfg,
                                         return_paths=False))
        cfg_h = MCConfig(n_paths=1 << 12, n_steps=4, path_block=4096)
        a = np.asarray(simulate_merton(KEY, S0, R, T, MP, cfg_h,
                                       return_paths=False))
        b = np.asarray(simulate_merton(KEY, S0, R, T, MP, cfg_h,
                                       return_paths=False, first_block=1))
        np.testing.assert_array_equal(one, np.concatenate([a, b]))


class TestAmericanMerton:
    def test_cv_american_put_above_european(self):
        from options_model_tpu.core.config import LSMConfig
        from options_model_tpu.pricers import price_american

        spec = OptionSpec(strike=105.0, rate=0.06, cp=PUT, sigma=None)
        price, se = price_american(
            KEY, S0, T, spec, MC, LSMConfig(regressor="poly"),
            model="merton", merton=MP)
        eu = float(merton_price(S0, 105.0, T, 0.06, MP, cp=-1.0))
        # ITM American put under jumps: early-exercise premium is positive
        assert float(price) > eu + 3.0 * float(se)
        # ... and bounded by the trivial upper bound K
        assert float(price) < 105.0

    def test_cv_beats_plain_on_calls(self):
        from options_model_tpu.core.config import LSMConfig
        from options_model_tpu.pricers.american import (
            price_american_lsm, price_american_with_control_variate)

        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=None)
        p_cv, se_cv = price_american_with_control_variate(
            KEY, S0, T, spec, MC, LSMConfig(regressor="poly"),
            model="merton", merton=MP)
        p_pl, se_pl = price_american_lsm(
            KEY, S0, T, spec, MC, LSMConfig(regressor="poly"),
            model="merton", merton=MP)
        tol = 4.0 * float(np.sqrt(float(se_cv)**2 + float(se_pl)**2))
        assert abs(float(p_cv) - float(p_pl)) < max(tol, 5e-3)
        assert float(se_cv) < float(se_pl)

    @pytest.mark.slow
    def test_high_degree_basis_survives_jump_outliers(self):
        """Regression test for the basis clamp (_BASIS_CLAMP,
        pricers/american.build_centered_basis): before it, a degree-5 fit
        under jump dynamics oscillated Runge-style over the gap between the
        ITM diffusion bulk and the multi-sigma jump outliers, silently
        pricing the 6.24 Merton put at 4.86 (-22%). The clamp must keep
        every degree on the oracle."""
        from options_model_tpu.core.config import LSMConfig
        from options_model_tpu.pricers.american import (
            price_american_with_control_variate)
        from options_model_tpu.pricers.cos_bermudan import cos_bermudan_price

        mp = MertonParams(sigma=0.2, lam=1.0, mu_j=-0.10, sigma_j=0.15)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2)
        n_steps = 16
        berm = cos_bermudan_price(S0, 100.0, 0.5, 0.05, "merton", merton=mp,
                                  cp=-1.0, n_dates=n_steps)
        for deg in (3, 5):
            p, se = price_american_with_control_variate(
                jax.random.key(7), S0, 0.5, spec,
                MCConfig(n_paths=1 << 12, n_steps=n_steps, path_block=1024),
                LSMConfig(regressor="poly", poly_degree=deg),
                model="merton", merton=mp)
            assert abs(float(p) / berm - 1.0) < 0.04, (deg, float(p), berm)

    def test_exotics_and_barrier_run_under_merton(self):
        from options_model_tpu.pricers.barrier import price_barrier_mc
        from options_model_tpu.pricers.exotics import price_asian_mc

        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=None)
        cfg = MCConfig(n_paths=1 << 14, n_steps=16, path_block=4096)
        pa, _ = price_asian_mc(KEY, S0, T, spec, cfg, "merton", merton=MP)
        assert 0.0 < float(pa) < float(merton_price(S0, K, T, R, MP))
        pb, _ = price_barrier_mc(KEY, S0, T, spec, 130.0, "up-and-out",
                                 cfg, "merton", merton=MP)
        assert 0.0 < float(pb) < float(merton_price(S0, K, T, R, MP))


class TestCLIMerton:
    def test_european_merton_cli(self):
        from options_model_tpu.apps.price_exotic import parse_args, run
        out = run(parse_args(["european", "--model", "merton",
                              "--paths", "16384", "--steps", "8",
                              "--option-type", "put"]))
        ref = float(merton_price(S0, K, T, R,
                                 MertonParams(0.2, 1.0, -0.1, 0.15),
                                 cp=-1.0))
        assert abs(out["price"] - ref) < 6.0 * out["stderr"] + 5e-3
