"""Continuous dividend yield q across the stack (VERDICT r1 #10).

Neither the reference nor round 1 modeled dividends. Contract: the
risk-neutral growth is (r - q) in every simulator/closed form; discounting
stays at r. Verified via put-call parity, closed-form/AD/CRR/MC/COS
cross-checks, and the early-exercise premium a dividend induces on calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (
    CALL, PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)
from options_model_tpu.pricers.blackscholes import (
    bs_greeks, bs_greeks_closed_form, bs_price, implied_vol)
from options_model_tpu.pricers.binomial import crr_american, crr_price

S0, K, T, R, SIG, Q = 100.0, 100.0, 1.0, 0.05, 0.25, 0.03


class TestBlackScholesMerton:
    def test_put_call_parity_with_q(self):
        c = float(bs_price(S0, K, T, R, SIG, CALL, q=Q))
        p = float(bs_price(S0, K, T, R, SIG, PUT, q=Q))
        parity = S0 * np.exp(-Q * T) - K * np.exp(-R * T)
        assert abs((c - p) - parity) < 5e-5  # f32 closed form

    def test_q_zero_matches_plain_bs(self):
        np.testing.assert_allclose(
            float(bs_price(S0, K, T, R, SIG, CALL, q=0.0)),
            float(bs_price(S0, K, T, R, SIG, CALL)), rtol=1e-7)

    def test_q_reduces_call_raises_put(self):
        c0 = float(bs_price(S0, K, T, R, SIG, CALL))
        cq = float(bs_price(S0, K, T, R, SIG, CALL, q=Q))
        p0 = float(bs_price(S0, K, T, R, SIG, PUT))
        pq = float(bs_price(S0, K, T, R, SIG, PUT, q=Q))
        assert cq < c0 and pq > p0

    def test_ad_greeks_match_closed_form_with_q(self):
        ad = bs_greeks(S0, K, T, R, SIG, CALL, q=Q)
        cf = bs_greeks_closed_form(S0, K, T, R, SIG, CALL, q=Q)
        for k in ("Delta", "Gamma", "Vega", "Theta", "Rho"):
            np.testing.assert_allclose(float(ad[k]), float(cf[k]), rtol=2e-4,
                                       atol=1e-6, err_msg=k)

    def test_delta_carries_discount(self):
        ad = bs_greeks(S0, K, T, R, SIG, CALL, q=Q)
        assert float(ad["Delta"]) < np.exp(-Q * T)  # <= e^{-qT} N(d1) bound

    def test_implied_vol_round_trip_with_q(self):
        price = bs_price(S0, K, T, R, SIG, PUT, q=Q)
        iv = float(implied_vol(price, S0, K, T, R, PUT, q=Q))
        assert abs(iv - SIG) < 1e-4


class TestCRRWithQ:
    def test_european_tree_converges_to_bsm(self):
        for use_native in (True, False):
            tree = crr_price(S0, K, T, R, SIG, CALL, n_steps=2048,
                             american=False, use_native=use_native, q=Q)
            bsm = float(bs_price(S0, K, T, R, SIG, CALL, q=Q))
            assert abs(tree - bsm) < 2e-3, f"native={use_native}"

    def test_native_matches_numpy(self):
        a = crr_price(S0, K, T, R, SIG, PUT, n_steps=512, q=Q,
                      use_native=True)
        b = crr_price(S0, K, T, R, SIG, PUT, n_steps=512, q=Q,
                      use_native=False)
        np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_dividend_makes_american_call_early_exercise(self):
        # Without dividends an American call = European call; with q > r the
        # early-exercise premium is strictly positive.
        am = crr_american(S0, K, T, R, SIG, CALL, n_steps=1024, q=0.08)
        eu = crr_price(S0, K, T, R, SIG, CALL, n_steps=1024, american=False,
                       q=0.08)
        assert am > eu + 1e-3
        am0 = crr_american(S0, K, T, R, SIG, CALL, n_steps=1024)
        eu0 = crr_price(S0, K, T, R, SIG, CALL, n_steps=1024, american=False)
        assert abs(am0 - eu0) < 1e-6


class TestMonteCarloWithQ:
    def test_european_mc_matches_bsm(self, key):
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG, div_yield=Q)
        mc = MCConfig(n_paths=262_144, n_steps=1, path_block=4096)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG,
                                        engine="xla", div_yield=Q)
        price, se, _ = price_european_mc(key, sampler, spec, T, mc)
        bsm = float(bs_price(S0, K, T, R, SIG, CALL, q=Q))
        assert abs(float(price) - bsm) < 4.0 * float(se)

    def test_american_put_lsm_matches_crr(self, key):
        from options_model_tpu.pricers.american import price_american
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG, div_yield=Q)
        mc = MCConfig(n_paths=131_072, n_steps=50, path_block=4096)
        price, _ = price_american(key, S0, T, spec, mc,
                                  LSMConfig(regressor="poly"), engine="xla")
        oracle = crr_american(S0, K, T, R, SIG, PUT, n_steps=2048, q=Q)
        assert abs(float(price) / oracle - 1.0) < 0.01

    def test_american_call_with_dividend_beats_european(self, key):
        from options_model_tpu.pricers.american import price_american
        q = 0.08
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG, div_yield=q)
        mc = MCConfig(n_paths=131_072, n_steps=50, path_block=4096)
        price, _ = price_american(key, S0, T, spec, mc,
                                  LSMConfig(regressor="poly",
                                            use_control_variate=False),
                                  engine="xla")
        oracle = crr_american(S0, K, T, R, SIG, CALL, n_steps=2048, q=q)
        eu = float(bs_price(S0, K, T, R, SIG, CALL, q=q))
        assert float(price) > eu  # early-exercise premium realized
        assert abs(float(price) / oracle - 1.0) < 0.01

    def test_mc_greeks_with_q(self, key):
        from options_model_tpu.pricers.greeks import mc_greeks
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG, div_yield=Q)
        g = mc_greeks(key, S0, T, spec, MCConfig(n_paths=65_536, n_steps=25,
                                                 path_block=4096),
                      style="european")
        cf = bs_greeks_closed_form(S0, K, T, R, SIG, CALL, q=Q)
        assert abs(float(g["Delta"]) - float(cf["Delta"])) < 0.02
        assert abs(float(g["Rho"]) - float(cf["Rho"])) < 0.05


class TestHestonWithQ:
    HP = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)

    def test_cos_parity_with_q(self):
        from options_model_tpu.calibration.charfn import heston_cos_price
        c = float(heston_cos_price(S0, K, T, R, self.HP, CALL, q=Q))
        p = float(heston_cos_price(S0, K, T, R, self.HP, PUT, q=Q))
        parity = S0 * np.exp(-Q * T) - K * np.exp(-R * T)
        assert abs((c - p) - parity) < 2e-3

    def test_cos_matches_heston_mc_with_q(self, key):
        from options_model_tpu.calibration.charfn import heston_cos_price
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=None, div_yield=Q)
        mc = MCConfig(n_paths=262_144, n_steps=100, path_block=4096)
        sampler = make_terminal_sampler("heston", S0, R, T, heston=self.HP,
                                        engine="xla", div_yield=Q)
        price, se, _ = price_european_mc(key, sampler, spec, T, mc)
        cos = float(heston_cos_price(S0, K, T, R, self.HP, CALL, q=Q))
        assert abs(float(price) - cos) < max(5.0 * float(se), 0.02)

    def test_bs_limit_with_q(self):
        # xi -> 0, v0 = theta: Heston degenerates to BS with sigma = sqrt(v0).
        # xi=0.02, rtol 2e-3 as in TestCOSPricer.test_bs_limit — smaller xi
        # hits the complex64 cancellation limit of the char fn (pre-existing,
        # independent of q).
        from options_model_tpu.calibration.charfn import heston_cos_price
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.02, rho=0.0, v0=0.04)
        cos = float(heston_cos_price(S0, K, T, R, hp, CALL, q=Q))
        bsm = float(bs_price(S0, K, T, R, 0.2, CALL, q=Q))
        np.testing.assert_allclose(cos, bsm, rtol=2e-3)


class TestSpecValidation:
    def test_negative_q_rejected(self):
        with pytest.raises(ValueError, match="div_yield"):
            OptionSpec(strike=K, rate=R, div_yield=-0.01).validate()

    def test_curve_request_q_flows(self):
        from options_model_tpu.apps.curves import CurveRequest, compute_curves
        kw = dict(s0_list=[100.0], strike=K, rate=R, cp=PUT,
                  intervals_per_day=1, total_points=1,
                  num_simulations=32768, sigma=SIG, engine="xla",
                  use_control_variate=False, seed=7)
        p0 = compute_curves(CurveRequest(**kw))["Option Value"].iloc[0]
        pq = compute_curves(CurveRequest(div_yield=0.06, **kw))[
            "Option Value"].iloc[0]
        assert pq > p0  # dividend raises the put value

    def test_cli_q_flag(self):
        from options_model_tpu.apps.cli import parse_args, run
        args = parse_args([
            "--spot", "100", "--hist-vol", "0.25", "--K", "100", "--q", "0.03",
            "--model", "bs", "--num-simulations", "4096", "--s0-start", "100",
            "--s0-end", "100", "--total-points", "1", "--intervals-per-day",
            "1", "--engine", "xla", "--option-type", "put"])
        out = run(args)
        assert np.isfinite(out["bs"]["Option Value"]).all()


class TestExoticsWithQ:
    def test_barrier_parity_with_q(self, key):
        from options_model_tpu.pricers import bs_price, price_barrier_mc
        spec = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG, div_yield=Q)
        mc = MCConfig(n_paths=65536, n_steps=32, path_block=4096)
        ko, _ = price_barrier_mc(key, S0, T, spec, barrier=140.0,
                                 barrier_type="up-and-out", mc=mc)
        ki, _ = price_barrier_mc(key, S0, T, spec, barrier=140.0,
                                 barrier_type="up-and-in", mc=mc)
        vanilla = float(bs_price(S0, K, T, R, SIG, CALL, q=Q))
        assert abs(float(ko) + float(ki) - vanilla) < 0.15

    def test_asian_with_q_below_qless(self, key):
        from options_model_tpu.pricers.exotics import price_asian_mc
        mc = MCConfig(n_paths=32768, n_steps=16, path_block=4096)
        spec_q = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG, div_yield=Q)
        spec_0 = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG)
        pq, _ = price_asian_mc(key, S0, T, spec_q, mc)
        p0, _ = price_asian_mc(key, S0, T, spec_0, mc)
        # same paths module; q lowers the drift => lower Asian call
        assert float(pq) < float(p0)
