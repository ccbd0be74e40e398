"""Asian and lookback exotics: ordering bounds, closed-form relations."""

import numpy as np
import pytest

from options_model_tpu.core.config import CALL, PUT, MCConfig, OptionSpec
from options_model_tpu.pricers import bs_price
from options_model_tpu.pricers.exotics import price_asian_mc, price_lookback_mc

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
CALL_SPEC = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG)
PUT_SPEC = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
MC = MCConfig(n_paths=2**15, n_steps=64, path_block=4096)


class TestAsian:
    def test_below_vanilla(self, key):
        # Averaging reduces volatility: fixed-strike Asian < European vanilla.
        p, se = price_asian_mc(key, S0, T, CALL_SPEC, MC)
        vanilla = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert 0.0 < float(p) < vanilla

    def test_geometric_below_arithmetic(self, key):
        pa, _ = price_asian_mc(key, S0, T, CALL_SPEC, MC, average="arithmetic")
        pg, _ = price_asian_mc(key, S0, T, CALL_SPEC, MC, average="geometric")
        # AM-GM: geometric average <= arithmetic -> cheaper call.
        assert float(pg) <= float(pa) + 1e-4

    def test_floating_strike_positive(self, key):
        p, _ = price_asian_mc(key, S0, T, CALL_SPEC, MC, strike_type="floating")
        assert float(p) > 0.0

    def test_bad_args(self, key):
        with pytest.raises(ValueError):
            price_asian_mc(key, S0, T, CALL_SPEC, MC, average="harmonic")
        with pytest.raises(ValueError):
            price_asian_mc(key, S0, T, CALL_SPEC, MC, strike_type="both")


class TestLookback:
    def test_floating_above_vanilla(self, key):
        # Floating lookback call (buy at the min) dominates the ATM vanilla.
        p, _ = price_lookback_mc(key, S0, T, CALL_SPEC, MC)
        vanilla = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert float(p) > vanilla

    def test_floating_always_itm(self, key):
        p_call, _ = price_lookback_mc(key, S0, T, CALL_SPEC, MC)
        p_put, _ = price_lookback_mc(key, S0, T, PUT_SPEC, MC)
        assert float(p_call) > 0.0 and float(p_put) > 0.0

    def test_fixed_strike_dominates_vanilla(self, key):
        # (max(S)-K)^+ >= (S_T-K)^+ pathwise.
        p, _ = price_lookback_mc(key, S0, T, CALL_SPEC, MC, strike_type="fixed")
        vanilla = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert float(p) >= vanilla - 0.05
