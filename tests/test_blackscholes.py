"""Black-Scholes closed forms, AD Greeks, implied-vol solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.pricers.blackscholes import (
    bs_greeks,
    bs_greeks_closed_form,
    bs_price,
    bs_vega,
    implied_vol,
)

S0, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2


class TestPrice:
    def test_known_value(self):
        # Standard textbook value: ATM call, S=K=100, T=1, r=5%, sigma=20%.
        np.testing.assert_allclose(bs_price(S0, K, T, R, SIG, 1.0), 10.4506, atol=2e-3)
        np.testing.assert_allclose(bs_price(S0, K, T, R, SIG, -1.0), 5.5735, atol=2e-3)

    def test_put_call_parity(self):
        call = bs_price(S0, K, T, R, SIG, 1.0)
        put = bs_price(S0, K, T, R, SIG, -1.0)
        np.testing.assert_allclose(call - put, S0 - K * np.exp(-R * T), rtol=1e-5)

    def test_vectorized_over_strikes(self):
        Ks = jnp.linspace(80.0, 120.0, 16)
        prices = bs_price(S0, Ks, T, R, SIG, 1.0)
        assert prices.shape == (16,)
        assert np.all(np.diff(np.asarray(prices)) < 0)  # call decreasing in K

    def test_deep_itm_otm_limits(self):
        assert float(bs_price(1000.0, K, T, R, SIG, 1.0)) == pytest.approx(
            1000.0 - K * np.exp(-R * T), rel=1e-4)
        assert float(bs_price(1.0, K, T, R, SIG, 1.0)) == pytest.approx(0.0, abs=1e-6)


class TestGreeks:
    @pytest.mark.parametrize("cp", [1.0, -1.0])
    def test_ad_matches_closed_form(self, cp):
        ad = bs_greeks(S0, K, T, R, SIG, cp)
        cf = bs_greeks_closed_form(S0, K, T, R, SIG, cp)
        for name in ["Delta", "Gamma", "Vega", "Theta", "Rho"]:
            np.testing.assert_allclose(ad[name], cf[name], rtol=1e-4,
                                       err_msg=f"{name} mismatch (cp={cp})")

    def test_atm_call_delta_near_half(self):
        g = bs_greeks(S0, K, T, R, SIG, 1.0)
        assert 0.5 < float(g["Delta"]) < 0.7

    def test_put_call_delta_parity(self):
        gc = bs_greeks(S0, K, T, R, SIG, 1.0)
        gp = bs_greeks(S0, K, T, R, SIG, -1.0)
        np.testing.assert_allclose(float(gc["Delta"]) - float(gp["Delta"]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(gc["Gamma"], gp["Gamma"], rtol=1e-4)
        np.testing.assert_allclose(gc["Vega"], gp["Vega"], rtol=1e-4)


class TestImpliedVol:
    @pytest.mark.parametrize("sigma_true", [0.08, 0.2, 0.5, 1.2])
    @pytest.mark.parametrize("cp", [1.0, -1.0])
    def test_round_trip(self, sigma_true, cp):
        price = bs_price(S0, K, T, R, sigma_true, cp)
        iv = implied_vol(price, S0, K, T, R, cp)
        np.testing.assert_allclose(float(iv), sigma_true, rtol=1e-4)

    def test_vectorized_round_trip(self):
        sigmas = jnp.linspace(0.1, 0.8, 16)
        prices = bs_price(S0, K, T, R, sigmas, 1.0)
        ivs = implied_vol(prices, S0, K, T, R, 1.0)
        np.testing.assert_allclose(np.asarray(ivs), np.asarray(sigmas), rtol=1e-3)

    def test_otm_short_dated(self):
        price = bs_price(100.0, 120.0, 0.1, R, 0.3, 1.0)
        iv = implied_vol(price, 100.0, 120.0, 0.1, R, 1.0)
        np.testing.assert_allclose(float(iv), 0.3, rtol=1e-3)


def test_vega_positive_and_peaks_atm():
    Ks = jnp.linspace(50.0, 150.0, 101)
    v = np.asarray(bs_vega(S0, Ks, T, R, SIG))
    assert np.all(v > 0)
    # max near the mode of the lognormal — between 90 and 120 for these params
    assert 90 < float(Ks[np.argmax(v)]) < 125
