"""Multi-asset Bermudan LSM vs the Andersen-Broadie max-call benchmark."""

import jax
import numpy as np
import pytest

from options_model_tpu.core.config import MCConfig
from options_model_tpu.pricers.american_basket import price_american_basket
from options_model_tpu.pricers.basket import price_basket_mc

# Andersen & Broadie (2004), table 2: symmetric 2-asset Bermudan max-call,
# K=100, r=5%, q=10%, sigma=20%, rho=0, T=3y, 9 equally spaced exercise dates.
AB_TRUE = {90.0: 8.075, 100.0: 13.902, 110.0: 21.345}
KEY = jax.random.key(3)
MC9 = MCConfig(n_paths=1 << 16, n_steps=9, path_block=4096)


class TestMaxCallBenchmark:
    @pytest.mark.parametrize("s0", [90.0, 100.0, 110.0])
    def test_andersen_broadie_table(self, s0):
        price, se = price_american_basket(
            KEY, [s0, s0], 100.0, 3.0, 0.05, [0.2, 0.2],
            [[1.0, 0.0], [0.0, 1.0]], cp=1.0, mc=MC9, kind="max",
            div_yields=[0.10, 0.10])
        ref = AB_TRUE[s0]
        # in-sample LSM: small low bias + MC noise; 1% brackets both
        assert abs(float(price) - ref) / ref < 0.01, (float(price), ref)

    def test_oos_low_biased_estimator(self):
        kw = dict(mc=MC9, kind="max", div_yields=[0.10, 0.10])
        p_in, se_in = price_american_basket(
            KEY, [100.0, 100.0], 100.0, 3.0, 0.05, [0.2, 0.2],
            [[1.0, 0.0], [0.0, 1.0]], cp=1.0, **kw)
        p_oos, se_oos = price_american_basket(
            KEY, [100.0, 100.0], 100.0, 3.0, 0.05, [0.2, 0.2],
            [[1.0, 0.0], [0.0, 1.0]], cp=1.0, out_of_sample=True, **kw)
        # OOS estimate is a valid lower bound (up to MC noise) and both sit
        # near the benchmark
        assert float(p_oos) < float(p_in) + 3.0 * float(se_oos)
        assert abs(float(p_oos) - AB_TRUE[100.0]) / AB_TRUE[100.0] < 0.015


class TestBasketAmerican:
    def test_no_dividend_max_call_is_european(self):
        # Without dividends early exercise of a max-call is never optimal:
        # the Bermudan LSM price must match the European best-of MC price.
        corr = [[1.0, 0.3], [0.3, 1.0]]
        p_am, se_am = price_american_basket(
            KEY, [100.0, 100.0], 100.0, 1.0, 0.05, [0.2, 0.25], corr,
            cp=1.0, mc=MCConfig(n_paths=1 << 16, n_steps=12,
                                path_block=4096), kind="max")
        p_eu, se_eu = price_basket_mc(
            jax.random.key(4), [100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.05,
            [0.2, 0.25], corr, cp=1.0, kind="best_of", n_paths=1 << 17)
        tol = 5.0 * float(np.sqrt(float(se_am) ** 2 + float(se_eu) ** 2))
        # in-sample LSM can sit a touch above (foresight); allow 0.3% slack
        assert abs(float(p_am) - float(p_eu)) < max(tol,
                                                    0.003 * float(p_eu))

    def test_basket_put_dominates_european(self):
        corr = [[1.0, 0.5], [0.5, 1.0]]
        w = [0.5, 0.5]
        p_am, _ = price_american_basket(
            KEY, [100.0, 100.0], 105.0, 1.0, 0.08, [0.25, 0.3], corr,
            cp=-1.0, mc=MCConfig(n_paths=1 << 15, n_steps=16,
                                 path_block=4096), kind="basket", weights=w)
        p_eu, se_eu = price_basket_mc(
            jax.random.key(5), [100.0, 100.0], w, 105.0, 1.0, 0.08,
            [0.25, 0.3], corr, cp=-1.0, n_paths=1 << 16)
        # deep-ish ITM put with high r: early exercise premium is material
        assert float(p_am) > float(p_eu) + 3.0 * float(se_eu)

    def test_min_put_dominates_basket_put(self):
        corr = [[1.0, 0.5], [0.5, 1.0]]
        kw = dict(mc=MCConfig(n_paths=1 << 14, n_steps=8, path_block=4096))
        p_min, _ = price_american_basket(
            KEY, [100.0, 100.0], 100.0, 1.0, 0.05, [0.2, 0.3], corr,
            cp=-1.0, kind="min", **kw)
        p_b, _ = price_american_basket(
            KEY, [100.0, 100.0], 100.0, 1.0, 0.05, [0.2, 0.3], corr,
            cp=-1.0, kind="basket", weights=[0.5, 0.5], **kw)
        # min(S) <= basket(S) pathwise, so (K - min)^+ >= (K - basket)^+ and
        # the dominance survives optimal stopping.
        assert float(p_min) >= float(p_b) - 1e-3

    def test_bad_args(self):
        with pytest.raises(ValueError):
            price_american_basket(KEY, [100.0, 100.0], 100.0, 1.0, 0.05,
                                  [0.2, 0.2], [[1.0, 0.0], [0.0, 1.0]],
                                  kind="rainbow")
        with pytest.raises(ValueError):
            price_american_basket(KEY, [100.0, 100.0], 100.0, 1.0, 0.05,
                                  [0.2, 0.2], [[1.0, 0.0], [0.0, 1.0]],
                                  kind="basket")  # no weights
