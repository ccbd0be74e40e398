"""Bermudan/American COS oracle (Fang-Oosterlee 2009) and the LSM anchors.

Two layers: (1) the oracle itself is pinned to every closed form the repo
already trusts (BS / Merton series / VG-COS Europeans at n_dates=1, CRR for
the GBM American limit); (2) the Monte-Carlo LSM pricers for the Levy jump
families are pinned to the oracle — the first EXTERNAL check on American
prices under Merton and Variance Gamma (Heston's analogue is the ADI oracle,
tests/test_fd_heston.py).
"""

import jax
import numpy as np
import pytest

from options_model_tpu.core.config import (
    LSMConfig, MCConfig, MertonParams, OptionSpec, PUT, VGParams)
from options_model_tpu.pricers.binomial import crr_price
from options_model_tpu.pricers.blackscholes import bs_price
from options_model_tpu.pricers.cos_bermudan import (
    cos_american_price, cos_bermudan_price)

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
MP = MertonParams(sigma=0.2, lam=1.0, mu_j=-0.10, sigma_j=0.15)
VG = VGParams(sigma=0.2, theta=-0.14, nu=0.2)
KEY = jax.random.key(7)


class TestOracleEuropeanLimits:
    """n_dates=1 is a European option — each family's closed form is exact."""

    def test_gbm_put_and_call(self):
        for cp in (1.0, -1.0):
            cos = cos_bermudan_price(S0, K, T, R, "gbm", sigma=SIG, cp=cp,
                                     n_dates=1)
            ref = float(bs_price(S0, K, T, R, SIG, cp))
            # bs_price is float32; the oracle itself is f64-exact.
            assert abs(cos - ref) < 1e-4, (cp, cos, ref)

    def test_gbm_dividend_yield(self):
        cos = cos_bermudan_price(S0, K, T, R, "gbm", sigma=SIG, cp=1.0,
                                 q=0.03, n_dates=1)
        ref = float(bs_price(S0, K, T, R, SIG, 1.0, q=0.03))
        assert abs(cos - ref) < 1e-4

    def test_merton_matches_series(self):
        from options_model_tpu.models.merton import merton_price
        cos = cos_bermudan_price(S0, K, T, R, "merton", merton=MP, cp=PUT,
                                 n_dates=1)
        ref = float(merton_price(S0, K, T, R, MP, cp=-1.0))
        assert abs(cos - ref) < 5e-4

    def test_vg_matches_cos_european(self):
        from options_model_tpu.calibration.charfn import vg_cos_price
        cos = cos_bermudan_price(S0, K, T, R, "vg", vg=VG, cp=PUT, n_dates=1)
        ref = float(vg_cos_price(S0, K, T, R, VG, cp=-1.0))
        assert abs(cos - ref) < 2e-3  # vg_cos_price is f32 (~2e-3 floor)

    def test_unsupported_model_raises(self):
        with pytest.raises(ValueError):
            cos_bermudan_price(S0, K, T, R, "heston", n_dates=2)


class TestOracleAmericanLimit:
    @pytest.mark.slow
    def test_gbm_put_matches_crr(self):
        cos = cos_american_price(S0, K, T, R, "gbm", sigma=SIG, cp=PUT)
        crr = crr_price(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(cos - crr) / crr < 5e-4, (cos, crr)

    @pytest.mark.slow
    def test_gbm_dividend_call_matches_crr(self):
        # q > r makes early exercise of the CALL optimal — exercises the
        # call-side (right-region) branch of the recursion end to end.
        cos = cos_american_price(S0, K, T, R, "gbm", sigma=SIG, cp=1.0,
                                 q=0.08)
        crr = crr_price(S0, K, T, R, SIG, cp=1.0, n_steps=4096, q=0.08)
        euro = float(bs_price(S0, K, T, R, SIG, 1.0, q=0.08))
        assert cos > euro + 1e-3          # genuine early-exercise premium
        assert abs(cos - crr) / crr < 5e-4, (cos, crr)

    @pytest.mark.slow
    def test_bermudan_increases_to_american(self):
        b25 = cos_bermudan_price(S0, K, T, R, "gbm", sigma=SIG, cp=PUT,
                                 n_dates=25)
        b50 = cos_bermudan_price(S0, K, T, R, "gbm", sigma=SIG, cp=PUT,
                                 n_dates=50)
        am = cos_american_price(S0, K, T, R, "gbm", sigma=SIG, cp=PUT)
        assert b25 <= b50 + 1e-9 <= am + 1e-6

    @pytest.mark.slow
    def test_jump_families_dominate_european(self):
        for model, kw in (("merton", {"merton": MP}), ("vg", {"vg": VG})):
            am = cos_american_price(S0, K, T, R, model, cp=PUT, **kw)
            eu = cos_bermudan_price(S0, K, T, R, model, cp=PUT, n_dates=1,
                                    **kw)
            intr = max(K - S0, 0.0)
            assert am >= eu - 1e-6 and am >= intr, (model, am, eu)


class TestLSMAnchors:
    """The MC LSM prices the same Bermudan contract (n_steps exercise dates);
    at matched dates LSM-vs-COS differences are pure MC + regression error."""

    MC = MCConfig(n_paths=1 << 15, n_steps=50, path_block=4096)

    def _lsm(self, model, **kw):
        from options_model_tpu.pricers.american import (
            price_american_with_control_variate)
        spec = OptionSpec(strike=K, rate=R, cp=PUT,
                          sigma=SIG if model == "gbm" else None)
        return price_american_with_control_variate(
            KEY, S0, T, spec, self.MC, LSMConfig(), model, **kw)

    @pytest.mark.slow
    def test_merton_american_put(self):
        price, se = self._lsm("merton", merton=MP)
        oracle = cos_bermudan_price(S0, K, T, R, "merton", merton=MP, cp=PUT,
                                    n_dates=self.MC.n_steps)
        err = abs(float(price) - oracle)
        # LSM is low-biased (suboptimal policy) + MC noise; 1% of price or
        # 4 sigma, whichever is looser, matches the Heston-vs-ADI gate.
        assert err < max(0.01 * oracle, 4.0 * float(se)), (
            float(price), oracle, float(se))

    def test_vg_american_put(self):
        price, se = self._lsm("vg", vg=VG)
        oracle = cos_bermudan_price(S0, K, T, R, "vg", vg=VG, cp=PUT,
                                    n_dates=self.MC.n_steps)
        err = abs(float(price) - oracle)
        assert err < max(0.01 * oracle, 4.0 * float(se)), (
            float(price), oracle, float(se))

    def test_gbm_bermudan_at_matched_dates(self):
        # Closes the loop on the existing CRR anchor: at 50 shared dates the
        # LSM's contract IS this Bermudan, no Richardson needed.
        price, se = self._lsm("gbm")
        oracle = cos_bermudan_price(S0, K, T, R, "gbm", sigma=SIG, cp=PUT,
                                    n_dates=self.MC.n_steps)
        assert abs(float(price) - oracle) < max(0.01 * oracle,
                                                4.0 * float(se))


class TestRichardsonContinuousLimit:
    """The headline estimator's Richardson step extrapolates the exercise-
    date bias toward the CONTINUOUS American; until now that claim was only
    CRR-checkable under GBM. cos_american_price extends the check to the
    jump families (their first continuous-exercise anchor of any kind)."""

    MC = MCConfig(n_paths=1 << 15, n_steps=50, path_block=4096)

    def _rich(self, model, **kw):
        from options_model_tpu.pricers.american import price_american
        spec = OptionSpec(strike=K, rate=R, cp=PUT,
                          sigma=SIG if model in ("gbm", "merton") else None)
        return price_american(KEY, S0, T, spec, self.MC,
                              LSMConfig(richardson=True), model, **kw)

    @pytest.mark.slow
    def test_merton_richardson(self):
        price, se = self._rich("merton", merton=MP)
        oracle = cos_american_price(S0, K, T, R, "merton", merton=MP, cp=PUT)
        assert abs(float(price) - oracle) < max(0.01 * oracle,
                                                4.0 * float(se)), (
            float(price), oracle, float(se))

    @pytest.mark.slow
    def test_vg_richardson(self):
        price, se = self._rich("vg", vg=VG)
        oracle = cos_american_price(S0, K, T, R, "vg", vg=VG, cp=PUT)
        assert abs(float(price) - oracle) < max(0.01 * oracle,
                                                4.0 * float(se)), (
            float(price), oracle, float(se))
