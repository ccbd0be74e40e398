"""Bates (Heston + lognormal jumps) model family.

Cross-validation web: the COS closed form reduces EXACTLY to Heston at lam=0
and to the Merton series as xi -> 0 (in f64 — the complex64 Heston char-fn
carries a known ~3e-3 conditioning floor at tiny xi, see test docstring);
the simulator is pinned to the COS price; the American dispatcher composes
the COS control variate and the (S, v) variance basis.

Beyond-reference family: the reference has no jump dynamics at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.calibration import bates_cos_price, heston_cos_price
from options_model_tpu.core import (
    BatesParams,
    HestonParams,
    LSMConfig,
    MCConfig,
    MertonParams,
    OptionSpec,
)
from options_model_tpu.models.bates import jump_overlay, simulate_bates
from options_model_tpu.models.merton import merton_price

HP = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
BP = BatesParams(heston=HP, lam=0.3, mu_j=-0.1, sigma_j=0.15)
SPEC_PUT = OptionSpec(strike=100.0, rate=0.03, sigma=None, cp=-1.0)
S0, T = 100.0, 1.0


class TestBatesParams:
    def test_validate_passes(self):
        BP.validate()

    def test_negative_lam_rejected(self):
        with pytest.raises(ValueError, match="lam"):
            BatesParams(heston=HP, lam=-0.1, mu_j=0.0, sigma_j=0.1).validate()

    def test_nested_heston_validated(self):
        bad = BatesParams(heston=HestonParams(kappa=2.0, theta=0.04, xi=0.5,
                                              rho=-2.0, v0=0.04),
                          lam=0.1, mu_j=0.0, sigma_j=0.1)
        with pytest.raises(ValueError, match="rho"):
            bad.validate()


class TestBatesCOS:
    def test_lam_zero_is_heston(self):
        b0 = BatesParams(heston=HP, lam=0.0, mu_j=-0.1, sigma_j=0.15)
        ph = heston_cos_price(S0, 100.0, T, 0.03, HP, cp=-1.0)
        pb = bates_cos_price(S0, 100.0, T, 0.03, b0, cp=-1.0)
        np.testing.assert_allclose(float(pb), float(ph), rtol=1e-6)

    def test_xi_zero_limit_is_merton_f64(self):
        """xi -> 0, v0 = theta: Bates collapses to Merton with sigma=sqrt(v0).

        Run in f64: the complex64 Heston char-fn divides by xi^2 in its
        A-term and loses ~3e-3 absolute per point at xi=1e-3 (measured),
        which the coherent COS sum amplifies to ~1 in price — the SAME
        known f32 floor the calibration root-cause documents, just in an
        extreme corner. The f64 chain agrees with the (independently
        Gil-Pelaez-verified) Merton series to 6 decimals."""
        from options_model_tpu.calibration.calibrator import (
            _explicit_x64_scope, _try_enable_explicit_x64)
        if not _try_enable_explicit_x64():
            pytest.skip("explicit x64 unavailable")
        hp0 = HestonParams(kappa=2.0, theta=0.04, xi=1e-3, rho=0.0, v0=0.04)
        bp0 = BatesParams(heston=hp0, lam=0.5, mu_j=-0.1, sigma_j=0.15)
        mp = MertonParams(sigma=0.2, lam=0.5, mu_j=-0.1, sigma_j=0.15)
        with _explicit_x64_scope():
            pb = float(bates_cos_price(S0, 100.0, T, 0.03, bp0, cp=-1.0,
                                       dtype=jnp.float64))
            pm = float(merton_price(S0, 100.0, T, 0.03, mp, cp=-1.0,
                                    dtype=jnp.float64))
        np.testing.assert_allclose(pb, pm, atol=2e-5)

    def test_downward_jumps_raise_put(self):
        ph = float(heston_cos_price(S0, 100.0, T, 0.03, HP, cp=-1.0))
        pb = float(bates_cos_price(S0, 100.0, T, 0.03, BP, cp=-1.0))
        assert pb > ph + 0.1

    def test_put_call_parity(self):
        c = float(bates_cos_price(S0, 95.0, T, 0.03, BP, cp=1.0, q=0.01))
        p = float(bates_cos_price(S0, 95.0, T, 0.03, BP, cp=-1.0, q=0.01))
        lhs = c - p
        rhs = S0 * np.exp(-0.01 * T) - 95.0 * np.exp(-0.03 * T)
        np.testing.assert_allclose(lhs, rhs, atol=5e-3)


class TestBatesSimulator:
    CFG = MCConfig(n_paths=1 << 17, n_steps=100, path_block=4096)

    def test_martingale(self):
        ST = simulate_bates(jax.random.key(0), S0, 0.03, T, BP, self.CFG,
                            return_paths=False)
        fwd = float(jnp.mean(ST)) * np.exp(-0.03 * T)
        assert abs(fwd - S0) < 0.25

    def test_european_put_matches_cos(self):
        ST = simulate_bates(jax.random.key(1), S0, 0.03, T, BP, self.CFG,
                            return_paths=False)
        pay = jnp.maximum(100.0 - ST, 0.0) * np.exp(-0.03 * T)
        # antithetic pair means are the i.i.d. unit (jump draws full-width,
        # diffusion mirrored within path_block)
        from options_model_tpu.core.stats import pair_mean_reduce
        pm = pair_mean_reduce(pay, self.CFG.path_block)
        mc, se = float(jnp.mean(pm)), float(jnp.std(pm) / np.sqrt(pm.shape[0]))
        cos = float(bates_cos_price(S0, 100.0, T, 0.03, BP, cp=-1.0))
        # 100-step Euler carries O(dt) discretization bias on top of MC noise
        assert abs(mc - cos) < 4 * se + 0.03, (mc, cos, se)

    def test_qe_scheme_agrees(self):
        cfg = MCConfig(n_paths=1 << 16, n_steps=50, path_block=4096)
        a = simulate_bates(jax.random.key(2), S0, 0.03, T, BP, cfg,
                           return_paths=False, scheme="euler")
        b = simulate_bates(jax.random.key(2), S0, 0.03, T, BP, cfg,
                           return_paths=False, scheme="qe")
        pa = float(jnp.mean(jnp.maximum(100.0 - a, 0.0)))
        pb = float(jnp.mean(jnp.maximum(100.0 - b, 0.0)))
        assert abs(pa - pb) < 0.15

    def test_paths_and_variance_shapes(self):
        cfg = MCConfig(n_paths=8192, n_steps=10, path_block=4096)
        S, v = simulate_bates(jax.random.key(3), S0, 0.03, T, BP, cfg,
                              return_paths=True, return_variance=True)
        assert S.shape == (11, 8192) and v.shape == (11, 8192)
        np.testing.assert_allclose(np.asarray(S[0]), S0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(v[0]), HP.v0, rtol=1e-6)

    def test_overlay_mean_one_and_chunk_invariance(self):
        cfg = MCConfig(n_paths=1 << 16, n_steps=20, path_block=4096)
        f = jump_overlay(jax.random.key(4), T, 0.5, -0.1, 0.2, cfg,
                         return_paths=False)
        assert abs(float(jnp.mean(f)) - 1.0) < 0.01
        # chunk invariance: blocks [4..7] of a 8-block run == a 4-block run
        # starting at first_block=4 (the simulators' global-block contract)
        cfg8 = MCConfig(n_paths=8 * 1024, n_steps=20, path_block=1024)
        cfg4 = MCConfig(n_paths=4 * 1024, n_steps=20, path_block=1024)
        full = jump_overlay(jax.random.key(5), T, 0.5, -0.1, 0.2, cfg8,
                            return_paths=False)
        tail = jump_overlay(jax.random.key(5), T, 0.5, -0.1, 0.2, cfg4,
                            return_paths=False, first_block=4)
        np.testing.assert_array_equal(np.asarray(full[4 * 1024:]),
                                      np.asarray(tail))


class TestBatesAmerican:
    MC = MCConfig(n_paths=1 << 16, n_steps=50, path_block=4096)

    @pytest.mark.slow
    def test_american_above_european_and_cv_composes(self):
        from options_model_tpu.pricers.american import price_american
        eu = float(bates_cos_price(S0, 100.0, T, 0.03, BP, cp=-1.0))
        lsm = LSMConfig(use_control_variate=True)
        price, stderr = price_american(jax.random.key(6), S0, T, SPEC_PUT,
                                       self.MC, lsm, model="bates", bates=BP,
                                       engine="xla")
        p, se = float(price), float(stderr)
        assert p > eu - 3 * se, (p, eu, se)       # early exercise adds value
        assert p < eu * 1.25                       # ...but not absurdly
        assert se < 0.05

    def test_lam_zero_matches_heston_american(self):
        from options_model_tpu.pricers.american import price_american
        lsm = LSMConfig(use_control_variate=True)
        b0 = BatesParams(heston=HP, lam=0.0, mu_j=0.0, sigma_j=0.1)
        ph, seh = price_american(jax.random.key(7), S0, T, SPEC_PUT, self.MC,
                                 lsm, model="heston", heston=HP, engine="xla")
        pb, seb = price_american(jax.random.key(7), S0, T, SPEC_PUT, self.MC,
                                 lsm, model="bates", bates=b0, engine="xla")
        # different RNG layout (bates splits the key) -> statistical agreement
        tol = 4 * float(jnp.sqrt(seh**2 + seb**2)) + 0.02
        assert abs(float(ph) - float(pb)) < tol

    @pytest.mark.slow
    def test_richardson_and_stats_routes(self):
        from options_model_tpu.pricers.american import (
            price_american, price_american_with_stats)
        lsm = LSMConfig(use_control_variate=True, richardson=True)
        p, se = price_american(jax.random.key(8), S0, T, SPEC_PUT, self.MC,
                               lsm, model="bates", bates=BP, engine="xla")
        assert np.isfinite(float(p)) and float(se) < 0.08
        p2, se2, stats = price_american_with_stats(
            jax.random.key(9), S0, T, SPEC_PUT, self.MC, LSMConfig(),
            model="bates", bates=BP, engine="xla")
        assert 0.0 <= stats["p_worthless"] <= 1.0
        assert np.isfinite(float(p2))

    def test_european_approximation_route(self):
        from options_model_tpu.pricers.american import price_american
        lsm = LSMConfig(european_approximation=True)
        p, se = price_american(jax.random.key(10), S0, T, SPEC_PUT, self.MC,
                               lsm, model="bates", bates=BP, engine="xla")
        cos = float(bates_cos_price(S0, 100.0, T, 0.03, BP, cp=-1.0))
        assert abs(float(p) - cos) < 4 * float(se) + 0.03

    @pytest.mark.slow
    def test_nn_regressor_route(self):
        from options_model_tpu.pricers.american import price_american
        mc = MCConfig(n_paths=1 << 14, n_steps=25, path_block=4096)
        lsm = LSMConfig(regressor="nn", use_control_variate=True,
                        nn_epochs=12, nn_policy_iters=2)
        p, se = price_american(jax.random.key(11), S0, T, SPEC_PUT, mc, lsm,
                               model="bates", bates=BP, engine="xla")
        eu = float(bates_cos_price(S0, 100.0, T, 0.03, BP, cp=-1.0))
        assert float(p) > eu - 4 * float(se) - 0.05
        assert float(p) < eu * 1.3


class TestBatesCalibration:
    """Joint Heston+jump calibration round trip (beyond-reference; the
    reference calibrates Heston only)."""

    def test_invalid_model_rejected(self):
        from options_model_tpu.calibration.calibrator import HestonCalibrator
        with pytest.raises(ValueError, match="model"):
            HestonCalibrator(model="svj2")

    @pytest.mark.slow
    def test_round_trip_f64_recovers_all_eight_params(self):
        from options_model_tpu.calibration import (
            calibrate_bates_to_data, create_synthetic_bates_surface)
        from options_model_tpu.calibration.calibrator import (
            _try_enable_explicit_x64)
        from options_model_tpu.core import CalibrationConfig
        if not _try_enable_explicit_x64():
            pytest.skip("explicit x64 unavailable")
        true = BatesParams(
            heston=HestonParams(kappa=2.5, theta=0.05, xi=0.45, rho=-0.6,
                                v0=0.045),
            lam=0.4, mu_j=-0.12, sigma_j=0.18)
        K, T, iv = create_synthetic_bates_surface(
            true, S0=100.0, rate=0.04, strikes=np.linspace(70, 130, 17),
            dtype=np.float64)
        cfg = CalibrationConfig(optimization_methods=("L-BFGS-B",))
        params, summary = calibrate_bates_to_data(K, T, iv, 100.0, rate=0.04,
                                                  config=cfg)
        assert summary["error"] < 1e-6
        got = np.asarray(params.to_array())
        want = np.asarray(true.to_array())
        np.testing.assert_allclose(got, want, rtol=0.01, atol=1e-3)
        assert {"lam", "mu_j", "sigma_j"} <= set(summary["parameters"])
        assert isinstance(params, BatesParams)
