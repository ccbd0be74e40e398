"""SABR family (models/sabr.py): Hagan closed form, simulator, CV pricer,
smile calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import MCConfig, SABRParams
from options_model_tpu.core.stats import pair_mean_reduce
from options_model_tpu.models.sabr import (
    calibrate_sabr, hagan_lognormal_iv, sabr_bs_price, sabr_european_mc,
    simulate_sabr)
from options_model_tpu.pricers.blackscholes import bs_price

F0, T, R = 100.0, 0.5, 0.03
P = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=0.6)


class TestHagan:
    def test_nu_zero_is_flat_lognormal(self):
        p = SABRParams(alpha=0.25, beta=1.0, rho=0.0, nu=0.0)
        ivs = hagan_lognormal_iv(F0, jnp.array([70.0, 100.0, 140.0]), T, p)
        np.testing.assert_allclose(np.asarray(ivs), 0.25, rtol=1e-6)

    def test_negative_rho_skews_down(self):
        ivs = np.asarray(hagan_lognormal_iv(
            F0, jnp.array([80.0, 100.0, 120.0]), T, P))
        assert ivs[0] > ivs[1]  # low strikes richer under rho < 0

    def test_atm_continuity(self):
        """The z/x(z) series splice must be continuous through K = F."""
        Ks = jnp.array([99.999, 99.9999, 100.0, 100.0001, 100.001])
        ivs = np.asarray(hagan_lognormal_iv(F0, Ks, T, P, dtype=jnp.float32))
        assert np.all(np.isfinite(ivs))
        assert ivs.max() - ivs.min() < 1e-5

    def test_beta_lt_one_backbone(self):
        """beta < 1: ATM vol ~ alpha / F^{1-beta} (the CEV backbone)."""
        p = SABRParams(alpha=2.0, beta=0.5, rho=0.0, nu=1e-8)
        iv = float(hagan_lognormal_iv(100.0, 100.0, T, p))
        assert iv == pytest.approx(2.0 / 100.0**0.5, rel=2e-3)

    def test_differentiable(self):
        g = jax.grad(lambda a: float_iv(a))(0.2)
        assert np.isfinite(g) and g > 0  # vega in alpha


def float_iv(a):
    p = SABRParams(alpha=a, beta=1.0, rho=-0.4, nu=0.6)
    return hagan_lognormal_iv(F0, 100.0, T, p)


class TestSimulator:
    def test_forward_martingale(self, key):
        cfg = MCConfig(n_paths=131_072, n_steps=32, path_block=4096)
        F_T = simulate_sabr(key, F0, T, P, cfg)
        pm = pair_mean_reduce(F_T, cfg.path_block)
        se = float(pm.std() / np.sqrt(pm.size))
        assert abs(float(F_T.mean()) - F0) < 4 * se

    def test_alpha_exactly_lognormal(self, key):
        """The vol update is the exact SDE solution: E[alpha_T] = alpha_0 and
        E[log alpha_T] = log alpha_0 - nu^2 T / 2 at ANY step count."""
        cfg = MCConfig(n_paths=131_072, n_steps=4, path_block=4096)
        _, a_T = simulate_sabr(key, F0, T, P, cfg, return_alpha=True)
        a = np.asarray(a_T, np.float64)
        assert a.mean() == pytest.approx(P.alpha, rel=5e-3)
        assert np.log(a).mean() == pytest.approx(
            np.log(P.alpha) - 0.5 * P.nu**2 * T, rel=5e-3)

    def test_paths_shape_and_start(self, key):
        cfg = MCConfig(n_paths=8192, n_steps=10, path_block=4096)
        paths = simulate_sabr(key, F0, T, P, cfg, return_paths=True)
        assert paths.shape == (11, 8192)
        np.testing.assert_allclose(np.asarray(paths[0]), F0, rtol=1e-6)

    def test_beta_half_absorbs_at_zero(self, key):
        """CEV beta < 1 reaches 0 with positive probability; absorbed paths
        must STAY at 0 (no resurrection, no negatives)."""
        p = SABRParams(alpha=8.0, beta=0.5, rho=0.0, nu=0.2)
        cfg = MCConfig(n_paths=16384, n_steps=50, path_block=4096)
        paths = simulate_sabr(key, 5.0, 2.0, p, cfg, return_paths=True)
        arr = np.asarray(paths)
        assert arr.min() >= 0.0
        hit = (arr == 0.0).argmax(axis=0)  # first zero step (0 if never)
        ever = (arr == 0.0).any(axis=0)
        assert ever.any()  # the regime is chosen to absorb some paths
        for j in np.where(ever)[0][:50]:
            assert np.all(arr[hit[j]:, j] == 0.0)


class TestEuropean:
    def test_nu_zero_matches_black_exactly(self, key):
        """With nu = 0 the simulator is exact lognormal: z-test vs Black."""
        p = SABRParams(alpha=0.2, beta=1.0, rho=0.0, nu=0.0)
        cfg = MCConfig(n_paths=262_144, n_steps=16, path_block=4096)
        S0 = F0 * np.exp(-R * T)
        mc, se = sabr_european_mc(key, S0, 100.0, R, T, p, cfg, cp=1.0,
                                  control_variate=False)
        truth = float(sabr_bs_price(F0, 100.0, T, R, p, 1.0))
        assert abs(float(mc) - truth) < 4 * float(se)

    def test_mc_matches_hagan_within_approx_error(self, key):
        """Hagan is an O(nu^2 T) asymptotic: require 4 sigma + 0.3% of price
        (measured gap at nu=0.6, T=0.5: ~0.1-0.2%)."""
        cfg = MCConfig(n_paths=262_144, n_steps=64, path_block=4096)
        S0 = F0 * np.exp(-R * T)
        for K, cp in ((90.0, 1.0), (100.0, 1.0), (110.0, -1.0)):
            mc, se = sabr_european_mc(key, S0, K, R, T, P, cfg, cp=cp)
            truth = float(sabr_bs_price(F0, K, T, R, P, cp))
            assert abs(float(mc) - truth) < 4 * float(se) + 3e-3 * truth, K

    def test_control_variate_reduces_stderr(self, key):
        cfg = MCConfig(n_paths=65_536, n_steps=32, path_block=4096)
        S0 = F0 * np.exp(-R * T)
        _, se_cv = sabr_european_mc(key, S0, 100.0, R, T, P, cfg, cp=1.0,
                                    control_variate=True)
        _, se_plain = sabr_european_mc(key, S0, 100.0, R, T, P, cfg, cp=1.0,
                                       control_variate=False)
        assert float(se_cv) <= float(se_plain)

    def test_put_call_parity(self, key):
        cfg = MCConfig(n_paths=131_072, n_steps=32, path_block=4096)
        S0 = F0 * np.exp(-R * T)
        c, se_c = sabr_european_mc(key, S0, 100.0, R, T, P, cfg, cp=1.0)
        p, se_p = sabr_european_mc(key, S0, 100.0, R, T, P, cfg, cp=-1.0)
        lhs = float(c) - float(p)
        rhs = np.exp(-R * T) * (F0 - 100.0)
        assert abs(lhs - rhs) < 5 * float(np.hypot(se_c, se_p))


class TestCalibration:
    def test_round_trip(self):
        truth = SABRParams(alpha=0.22, beta=1.0, rho=-0.5, nu=0.8)
        Ks = np.linspace(70.0, 130.0, 13)
        ivs = np.asarray(hagan_lognormal_iv(F0, jnp.asarray(Ks), T, truth,
                                            dtype=jnp.float32))
        fit, info = calibrate_sabr(F0, T, Ks, ivs, beta=1.0)
        assert info["rmse"] < 1e-4
        assert fit.alpha == pytest.approx(truth.alpha, rel=2e-3)
        assert fit.rho == pytest.approx(truth.rho, rel=2e-2)
        assert fit.nu == pytest.approx(truth.nu, rel=2e-2)

    def test_beta_fixed_not_fitted(self):
        truth = SABRParams(alpha=0.3, beta=0.7, rho=-0.3, nu=0.5)
        Ks = np.linspace(80.0, 120.0, 9)
        ivs = np.asarray(hagan_lognormal_iv(F0, jnp.asarray(Ks), T, truth))
        fit, info = calibrate_sabr(F0, T, Ks, ivs, beta=0.7)
        assert fit.beta == 0.7
        assert info["rmse"] < 5e-4

    def test_validation(self):
        with pytest.raises(ValueError):
            SABRParams(alpha=-0.1, beta=1.0, rho=0.0, nu=0.1).validate()
        with pytest.raises(ValueError):
            SABRParams(alpha=0.2, beta=1.5, rho=0.0, nu=0.1).validate()
        with pytest.raises(ValueError):
            SABRParams(alpha=0.2, beta=1.0, rho=-1.0, nu=0.1).validate()


class TestFDOracle:
    """The (F, alpha) Douglas-ADI solver (pricers/fd_sabr.py) — the
    American-under-SABR anchor (the role fd_heston plays for Heston)."""

    def test_european_nu_zero_is_black(self):
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        p0 = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=1e-4)
        fd = sabr_fd_price(100.0, 100.0, T, R, p0, cp=-1.0, american=False)
        ref = float(bs_price(100.0, 100.0, T, R, 0.2, -1.0))
        assert abs(fd - ref) / ref < 2e-3   # grid error at default sizing

    def test_american_nu_zero_is_crr(self):
        from options_model_tpu.pricers.binomial import crr_american
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        p0 = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=1e-4)
        fd = sabr_fd_price(100.0, 100.0, T, R, p0, cp=-1.0, american=True)
        crr = crr_american(100.0, 100.0, T, R, 0.2, cp=-1.0, n_steps=4096)
        assert abs(fd - crr) / crr < 3e-3

    def test_american_dominates_european_and_intrinsic(self):
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        am = sabr_fd_price(100.0, 105.0, T, R, P, cp=-1.0)
        eu = sabr_fd_price(100.0, 105.0, T, R, P, cp=-1.0, american=False)
        assert am >= eu - 1e-6
        assert am >= 5.0 - 1e-6            # intrinsic K - S0

    def test_vol_of_vol_raises_put_value(self):
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        p_hi = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0)
        p0 = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=1e-4)
        p_lo = sabr_fd_price(100.0, 100.0, T, R, p0, cp=-1.0)
        assert p_hi > p_lo                 # ATM convexity in vol

    def test_rejects_cev_backbone(self):
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        with pytest.raises(ValueError):
            sabr_fd_price(100.0, 100.0, T, R,
                          SABRParams(alpha=0.2, beta=0.7, rho=0.0, nu=0.3))

    def test_bermudan_mode_orders_and_converges(self):
        """exercise_dates: the matched-dates Bermudan oracle, same contract
        and stride rule as fd_heston's (the mode that isolates LSM policy
        bias from the date gap). Bermudan < American, monotone in dates,
        every-step projection == the continuous mode."""
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        g = dict(n_f=120, n_a=48, n_t=120)
        am = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0, **g)
        b10 = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0,
                            exercise_dates=10, **g)
        b40 = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0,
                            exercise_dates=40, **g)
        b120 = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0,
                             exercise_dates=120, **g)
        eu = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0, american=False,
                           **g)
        assert eu < b10 < b40 < b120 <= am + 1e-12
        assert abs(b120 - am) < 1e-9
        with pytest.raises(ValueError, match="multiple"):
            sabr_fd_price(100.0, 100.0, T, R, P, n_t=100, exercise_dates=7)


class TestAmericanLSM:
    """model='sabr' through the flagship dispatcher: forward simulation,
    spot conversion, (S, alpha) regression basis (VERDICT r3 next #8)."""

    def _price(self, key, params, n_paths=1 << 15, **lsm_kw):
        from options_model_tpu.core.config import LSMConfig, OptionSpec, PUT
        from options_model_tpu.pricers.american import price_american
        spec = OptionSpec(strike=100.0, rate=R, cp=PUT, sigma=None)
        mc = MCConfig(n_paths=n_paths, n_steps=50, path_block=4096)
        return price_american(key, 100.0, T, spec, mc,
                              LSMConfig(regressor="poly", richardson=True,
                                        **lsm_kw),
                              model="sabr", sabr=params)

    @pytest.mark.slow
    def test_lognormal_limit_matches_crr(self, key):
        from options_model_tpu.pricers.binomial import crr_american
        p0 = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=1e-4)
        price, se = self._price(key, p0)
        crr = crr_american(100.0, 100.0, T, R, 0.2, cp=-1.0, n_steps=4096)
        assert abs(float(price) - crr) / crr < max(0.01,
                                                   4 * float(se) / crr)

    @pytest.mark.slow
    def test_matches_adi_oracle(self, key):
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price
        price, se = self._price(key, P, n_paths=1 << 16)
        fd = sabr_fd_price(100.0, 100.0, T, R, P, cp=-1.0,
                           n_f=450, n_a=180, n_t=450)
        # LSM policy suboptimality + remaining ADI grid error: the measured
        # gap is ~0.3-0.5% low at these sizes (scripts-level probe) — gate
        # at 1.5% so only real regressions (e.g. losing the alpha basis,
        # which costs ~2.4%) trip it.
        assert abs(float(price) - fd) / fd < 0.015

    @pytest.mark.slow
    def test_alpha_basis_is_load_bearing(self, key):
        """S-only regression under vol-of-vol must price BELOW the (S,
        alpha) policy (a strictly worse exercise rule) — the measured gap is
        ~2%; tripping this means the alpha columns silently fell out."""
        p_sv, _ = self._price(key, P)
        p_s, _ = self._price(key, P, variance_basis=False)
        assert float(p_sv) > float(p_s) + 0.02

    def test_spot_conversion_terminal_equals_forward(self, key):
        """At expiry the spot IS the forward; at t=0 the path starts at S0
        (the e^{-drift*(T-t)} conversion in simulate_paths)."""
        from options_model_tpu.pricers.american import simulate_paths
        mc = MCConfig(n_paths=4096, n_steps=10, path_block=1024)
        S = simulate_paths(key, 100.0, T, mc, "sabr", rate=R, sabr=P)
        np.testing.assert_allclose(np.asarray(S[0]), 100.0, rtol=1e-5)
        # forward martingale => E[S_T] = S0 e^{rT}
        m = float(pair_mean_reduce(S[-1], 1024).mean())
        assert abs(m - 100.0 * np.exp(R * T)) < 1.5

    @pytest.mark.slow
    def test_european_sampler_dispatch(self, key):
        from options_model_tpu.core.config import OptionSpec, PUT
        from options_model_tpu.pricers.european import (make_terminal_sampler,
                                                        price_european_mc)
        spec = OptionSpec(strike=100.0, rate=R, cp=PUT, sigma=None)
        mc = MCConfig(n_paths=1 << 15, n_steps=50, path_block=4096)
        sampler = make_terminal_sampler("sabr", 100.0, R, T, sabr=P)
        price, se, n = price_european_mc(key, sampler, spec, T, mc)
        mc_ref, se_ref = sabr_european_mc(key, 100.0, 100.0, R, T, P, mc,
                                          cp=-1.0, control_variate=False)
        assert abs(float(price) - float(mc_ref)) < 4 * (float(se)
                                                        + float(se_ref))
