"""Variance/volatility swaps (pricers/varswap.py): closed forms per family,
the log-contract replication identity and its jump gap, forward-variance
additivity, and the discretely monitored MC leg."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (BatesParams, HestonParams,
                                           MCConfig, MertonParams)
from options_model_tpu.pricers.varswap import (
    forward_varswap_strike, heston_integrated_variance, varswap_mc,
    varswap_pv, varswap_strike, varswap_strike_replication)

S0, R = 100.0, 0.05
HP = HestonParams(kappa=2.0, theta=0.04, xi=0.4, rho=-0.6, v0=0.09)
MP = MertonParams(sigma=0.2, lam=0.5, mu_j=-0.1, sigma_j=0.15)
BP = BatesParams(heston=HP, lam=0.5, mu_j=-0.1, sigma_j=0.15)


class TestClosedForms:
    def test_gbm(self):
        assert varswap_strike(0.7, "gbm", sigma=0.2) == pytest.approx(0.04)
        assert varswap_strike_replication(
            0.7, "gbm", sigma=0.2) == pytest.approx(0.04)

    def test_heston_vs_quadrature(self):
        T = 0.8
        t = np.linspace(0.0, T, 20001)
        ev = HP.theta + (HP.v0 - HP.theta) * np.exp(-HP.kappa * t)
        quad = np.trapezoid(ev, t) / T
        assert heston_integrated_variance(HP, T) == pytest.approx(quad,
                                                                  rel=1e-8)
        # limits: T -> 0 gives v0, T -> inf gives theta
        assert heston_integrated_variance(HP, 1e-9) == pytest.approx(HP.v0)
        assert heston_integrated_variance(HP, 500.0) == pytest.approx(
            HP.theta + (HP.v0 - HP.theta) / (HP.kappa * 500.0), rel=1e-6)
        # replication == QV for a continuous family
        assert varswap_strike(T, "heston", heston=HP) == pytest.approx(
            varswap_strike_replication(T, "heston", heston=HP))

    def test_jump_families_compose(self):
        T = 0.6
        jump_qv = MP.lam * (MP.mu_j**2 + MP.sigma_j**2)
        assert varswap_strike(T, "merton", merton=MP) == pytest.approx(
            MP.sigma**2 + jump_qv)
        assert varswap_strike(T, "bates", bates=BP) == pytest.approx(
            heston_integrated_variance(HP, T) + jump_qv)
        # the replication gap is model-independent given the jump triple
        gap_m = (varswap_strike_replication(T, "merton", merton=MP)
                 - varswap_strike(T, "merton", merton=MP))
        gap_b = (varswap_strike_replication(T, "bates", bates=BP)
                 - varswap_strike(T, "bates", bates=BP))
        assert gap_m == pytest.approx(gap_b)
        # downward-skewed jumps: E[J^3] < 0, so the vanilla strip UNDERPRICES
        # realized variance (the 2008-style varswap replication shortfall)
        assert gap_m < 0.0
        # magnitude matches 2 lam E[e^J - 1 - J - J^2/2] by quadrature
        j = np.linspace(-2.0, 2.0, 400001)
        pdf = (np.exp(-0.5 * ((j - MP.mu_j) / MP.sigma_j) ** 2)
               / (MP.sigma_j * math.sqrt(2 * math.pi)))
        integrand = (np.exp(j) - 1.0 - j - 0.5 * j**2) * pdf
        gap_quad = 2.0 * MP.lam * np.trapezoid(integrand, j)
        assert gap_m == pytest.approx(gap_quad, rel=1e-6)

    def test_forward_variance_additivity(self):
        T1, T2 = 0.25, 1.0
        kf = forward_varswap_strike(T1, T2, "heston", heston=HP)
        lhs = (T1 * varswap_strike(T1, "heston", heston=HP)
               + (T2 - T1) * kf)
        assert lhs == pytest.approx(T2 * varswap_strike(T2, "heston",
                                                        heston=HP))
        # forward segment of a mean-reverting surface sits nearer theta
        assert abs(kf - HP.theta) < abs(
            varswap_strike(T1, "heston", heston=HP) - HP.theta)
        with pytest.raises(ValueError):
            forward_varswap_strike(1.0, 0.5, "gbm", sigma=0.2)

    def test_pv_and_guards(self):
        pv = varswap_pv(0.05, 0.04, 1.0, R, notional_var=100.0)
        assert pv == pytest.approx(100.0 * math.exp(-R) * 0.01)
        with pytest.raises(ValueError):
            varswap_strike(0.5, "gbm")
        with pytest.raises(ValueError):
            varswap_strike(-0.5, "gbm", sigma=0.2)
        with pytest.raises(ValueError):
            varswap_strike(0.5, "localvol", sigma=0.2)


class TestExoticCLI:
    def _run(self, argv):
        from options_model_tpu.apps.price_exotic import parse_args, run
        return run(parse_args(argv))

    def test_varswap_subcommand_heston(self):
        out = self._run(["varswap", "--model", "heston", "--t", "0.5",
                         "--paths", "16384", "--steps", "64",
                         "--var-strike", "0.04"])
        assert out["var_strike_qv"] == pytest.approx(
            out["var_strike_replication"])   # continuous family
        assert abs(out["var_strike"] - out["var_strike_qv"]) < (
            4 * out["var_stderr"] + 2e-3)
        assert out["vol_strike"] <= math.sqrt(out["var_strike"]) + 1e-9
        assert "pv_per_var_notional" in out
        assert out["price"] == out["var_strike"]

    def test_varswap_rejects_sabr(self):
        with pytest.raises(SystemExit):
            self._run(["varswap", "--model", "sabr", "--paths", "4096"])


class TestMonteCarlo:
    def test_gbm_mc_matches_closed_form(self, key):
        T, sig = 0.7, 0.25
        mc = MCConfig(n_paths=65_536, n_steps=64, path_block=4096)
        res = varswap_mc(key, S0, T, mc, "gbm", sigma=sig, rate=R,
                         engine="xla")
        truth = varswap_strike(T, "gbm", sigma=sig)
        # discrete-monitoring drift bias: ((r - sig^2/2)^2 T / n) per year
        bias = (R - 0.5 * sig**2) ** 2 * T / mc.n_steps
        assert abs(res["var_strike"] - truth - bias) < 4 * res["var_stderr"]
        # Jensen: E[sqrt(RV)] <= sqrt(E[RV]); for GBM the gap is tiny
        assert res["vol_strike"] <= math.sqrt(res["var_strike"]) + 1e-9
        assert res["vol_strike"] == pytest.approx(sig, abs=0.01)

    def test_heston_mc_matches_integrated_variance(self, key):
        T = 0.5
        mc = MCConfig(n_paths=65_536, n_steps=128, path_block=4096)
        res = varswap_mc(key, S0, T, mc, "heston", heston=HP, rate=R,
                         engine="xla")
        truth = varswap_strike(T, "heston", heston=HP)
        # Euler variance-path bias is O(dt); allow it alongside MC error
        assert abs(res["var_strike"] - truth) < 4 * res["var_stderr"] + 2e-3

    def test_merton_mc_sees_jump_variance(self, key):
        T = 1.0
        mc = MCConfig(n_paths=65_536, n_steps=64, path_block=4096)
        res = varswap_mc(key, S0, T, mc, "merton", merton=MP, rate=R,
                         engine="xla")
        truth = varswap_strike(T, "merton", merton=MP)
        assert abs(res["var_strike"] - truth) < 4 * res["var_stderr"] + 1e-3
        # and the jump contribution is the dominant surplus over sigma^2
        assert res["var_strike"] > MP.sigma**2 + 2 * res["var_stderr"]

    @pytest.mark.slow
    def test_merton_replication_strike_via_terminal_log(self, key):
        """Independent MC check of the replication closed form: estimate
        (2/T)((r-q)T - E[log(S_T/S0)]) from simulated terminal logs."""
        from options_model_tpu.pricers.american import simulate_paths
        T = 1.0
        mc = MCConfig(n_paths=262_144, n_steps=32, path_block=4096)
        S = simulate_paths(key, S0, T, mc, "merton", merton=MP, rate=R,
                           engine="xla")
        logret = np.asarray(jnp.log(S[-1] / S[0]))
        k_rep_mc = (2.0 / T) * (R * T - logret.mean())
        se = (2.0 / T) * logret.std() / math.sqrt(logret.size)
        truth = varswap_strike_replication(T, "merton", merton=MP)
        assert abs(k_rep_mc - truth) < 4 * se

    def test_stderr_is_pair_aware(self, key):
        """Antithetic pairing correlates the squared-return sums; the stderr
        must come from pair means, not raw columns — verify the reported
        stderr matches a direct pair-mean computation."""
        T = 0.5
        mc = MCConfig(n_paths=16_384, n_steps=16, path_block=4096)
        res = varswap_mc(key, S0, T, mc, "gbm", sigma=0.2, rate=R,
                         engine="xla")
        S = np.asarray(
            __import__("options_model_tpu.pricers.american",
                       fromlist=["simulate_paths"]).simulate_paths(
                key, S0, T, mc, "gbm", sigma=0.2, rate=R, engine="xla"))
        rv = (np.diff(np.log(S), axis=0) ** 2).sum(0) / T
        half = mc.path_block // 2
        blocks = rv.reshape(-1, 2, half)
        pair_means = 0.5 * (blocks[:, 0, :] + blocks[:, 1, :]).reshape(-1)
        se_direct = pair_means.std(ddof=1) / math.sqrt(pair_means.size)
        assert res["var_stderr"] == pytest.approx(se_direct, rel=1e-3)
