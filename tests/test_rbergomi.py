"""Rough Bergomi: hybrid scheme vs exact-covariance Cholesky vs the H=1/2
Markovian PDE anchor (models/rbergomi.py; no reference counterpart — the
reference's dynamics stop at Heston, options_model_3.py:214-260).

The validation chain (all three structurally independent):
  1. EXACT-BY-CONSTRUCTION identities: E[v_t] = xi0 for every t (pins the
     exponential-martingale drift eta^2/2 t^{2H} AND the scheme's variance
     normalization Var Y_t = t^{2H}); spot martingale E[e^{-rT} S_T] = S0.
  2. Hybrid vs Cholesky at the SAME grid (H=0.1, deep rough): both legs
     share the left-point price construction, so agreement isolates the
     hybrid scheme's Volterra approximation.
  3. H=1/2 limit: v is lognormal (dv = eta v dW) => alpha = sqrt(v) is SABR
     (beta=1, nu=eta/2) with deterministic drift -eta^2/8 — priced by the
     drift-extended Douglas ADI (pricers/fd_sabr.py alpha_drift). The
     driftless ADI must NOT match (proves the anchor is load-bearing).
  4. The model's signature: ATM skew ~ T^{H-1/2}.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import MCConfig, RBergomiParams
from options_model_tpu.models.rbergomi import (
    _hybrid_weights, rbergomi_european_mc, rbergomi_exact_chol,
    simulate_rbergomi)

P_ROUGH = RBergomiParams(H=0.1, eta=1.5, rho=-0.7, xi0=0.04)


class TestHybridWeights:
    def test_h_half_kernel_is_brownian(self):
        W, c1, c2, var = _hybrid_weights(16, 0.5, 1.0 / 16)
        # H = 1/2: the scheme is exact, discrete Var(Y_{t_k}) == t_k
        np.testing.assert_allclose(var, np.arange(17) / 16.0, atol=1e-12)
        # kernel == 1: every strictly-lower entry 1, exact term = the
        # increment itself
        assert c1 == pytest.approx(1.0) and c2 == pytest.approx(0.0)
        tri = np.tril(np.ones((16, 16)), -1)
        np.testing.assert_allclose(W, tri)

    def test_variance_matches_t_2h(self):
        """sum of squared scheme weights ~ Var Y_{t_k} = t_k^{2H} (the BLP
        scheme is L2-optimal per interval; <2% off at 50 steps)."""
        H, n, dt = 0.1, 50, 1.0 / 50
        W, c1, c2, var_grid = _hybrid_weights(n, H, dt)
        for k in (1, 5, 25, 50):
            row = W[k - 1, : k - 1]
            var = 2 * H * (np.sum(row**2) * dt + (c1**2) * dt + c2**2)
            assert var == pytest.approx((k * dt) ** (2 * H), rel=0.02), k
            # the returned discrete-variance grid is exactly this sum (it
            # feeds the compensator so E[v_t] = xi0 holds under the scheme)
            assert var_grid[k] == pytest.approx(var, rel=1e-12), k


class TestExactIdentities:
    def test_variance_normalization(self, key):
        """E[v_t] = xi0 at every left grid point (z < 5 with pair-mean se)."""
        cfg = MCConfig(n_paths=1 << 15, n_steps=25, path_block=4096)
        _, v = simulate_rbergomi(key, 100.0, 1.0, P_ROUGH, cfg, rate=0.05,
                                 return_paths=True, return_variance=True)
        v = np.asarray(v)  # (n_steps, paths)
        for m in (0, 1, 12, 24):
            se = v[m].std() / np.sqrt(v.shape[1]) + 1e-12
            z = (v[m].mean() - P_ROUGH.xi0) / se
            assert abs(z) < 5.0, (m, v[m].mean(), z)
        assert v[0].std() == 0.0  # Y_0 = 0: v_0 deterministic == xi0
        assert v[0, 0] == pytest.approx(P_ROUGH.xi0, rel=1e-6)

    def test_spot_martingale(self, key):
        cfg = MCConfig(n_paths=1 << 16, n_steps=50, path_block=4096)
        S_T = simulate_rbergomi(key, 100.0, 1.0, P_ROUGH, cfg, rate=0.05)
        m = np.asarray(S_T, np.float64) * np.exp(-0.05)
        z = (m.mean() - 100.0) / (m.std() / np.sqrt(m.size))
        assert abs(z) < 4.0, (m.mean(), z)

    def test_path_matrix_consistent_with_terminal(self, key):
        cfg = MCConfig(n_paths=1 << 12, n_steps=20, path_block=1024)
        S_T = simulate_rbergomi(key, 100.0, 0.5, P_ROUGH, cfg, rate=0.03)
        S = simulate_rbergomi(key, 100.0, 0.5, P_ROUGH, cfg, rate=0.03,
                              return_paths=True)
        assert S.shape == (21, S_T.shape[0])
        np.testing.assert_allclose(np.asarray(S[-1]), np.asarray(S_T),
                                   rtol=2e-5)
        assert float(jnp.min(S)) > 0.0

    def test_first_block_sharding_invariance(self, key):
        """Blocks [2,3] of a 4-block run == a 2-block run at first_block=2 —
        the global-counter RNG contract every simulator satisfies."""
        cfg4 = MCConfig(n_paths=4 * 1024, n_steps=10, path_block=1024)
        cfg2 = MCConfig(n_paths=2 * 1024, n_steps=10, path_block=1024)
        full = np.asarray(simulate_rbergomi(key, 100.0, 0.5, P_ROUGH, cfg4))
        tail = np.asarray(simulate_rbergomi(key, 100.0, 0.5, P_ROUGH, cfg2,
                                            first_block=2))
        np.testing.assert_array_equal(full[2 * 1024:], tail)


class TestOracleAgreement:
    def test_chol_cov_construction(self):
        """Quadrature Cov(Y_ti, Y_tj) matches the closed diagonal and is a
        valid correlation (|corr| <= 1, monotone in overlap)."""
        from options_model_tpu.models.rbergomi import _yy_cov
        H = 0.1
        assert _yy_cov(0.7, 0.7, H) == pytest.approx(0.7 ** (2 * H), rel=1e-12)
        c = _yy_cov(0.3, 0.7, H)
        corr = c / np.sqrt(0.3 ** (2 * H) * 0.7 ** (2 * H))
        assert 0.0 < corr < 1.0
        assert _yy_cov(0.3, 0.5, H) > c  # closer times, more overlap

    @pytest.mark.slow
    def test_hybrid_matches_exact_cholesky_rough(self, key):
        """ATM put at H=0.1, SAME 50-step grid: the hybrid scheme's
        Volterra approximation agrees with exact joint sampling within
        combined MC error (measured z ~ 0.8 at these sizes)."""
        cfg = MCConfig(n_paths=1 << 16, n_steps=50, path_block=4096)
        p_h, se_h = rbergomi_european_mc(key, 100.0, 100.0, 0.05, 1.0,
                                         P_ROUGH, cfg, cp=-1.0)
        p_c, se_c, _ = rbergomi_exact_chol(7, 100.0, 100.0, 0.05, 1.0,
                                           P_ROUGH, n_steps=50,
                                           n_paths=1 << 16, cp=-1.0)
        z = (float(p_h) - p_c) / np.hypot(float(se_h), se_c)
        assert abs(z) < 4.0, (float(p_h), p_c, z)

    @pytest.mark.slow
    def test_h_half_matches_drift_adi(self, key):
        """H=1/2: the drift-extended SABR ADI prices the Markovian limit;
        the driftless ADI must NOT (the -eta^2/8 alpha drift is
        load-bearing; measured z -0.4 vs -54)."""
        from options_model_tpu.core.config import SABRParams
        from options_model_tpu.pricers.fd_sabr import sabr_fd_price

        eta, rho, xi0 = 1.2, -0.6, 0.04
        p = RBergomiParams(H=0.5, eta=eta, rho=rho, xi0=xi0)
        cfg = MCConfig(n_paths=1 << 17, n_steps=100, path_block=4096)
        pr, se = rbergomi_european_mc(key, 100.0, 100.0, 0.05, 1.0, p,
                                      cfg, cp=-1.0)
        sp = SABRParams(alpha=float(np.sqrt(xi0)), beta=1.0, rho=rho,
                        nu=eta / 2)
        fd = sabr_fd_price(100.0, 100.0, 1.0, 0.05, sp, cp=-1.0,
                           american=False, n_f=400, n_a=160, n_t=400,
                           alpha_drift=-eta**2 / 8)
        assert abs(float(pr) - fd) < 4.5 * float(se), (float(pr), fd)
        fd0 = sabr_fd_price(100.0, 100.0, 1.0, 0.05, sp, cp=-1.0,
                            american=False, n_f=400, n_a=160, n_t=400)
        assert abs(float(pr) - fd0) > 10.0 * float(se), "drift not engaged?"


class TestRoughSignature:
    @pytest.mark.slow
    def test_atm_skew_power_law(self, key):
        """|ATM skew| ~ T^{H-1/2}: fitted log-log slope within 0.15 of
        H - 1/2 = -0.4 over T in [0.05, 1] (measured -0.42)."""
        from options_model_tpu.pricers.blackscholes import implied_vol

        Ts = [0.05, 0.1, 0.25, 0.5, 1.0]
        dk = 0.02
        skews = []
        for T in Ts:
            cfg = MCConfig(n_paths=1 << 16, n_steps=64, path_block=4096)
            ivs = []
            for K in (100 * np.exp(-dk), 100 * np.exp(dk)):
                pr, _ = rbergomi_european_mc(key, 100.0, K, 0.0, T,
                                             P_ROUGH, cfg, cp=1.0)
                ivs.append(float(implied_vol(
                    jnp.asarray(pr), 100.0, jnp.asarray(K),
                    jnp.asarray(T), 0.0, cp=1.0)))
            skews.append((ivs[1] - ivs[0]) / (2 * dk))
        assert all(s < 0 for s in skews), skews  # rho<0: negative skew
        slope = np.polyfit(np.log(Ts), np.log(np.abs(skews)), 1)[0]
        assert abs(slope - (P_ROUGH.H - 0.5)) < 0.15, (slope, skews)


class TestParamsValidation:
    def test_validate_bounds(self):
        with pytest.raises(ValueError, match="H="):
            RBergomiParams(H=0.7, eta=1.0, rho=-0.5, xi0=0.04).validate()
        with pytest.raises(ValueError, match="rho="):
            RBergomiParams(H=0.1, eta=1.0, rho=-1.5, xi0=0.04).validate()
        with pytest.raises(ValueError, match="xi0="):
            RBergomiParams(H=0.1, eta=1.0, rho=-0.5, xi0=0.0).validate()
        p = RBergomiParams(H=0.5, eta=1.0, rho=-0.5, xi0=0.04).validate()
        assert RBergomiParams.from_array(p.to_array()).H == pytest.approx(0.5)
