"""Variance Gamma family: COS closed form, exact simulation, full dispatch.

Oracle chain: the COS price validates against the Black-Scholes limit
(nu -> 0, theta = 0 — the gamma clock degenerates to deterministic time) and
the EXACT terminal sampler validates against the COS price (z-tests). The
path simulator's increments are exact over any step, so its terminal must
match the one-step sampler's law too.
"""

import jax
import jax.numpy as jnp
import pytest

from options_model_tpu.calibration.charfn import vg_cos_price
from options_model_tpu.core.config import MCConfig, OptionSpec, VGParams
from options_model_tpu.models.vg import simulate_vg, vg_terminal_exact
from options_model_tpu.pricers.american import price_american, simulate_paths
from options_model_tpu.pricers.blackscholes import bs_price
from options_model_tpu.core.config import LSMConfig

S0, K, T, R, Q = 100.0, 100.0, 1.0, 0.05, 0.01
VG = VGParams(sigma=0.18, theta=-0.14, nu=0.35)
MC = MCConfig(n_paths=1 << 16, n_steps=25, path_block=4096)
KEY = jax.random.PRNGKey(11)


class TestVGParams:
    def test_validate_rejects_non_martingale(self):
        with pytest.raises(ValueError, match="martingale"):
            VGParams(sigma=0.5, theta=2.0, nu=1.0).validate()

    def test_validate_ok(self):
        import math
        assert VG.validate() is VG
        expected = math.log(1.0 - VG.theta * VG.nu
                            - 0.5 * VG.sigma**2 * VG.nu) / VG.nu
        assert abs(VG.omega() - expected) < 1e-12


class TestVGCos:
    def test_bs_limit(self):
        p0 = VGParams(sigma=0.2, theta=0.0, nu=1e-3)
        c = float(vg_cos_price(S0, K, T, R, p0, cp=1.0))
        b = float(bs_price(S0, K, T, R, 0.2, 1.0))
        assert abs(c - b) < 2e-3  # measured 1.2e-5 (log1p charfn forms)

    def test_put_call_parity(self):
        call = float(vg_cos_price(S0, 95.0, T, R, VG, cp=1.0, q=Q))
        put = float(vg_cos_price(S0, 95.0, T, R, VG, cp=-1.0, q=Q))
        import math
        parity = S0 * math.exp(-Q * T) - 95.0 * math.exp(-R * T)
        assert abs(call - put - parity) < 2e-3

    def test_smile_skew(self):
        """theta < 0 fattens the LEFT tail: OTM-put implied vol above
        OTM-call implied vol at symmetric log-moneyness."""
        from options_model_tpu.pricers.blackscholes import implied_vol
        k_lo, k_hi = 85.0, S0 * S0 / 85.0
        p_lo = float(vg_cos_price(S0, k_lo, T, R, VG, cp=-1.0))
        p_hi = float(vg_cos_price(S0, k_hi, T, R, VG, cp=1.0))
        iv_lo = float(implied_vol(p_lo, S0, k_lo, T, R, cp=-1.0))
        iv_hi = float(implied_vol(p_hi, S0, k_hi, T, R, cp=1.0))
        assert iv_lo > iv_hi + 0.01


class TestVGSimulation:
    def test_terminal_exact_matches_cos(self):
        ST = vg_terminal_exact(KEY, S0, R - Q, T, VG, MC)
        disc = jnp.exp(-R * jnp.asarray(T, ST.dtype))
        for strike in (80.0, 100.0, 120.0):
            pay = jnp.maximum(ST - strike, 0.0) * disc
            m = float(jnp.mean(pay))
            se = float(jnp.std(pay)) / MC.n_paths**0.5
            cos = float(vg_cos_price(S0, strike, T, R, VG, cp=1.0, q=Q))
            assert abs(m - cos) < 3.5 * se, (strike, m, cos, se)

    def test_martingale(self):
        ST = vg_terminal_exact(KEY, S0, R - Q, T, VG, MC)
        m = float(jnp.mean(ST)) * float(jnp.exp(-(R - Q) * T))
        se = float(jnp.std(ST)) / MC.n_paths**0.5
        assert abs(m - S0) < 3.5 * se

    def test_path_terminal_matches_cos(self):
        """Every path increment is exact, so the 25-step terminal obeys the
        same law as the one-step sampler (no discretization bias to hide)."""
        S = simulate_paths(KEY, S0, T, MC, "vg", rate=R, vg=VG, div_yield=Q)
        assert S.shape == (MC.n_steps + 1, MC.n_paths)
        disc = jnp.exp(-R * jnp.asarray(T, S.dtype))
        pay = jnp.maximum(S[-1] - K, 0.0) * disc
        m = float(jnp.mean(pay))
        se = float(jnp.std(pay)) / MC.n_paths**0.5
        cos = float(vg_cos_price(S0, K, T, R, VG, cp=1.0, q=Q))
        assert abs(m - cos) < 3.5 * se

    def test_requires_params(self):
        with pytest.raises(ValueError, match="vg params"):
            simulate_paths(KEY, S0, T, MC, "vg", rate=R)


class TestVGEuropeanPricer:
    def test_mc_pricer_exact_terminal(self):
        from options_model_tpu.pricers.european import (make_terminal_sampler,
                                                        price_european_mc)
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=-1.0, div_yield=Q)
        sampler = make_terminal_sampler("vg", S0, R, T, vg=VG, div_yield=Q)
        price, se, _ = price_european_mc(KEY, sampler, spec, T, MC)
        cos = float(vg_cos_price(S0, K, T, R, VG, cp=-1.0, q=Q))
        assert abs(float(price) - cos) < 3.5 * float(se)


class TestVGAmerican:
    def test_american_put_above_european_with_cv(self):
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=-1.0)
        lsm = LSMConfig()
        price, se = price_american(KEY, S0, T, spec, MC, lsm, "vg", vg=VG)
        eu = float(vg_cos_price(S0, K, T, R, VG, cp=-1.0))
        assert float(price) > eu + 0.05  # early-exercise premium
        assert float(se) < 0.05

    def test_cv_reduces_stderr(self):
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=1.0, div_yield=0.04)
        lsm_cv = LSMConfig(use_control_variate=True)
        lsm_plain = LSMConfig(use_control_variate=False)
        _, se_cv = price_american(KEY, S0, T, spec, MC, lsm_cv, "vg", vg=VG)
        _, se = price_american(KEY, S0, T, spec, MC, lsm_plain, "vg", vg=VG)
        assert float(se_cv) < float(se)

    def test_richardson_runs(self):
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=-1.0)
        lsm = LSMConfig(richardson=True)
        price, se = price_american(KEY, S0, T, spec, MC, lsm, "vg", vg=VG)
        eu = float(vg_cos_price(S0, K, T, R, VG, cp=-1.0))
        assert float(price) > eu


class TestVGVarswap:
    @pytest.mark.slow
    def test_qv_strike_matches_mc(self):
        from options_model_tpu.pricers.varswap import (varswap_mc,
                                                       varswap_strike)
        k_qv = varswap_strike(1.0, "vg", vg=VG)
        assert abs(k_qv - (VG.sigma**2 + VG.nu * VG.theta**2)) < 1e-12
        mc = MCConfig(n_paths=1 << 16, n_steps=250, path_block=4096)
        out = varswap_mc(KEY, S0, 1.0, mc, "vg", rate=R, vg=VG)
        z = (out["var_strike"] - k_qv) / out["var_stderr"]
        assert abs(z) < 3.5, (out, k_qv)

    def test_replication_gap_is_third_order(self):
        """K_rep - K_qv = 2 int (e^x - 1 - x - x^2/2) levy(dx): O(nu sigma^2),
        nonzero for VG, and -> 0 as nu -> 0 (the BS limit has no gap)."""
        from options_model_tpu.pricers.varswap import (
            varswap_strike, varswap_strike_replication)
        gap = (varswap_strike_replication(1.0, "vg", vg=VG)
               - varswap_strike(1.0, "vg", vg=VG))
        assert 0.0 < abs(gap) < 0.01
        tiny = VGParams(sigma=0.2, theta=-0.1, nu=1e-4)
        gap0 = (varswap_strike_replication(1.0, "vg", vg=tiny)
                - varswap_strike(1.0, "vg", vg=tiny))
        assert abs(gap0) < 1e-5


class TestVGCalibration:
    @pytest.mark.slow
    def test_round_trip_recovers_parameters(self):
        """f64 synthetic surface -> 3-param fit; the nu multi-start + long
        COS series (2048 terms on the week-dated rung — VG's char-fn decays
        only polynomially) recover every parameter to <0.1% (measured
        sigma 3e-6, theta 7e-5, nu 1.5e-4 relative; IV RMSE 1.1e-5)."""
        import numpy as np
        from options_model_tpu.calibration.calibrator import (
            calibrate_vg_to_data)
        from options_model_tpu.calibration.synthetic import (
            create_synthetic_vg_surface)
        from options_model_tpu.core.config import CalibrationConfig

        true = VGParams(sigma=0.18, theta=-0.14, nu=0.35)
        K, Tg, iv = create_synthetic_vg_surface(true, S0=S0, rate=R,
                                                dtype=np.float64)
        cfg = CalibrationConfig(optimization_methods=("L-BFGS-B",))
        fit, summary = calibrate_vg_to_data(K, Tg, iv, S0, R, cfg)
        assert summary["error"] < 5e-4
        assert abs(fit.sigma - true.sigma) / true.sigma < 1e-3
        assert abs(fit.theta - true.theta) / abs(true.theta) < 1e-2
        assert abs(fit.nu - true.nu) / true.nu < 1e-2


class TestVGExotics:
    def test_asian_and_barrier_run(self):
        from options_model_tpu.pricers.barrier import price_barrier_mc
        from options_model_tpu.pricers.exotics import price_asian_mc
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=1.0)
        a, a_se = price_asian_mc(KEY, S0, T, spec, MC, "vg", vg=VG)
        v, v_se = price_barrier_mc(KEY, S0, T, spec, 130.0, "up-and-out",
                                   MC, "vg", vg=VG)
        eu = float(vg_cos_price(S0, K, T, R, VG, cp=1.0))
        assert 0.0 < float(a) < eu          # averaging cuts the vol
        assert 0.0 < float(v) < eu          # knockout only removes value

    def test_american_asian_vg(self):
        from options_model_tpu.pricers.american_asian import (
            price_american_asian)
        from options_model_tpu.pricers.exotics import price_asian_mc
        spec = OptionSpec(strike=K, rate=R, sigma=None, cp=-1.0)
        am, _ = price_american_asian(KEY, S0, T, spec, MC, "vg", vg=VG)
        eu, eu_se = price_asian_mc(KEY, S0, T, spec, MC, "vg", vg=VG)
        assert float(am) >= float(eu) - 2.0 * float(eu_se)


class TestVGParallel:
    """VG on the sharded grids (parallel/batch.py) and the shared-path
    curve engine — the mesh integration the other families carry."""

    @pytest.mark.slow
    def test_grid_matches_single_pricer(self):
        import numpy as np
        from options_model_tpu.parallel.batch import price_american_grid
        from options_model_tpu.parallel.mesh import make_mesh
        from options_model_tpu.pricers.american import price_american_lsm

        mesh = make_mesh(("tasks",))
        mc = MCConfig(n_paths=16384, n_steps=20, path_block=2048)
        S0s = np.array([95.0, 100.0, 105.0], np.float32)
        p, se = price_american_grid(
            KEY, S0s, np.full(3, K, np.float32), np.full(3, 0.5, np.float32),
            R, mc, mesh, model="vg", vg=VG, return_stderr=True)
        # grid task 1 folds the key by its task id — replicate that stream
        spec = OptionSpec(strike=K, rate=R, cp=-1.0)
        p1, se1 = price_american_lsm(
            jax.random.fold_in(KEY, jnp.int32(1)), 100.0, 0.5, spec, mc,
            LSMConfig(), model="vg", vg=VG, engine="xla")
        assert abs(float(p[1]) - float(p1)) < 4.0 * float(
            jnp.sqrt(se[1] ** 2 + se1 ** 2))

    @pytest.mark.slow
    def test_grid_2d_factorization_invariant(self):
        import numpy as np
        from jax.sharding import Mesh
        from options_model_tpu.parallel.batch import price_american_grid_2d

        mc = MCConfig(n_paths=16384, n_steps=16, path_block=2048)
        S0s = np.array([95.0, 100.0, 105.0], np.float32)
        Ks = np.full(3, K, np.float32)
        Ts = np.full(3, 0.5, np.float32)
        devs = np.array(jax.devices())
        p24 = price_american_grid_2d(KEY, S0s, Ks, Ts, R, mc,
                                     Mesh(devs.reshape(2, 4),
                                          ("tasks", "paths")),
                                     model="vg", vg=VG)
        p42 = price_american_grid_2d(KEY, S0s, Ks, Ts, R, mc,
                                     Mesh(devs.reshape(4, 2),
                                          ("tasks", "paths")),
                                     model="vg", vg=VG)
        # psum reduction order can flip O(1) boundary exercise decisions
        # (parallel/batch.py docstring) — agreement is statistical-tight,
        # not bitwise.
        assert float(jnp.max(jnp.abs(p24 - p42))) < 5e-3 * float(
            jnp.max(jnp.abs(p24)))

    @pytest.mark.slow
    def test_shared_path_curves_agree_with_task_per_cell(self):
        import numpy as np
        from options_model_tpu.apps.curves import (CurveRequest,
                                                   compute_curves)
        from options_model_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(("tasks",))
        base = dict(s0_list=[95.0, 100.0, 105.0], strike=K, rate=R,
                    total_points=2, intervals_per_day=1,
                    num_simulations=16384, model="vg", vg=VG, seed=11)
        df_sh = compute_curves(CurveRequest(shared_paths="on", **base), mesh)
        df_off = compute_curves(CurveRequest(shared_paths="off", **base),
                                mesh)
        m = df_sh.merge(df_off, on=["S0", "Days to Expiry"],
                        suffixes=("_sh", "_off"))
        z = ((m["Option Value_sh"] - m["Option Value_off"])
             / np.sqrt(m.StdErr_sh**2 + m.StdErr_off**2))
        assert z.abs().max() < 4.0

    def test_european_sharded_matches_cos(self):
        from options_model_tpu.parallel.batch import price_european_sharded
        from options_model_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(("paths",))
        spec = OptionSpec(strike=K, rate=R, cp=1.0)
        p, se, _ = price_european_sharded(KEY, S0, T, spec,
                                          MCConfig(n_paths=1 << 16, n_steps=1,
                                                   path_block=2048),
                                          mesh, model="vg", vg=VG)
        cos = float(vg_cos_price(S0, K, T, R, VG, cp=1.0, n_terms=4096))
        assert abs(float(p) - cos) < 4.0 * float(se)


class TestVGBracket:
    @pytest.mark.slow
    def test_bracket_contains_lsm_and_gap_small(self):
        from options_model_tpu.pricers.dual import price_american_bracket

        spec = OptionSpec(strike=K, rate=R, cp=-1.0, sigma=None)
        mc = MCConfig(n_paths=16384, n_steps=20, path_block=2048)
        br = price_american_bracket(KEY, S0, 0.5, spec, mc, model="vg",
                                    vg=VG, n_inner=32)
        lo = float(br.low) - 2 * float(br.low_stderr)
        hi = float(br.high) + 2 * float(br.high_stderr)
        assert lo < hi
        # dual gap bounds the policy suboptimality: a valid VG inner law
        # keeps it tight (a broken transition law blows the upper bound up)
        assert float(br.high) - float(br.low) < 0.06 * float(br.low)
        # the in-sample LSM point sits inside the (widened) bracket
        from options_model_tpu.pricers.american import price_american_lsm
        p, se = price_american_lsm(KEY, S0, 0.5, spec, mc, LSMConfig(),
                                   model="vg", vg=VG)
        assert lo - 2 * float(se) < float(p) < hi + 2 * float(se)


class TestVGGreeks:
    @pytest.mark.slow
    def test_cos_greeks_match_finite_differences(self):
        from options_model_tpu.pricers.greeks import cos_greeks_vg

        g = cos_greeks_vg(S0, K, T, R, VG, cp=1.0)
        eps = 0.5
        up = float(vg_cos_price(S0 + eps, K, T, R, VG, cp=1.0, n_terms=1024))
        dn = float(vg_cos_price(S0 - eps, K, T, R, VG, cp=1.0, n_terms=1024))
        mid = float(vg_cos_price(S0, K, T, R, VG, cp=1.0, n_terms=1024))
        assert abs(float(g["Delta"]) - (up - dn) / (2 * eps)) < 2e-3
        assert abs(float(g["Gamma"])
                   - (up - 2 * mid + dn) / eps**2) < 2e-3
        assert abs(float(g["Price"]) - mid) < 1e-4

    @pytest.mark.slow
    def test_bs_limit_delta(self):
        from options_model_tpu.pricers.blackscholes import bs_greeks
        from options_model_tpu.pricers.greeks import cos_greeks_vg

        vg0 = VGParams(sigma=0.2, theta=0.0, nu=1e-4)
        g = cos_greeks_vg(S0, K, T, R, vg0, cp=1.0)
        gb = bs_greeks(S0, K, T, R, 0.2, 1.0)
        assert abs(float(g["Delta"]) - float(gb["Delta"])) < 2e-3
        assert abs(float(g["Vega"]) - float(gb["Vega"])) < 2e-2


class TestVGSurface:
    def test_surface_matches_grid_point(self):
        import numpy as np
        from options_model_tpu.pricers.surface_american import (
            price_american_surface)

        mc = MCConfig(n_paths=16384, n_steps=16, path_block=2048)
        strikes = np.array([95.0, 100.0, 105.0], np.float32)
        mats = np.array([0.25, 0.5], np.float32)
        surf = price_american_surface(KEY, S0, strikes, mats, R, mc,
                                      model="vg", vg=VG)
        assert surf.shape == (2, 3)
        # monotone in strike for a put and in maturity pointwise
        assert bool(jnp.all(jnp.diff(surf, axis=1) > 0))
        assert bool(jnp.all(surf[1] >= surf[0] - 5e-3))


class TestVGQMC:
    def test_gamma_icdf_matches_scipy(self):
        import numpy as np
        from scipy.stats import gamma as sgamma
        from options_model_tpu.pricers.qmc import _gamma_icdf

        for a in (0.05, 0.5, 2.86, 50.0):
            u = np.linspace(1e-6, 0.9999, 801).astype(np.float32)
            q = np.asarray(_gamma_icdf(jnp.asarray(u), a))
            ref = sgamma.ppf(u.astype(np.float64), a)
            rel = np.abs(q - ref) / np.maximum(np.abs(ref), 1e-5)
            assert rel.max() < 5e-4, (a, rel.max())

    def test_european_rqmc_matches_cos_and_beats_mc(self):
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        from options_model_tpu.pricers.qmc import price_european_qmc

        spec = OptionSpec(strike=K, rate=R, cp=1.0)
        p, se, _ = price_european_qmc(7, "vg", S0, spec, T, vg=VG,
                                      n_paths=1 << 12, replicates=8)
        cos = float(vg_cos_price(S0, K, T, R, VG, cp=1.0, n_terms=4096))
        assert abs(float(p) - cos) < max(4.0 * float(se), 5e-3)
        s = make_terminal_sampler("vg", S0, R, T, vg=VG)
        _, se_m, _ = price_european_mc(
            jax.random.key(7), s, spec, T,
            MCConfig(n_paths=8 * (1 << 12), n_steps=1, path_block=4096))
        # exact 2-dim law: the net's stratification should win big
        assert float(se) * 5.0 < float(se_m)


class TestSobolUniformRange:
    def test_f32_cell_centers_stay_below_one(self):
        """f32's 24-bit mantissa rounds cell centers in the top 2^-25
        sliver to exactly 1.0 (ndtri -> inf) without the clamp — feed the
        generator indices that land there via an identity net."""
        import numpy as np
        from options_model_tpu.core.qmc import sobol_uniforms

        # direction vectors = single-bit columns make point i = bitrev-ish
        # gray(i); with shift all-ones the FIRST point hits the top cell.
        sv = np.zeros((1, 30), np.uint32)
        for k in range(30):
            sv[0, k] = np.uint32(1) << (29 - k)
        shift = np.array([(1 << 30) - 1], np.uint32)
        u = np.asarray(sobol_uniforms(jnp.asarray(sv), jnp.asarray(shift),
                                      0, 4))
        assert u.max() < 1.0
        assert np.isfinite(np.asarray(
            jax.scipy.special.ndtri(jnp.asarray(u)))).all()
