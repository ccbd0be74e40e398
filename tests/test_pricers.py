"""Pricing engines: European MC vs closed form, American LSM vs CRR binomial,
control variates, barrier options — BASELINE.json configs[0-2]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (
    CALL,
    PUT,
    HestonParams,
    LSMConfig,
    MCConfig,
    OptionSpec,
)
from options_model_tpu.pricers import (
    bs_price,
    crr_american,
    crr_price,
    price_american,
    price_american_lsm,
    price_american_with_control_variate,
    price_barrier_mc,
    price_european_mc,
)
from options_model_tpu.pricers.european import (
    make_terminal_sampler,
    price_european_gbm_exact,
)

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
PUT_SPEC = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
CALL_SPEC = OptionSpec(strike=K, rate=R, cp=CALL, sigma=SIG)
HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)


class TestCRROracle:
    def test_european_tree_converges_to_bs(self):
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        crr = crr_price(S0, K, T, R, SIG, cp=1.0, n_steps=4096, american=False,
                        use_native=False)
        np.testing.assert_allclose(crr, bs, rtol=2e-4)

    def test_american_put_above_european(self):
        am = crr_american(S0, K, T, R, SIG, cp=-1.0)
        eu = float(bs_price(S0, K, T, R, SIG, -1.0))
        assert am > eu

    def test_american_call_no_dividends_equals_european(self):
        am = crr_american(S0, K, T, R, SIG, cp=1.0)
        eu = float(bs_price(S0, K, T, R, SIG, 1.0))
        np.testing.assert_allclose(am, eu, rtol=5e-4)

    def test_known_value(self):
        # Widely-tabulated benchmark: American put S=36 K=40 r=6% sigma=20% T=1
        # (Longstaff-Schwartz 2001 table 1): ~4.478-4.488.
        am = crr_american(36.0, 40.0, 1.0, 0.06, 0.2, cp=-1.0, n_steps=4096)
        assert 4.47 < am < 4.50


class TestEuropeanMC:
    def test_gbm_within_stderr_of_bs(self, key):
        cfg = MCConfig(n_paths=2**17, n_steps=32, path_block=4096)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG)
        price, stderr, n = price_european_mc(key, sampler, CALL_SPEC, T, cfg)
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert abs(float(price) - bs) < 4 * float(stderr)
        assert float(stderr) < 0.05

    def test_chunking_does_not_change_price(self, key):
        cfg = MCConfig(n_paths=2**14, n_steps=16, path_block=1024)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG)
        p1, _, _ = price_european_mc(key, sampler, CALL_SPEC, T, cfg,
                                     max_paths_per_chunk=1 << 20)
        p2, _, _ = price_european_mc(key, sampler, CALL_SPEC, T, cfg,
                                     max_paths_per_chunk=2048)
        np.testing.assert_allclose(float(p1), float(p2), rtol=1e-5)

    def test_exact_terminal_gbm(self, key):
        price, stderr, _ = price_european_gbm_exact(key, S0, CALL_SPEC, T, n_paths=2**18)
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert abs(float(price) - bs) < 4 * float(stderr)

    def test_heston_put_call_parity(self, key):
        cfg = MCConfig(n_paths=2**16, n_steps=64, path_block=4096)
        sampler = make_terminal_sampler("heston", S0, R, T, heston=HESTON)
        call, _, _ = price_european_mc(key, sampler, CALL_SPEC, T, cfg)
        put, _, _ = price_european_mc(key, sampler, PUT_SPEC, T, cfg)
        # C - P = S0 - K exp(-rT), model-independent.
        np.testing.assert_allclose(float(call) - float(put),
                                   S0 - K * np.exp(-R * T), atol=0.15)


class TestAmericanLSM:
    def test_poly_put_vs_crr(self, key):
        mc = MCConfig(n_paths=2**16, n_steps=50, path_block=4096)
        lsm = LSMConfig(regressor="poly", use_control_variate=False)
        price, stderr = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(float(price) - oracle) / oracle < 0.01, (
            f"LSM {float(price):.4f} vs CRR {oracle:.4f}")

    def test_poly_put_vs_crr_with_cv(self, key):
        mc = MCConfig(n_paths=2**16, n_steps=50, path_block=4096)
        lsm = LSMConfig(regressor="poly")
        price, stderr = price_american_with_control_variate(
            key, S0, T, PUT_SPEC, mc, lsm)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(float(price) - oracle) / oracle < 0.007, (
            f"LSM+CV {float(price):.4f} vs CRR {oracle:.4f}")

    def test_american_put_above_european(self, key):
        mc = MCConfig(n_paths=2**15, n_steps=32, path_block=4096)
        lsm = LSMConfig(regressor="poly", use_control_variate=False)
        price, _ = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        eu = float(bs_price(S0, K, T, R, SIG, -1.0))
        assert float(price) > eu - 0.02

    def test_deep_itm_put_immediate_exercise(self, key):
        # S0 far below K: American put ~ intrinsic value K - S0.
        mc = MCConfig(n_paths=2**14, n_steps=32, path_block=4096)
        lsm = LSMConfig(regressor="poly", use_control_variate=False)
        price, _ = price_american_lsm(key, 60.0, T, PUT_SPEC, mc, lsm)
        assert float(price) > 39.5

    @pytest.mark.slow
    def test_nn_put_vs_crr(self, key):
        mc = MCConfig(n_paths=2**14, n_steps=25, path_block=4096)
        lsm = LSMConfig(regressor="nn", nn_epochs=8, nn_hidden=64,
                        use_control_variate=False)
        price, stderr = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=2048)
        assert abs(float(price) - oracle) / oracle < 0.03, (
            f"NN-LSM {float(price):.4f} vs CRR {oracle:.4f}")

    def test_heston_american_put_bounds(self, key):
        mc = MCConfig(n_paths=2**15, n_steps=50, path_block=4096)
        lsm = LSMConfig(regressor="poly", use_control_variate=False)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        price, _ = price_american_lsm(key, S0, T, spec, mc, lsm,
                                      model="heston", heston=HESTON)
        # v0=theta=0.04 -> vol ~20%: Heston American put should be near the
        # BS-world value, certainly within sane bounds.
        assert 3.0 < float(price) < 8.0

    def test_dispatcher_european_approximation(self, key):
        mc = MCConfig(n_paths=2**15, n_steps=32, path_block=4096)
        lsm = LSMConfig(regressor="poly", european_approximation=True)
        price, _ = price_american(key, S0, T, CALL_SPEC, mc, lsm)
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        np.testing.assert_allclose(float(price), bs, atol=0.2)

    def test_determinism(self, key):
        mc = MCConfig(n_paths=2**13, n_steps=16, path_block=4096)
        lsm = LSMConfig(regressor="poly", use_control_variate=False)
        p1, _ = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        p2, _ = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        assert float(p1) == float(p2)


class TestBarrier:
    def test_knockout_below_vanilla(self, key):
        mc = MCConfig(n_paths=2**15, n_steps=64, path_block=4096)
        ko, _ = price_barrier_mc(key, S0, T, CALL_SPEC, barrier=130.0,
                                 barrier_type="up-and-out", mc=mc)
        vanilla = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert 0.0 < float(ko) < vanilla

    def test_in_out_parity(self, key):
        # KI + KO = vanilla when priced on the same paths.
        mc = MCConfig(n_paths=2**15, n_steps=64, path_block=4096)
        ko, _ = price_barrier_mc(key, S0, T, CALL_SPEC, barrier=120.0,
                                 barrier_type="up-and-out", mc=mc)
        ki, _ = price_barrier_mc(key, S0, T, CALL_SPEC, barrier=120.0,
                                 barrier_type="up-and-in", mc=mc)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG)
        vanilla, _, _ = price_european_mc(key, sampler, CALL_SPEC, T, mc)
        np.testing.assert_allclose(float(ko) + float(ki), float(vanilla), rtol=1e-4)

    def test_distant_barrier_equals_vanilla(self, key):
        mc = MCConfig(n_paths=2**15, n_steps=32, path_block=4096)
        ko, _ = price_barrier_mc(key, S0, T, CALL_SPEC, barrier=1e6,
                                 barrier_type="up-and-out", mc=mc)
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        assert abs(float(ko) - bs) < 0.2

    def test_bad_barrier_type(self, key):
        with pytest.raises(ValueError):
            price_barrier_mc(key, S0, T, CALL_SPEC, barrier=120.0,
                             barrier_type="sideways", mc=MCConfig(n_paths=256))


class TestBarrierContinuityCorrection:
    """Brownian-bridge continuity correction vs the Reiner-Rubinstein
    closed form (VERDICT r2 next #8): at 50 monitoring steps the corrected
    estimator must sit within MC error of the continuous price, while the
    discrete estimator carries the O(1/sqrt(steps)) monitoring bias
    (measured: 15-45 sigma off on these workloads)."""

    CASES = [("up-and-out", 120.0, 1.0), ("down-and-out", 85.0, -1.0),
             ("up-and-in", 115.0, 1.0), ("down-and-in", 90.0, -1.0)]

    @pytest.mark.parametrize("btype,B,cp", CASES)
    def test_matches_reiner_rubinstein(self, key, btype, B, cp):
        from options_model_tpu.pricers.barrier import barrier_price_rr

        spec = CALL_SPEC if cp > 0 else PUT_SPEC
        mc = MCConfig(n_paths=2**18, n_steps=50, path_block=4096)
        rr = float(barrier_price_rr(S0, K, T, R, SIG, B, btype, cp=cp))
        p, se = price_barrier_mc(key, S0, T, spec, barrier=B,
                                 barrier_type=btype, mc=mc,
                                 continuity_correction=True)
        assert abs(float(p) - rr) < 4.0 * max(float(se), 1e-4), (
            f"{btype}: corrected {float(p)} vs RR {rr} (se {float(se)})")
        # the uncorrected discrete estimator must show the monitoring bias
        p_d, _ = price_barrier_mc(key, S0, T, spec, barrier=B,
                                  barrier_type=btype, mc=mc)
        assert abs(float(p_d) - rr) > abs(float(p) - rr)

    def test_correction_requires_gbm_sigma(self, key):
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        with pytest.raises(ValueError, match="continuity_correction"):
            price_barrier_mc(key, S0, T,
                             OptionSpec(strike=K, rate=R, cp=1.0, sigma=None),
                             barrier=120.0, barrier_type="up-and-out",
                             mc=MCConfig(n_paths=512, path_block=256),
                             model="heston", heston=hp,
                             continuity_correction=True)

    def test_rr_in_out_parity_and_limits(self):
        from options_model_tpu.pricers.barrier import barrier_price_rr

        ko = float(barrier_price_rr(S0, K, T, R, SIG, 120.0, "up-and-out"))
        ki = float(barrier_price_rr(S0, K, T, R, SIG, 120.0, "up-and-in"))
        bs = float(bs_price(S0, K, T, R, SIG, 1.0))
        np.testing.assert_allclose(ko + ki, bs, rtol=1e-5)
        # distant barrier: KO -> vanilla
        far = float(barrier_price_rr(S0, K, T, R, SIG, 1e4, "up-and-out"))
        np.testing.assert_allclose(far, bs, rtol=1e-4)
        with pytest.raises(ValueError, match="safe side"):
            barrier_price_rr(S0, K, T, R, SIG, 90.0, "up-and-out")


class TestReplayLSM:
    """Matrix-free LSM via RNG-counter rematerialization (pricers/replay.py)."""

    def test_matches_stored_matrix_pricer(self, key):
        from options_model_tpu.pricers.american import lsm_poly_backward, simulate_paths
        from options_model_tpu.pricers.replay import price_american_lsm_gbm_replay

        mc = MCConfig(n_paths=2**14, n_steps=25, path_block=4096)
        p_replay, se_replay = price_american_lsm_gbm_replay(
            key, S0, T, PUT_SPEC, mc)
        S_paths = simulate_paths(key, S0, T, mc, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        # like-for-like error accounting: the replay default is pair-aware
        # (derived from mc), so give the stored-matrix pricer the same unit
        p_stored, se_stored = lsm_poly_backward(
            S_paths, PUT_SPEC, T, stat_pair_block=mc.path_block)
        # identical streams; f32 replay roundoff can flip a handful of
        # boundary exercise decisions (~2e-4 on the price), nothing more
        np.testing.assert_allclose(float(p_replay), float(p_stored), rtol=1e-3)
        np.testing.assert_allclose(float(se_replay), float(se_stored), rtol=5e-3)

    def test_accuracy_vs_crr(self, key):
        from options_model_tpu.pricers.replay import price_american_lsm_gbm_replay

        mc = MCConfig(n_paths=2**16, n_steps=50, path_block=4096)
        price, _ = price_american_lsm_gbm_replay(key, S0, T, PUT_SPEC, mc)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(float(price) - oracle) / oracle < 0.01

    def test_path_reconstruction_exact(self, key):
        # Reverse replay must recover every intermediate row of the forward
        # matrix to f32 roundoff.
        import jax
        import jax.numpy as jnp
        from options_model_tpu.models.gbm import gbm_step_normals, simulate_gbm

        mc = MCConfig(n_paths=2048, n_steps=10, path_block=1024)
        S = simulate_gbm(key, S0, R, SIG, T, mc, return_paths=True)
        dt = T / mc.n_steps
        drift = (R - 0.5 * SIG**2) * dt
        diffusion = SIG * np.sqrt(dt)
        S_prev = S[-1]
        for t in range(mc.n_steps - 1, 0, -1):
            z = gbm_step_normals(key, t, mc)
            S_prev = S_prev * jnp.exp(-(drift + diffusion * z))
            np.testing.assert_allclose(np.asarray(S_prev), np.asarray(S[t]),
                                       rtol=5e-6)


class TestPolyDegree:
    def test_degree_knob(self, key):
        # degree 2 (the v1 default) still prices within 1.5% of CRR
        mc = MCConfig(n_paths=2**15, n_steps=32, path_block=4096)
        lsm = LSMConfig(regressor="poly", poly_degree=2, use_control_variate=False)
        price, _ = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=2048)
        assert abs(float(price) - oracle) / oracle < 0.015

    def test_bad_degree_rejected(self):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            LSMConfig(poly_degree=0).validate()


class TestOutOfSampleLSM:
    def test_low_biased_and_accurate(self, key):
        from options_model_tpu.pricers.american import (
            lsm_poly_backward, simulate_paths)

        mc = MCConfig(n_paths=2**17, n_steps=50, path_block=4096)
        S_paths = simulate_paths(key, S0, T, mc, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        p_in, _ = lsm_poly_backward(S_paths, PUT_SPEC, T)
        p_oos, se = lsm_poly_backward(S_paths, PUT_SPEC, T, out_of_sample=True,
                                      pair_block=4096)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        # OOS estimator is low-biased: must not exceed the in-sample estimate
        # by more than MC noise, and must stay within 1% of CRR.
        assert float(p_oos) <= float(p_in) + 3 * float(se)
        assert abs(float(p_oos) - oracle) / oracle < 0.01

    def test_config_plumb(self, key):
        mc = MCConfig(n_paths=2**14, n_steps=16, path_block=4096)
        lsm = LSMConfig(regressor="poly", out_of_sample=True,
                        use_control_variate=False)
        p, _ = price_american_lsm(key, S0, T, PUT_SPEC, mc, lsm)
        assert np.isfinite(float(p))


class TestOOSPairIntegrity:
    def test_split_respects_antithetic_pairs(self):
        from options_model_tpu.pricers.american import oos_masks
        # one block of 1024: pairs (j, j+512) must share a side
        train, ev = oos_masks(4096, 1024)
        train = np.asarray(train)
        for b in range(4):
            blk = train[b * 1024:(b + 1) * 1024]
            assert (blk == blk[0]).all()  # whole block on one side
        assert train.sum() == 2048  # balanced for even block count

    def test_requires_pair_block(self, key):
        from options_model_tpu.pricers.american import lsm_poly_backward
        S = jnp.ones((5, 2048))
        with pytest.raises(ValueError):
            lsm_poly_backward(S, PUT_SPEC, T, out_of_sample=True)

    @pytest.mark.slow
    def test_nn_oos_supported(self, key):
        # r2 rejected the nn regressor here; r3 trains the net on alternating
        # path blocks and prices on the rest (lsm_nn_backward out_of_sample).
        from options_model_tpu.pricers.american import (
            lsm_nn_backward, simulate_paths)

        mc = MCConfig(n_paths=8 * 2048, n_steps=12, path_block=1024)
        S_paths = simulate_paths(key, S0, T, mc, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        lsm = LSMConfig(regressor="nn", nn_epochs=3, nn_hidden=16, nn_layers=1)
        fit_key = jax.random.fold_in(key, 7)
        p_in, _ = lsm_nn_backward(fit_key, S_paths, PUT_SPEC, T, lsm)
        p_oos, se = lsm_nn_backward(fit_key, S_paths, PUT_SPEC, T, lsm,
                                    out_of_sample=True,
                                    pair_block=mc.path_block)
        # the low-biased OOS estimate sits below-or-near the in-sample one
        assert float(p_oos) <= float(p_in) + 4.0 * float(se)
        # the split must respect antithetic pairing
        with pytest.raises(ValueError, match="pair_block"):
            lsm_nn_backward(fit_key, S_paths, PUT_SPEC, T, lsm,
                            out_of_sample=True)

    def test_nn_richardson_single_block_rejected(self, key):
        """richardson_nn_stat must enforce the same >= 2 path blocks guard as
        lsm_nn_backward: with one block the OOS split degenerates to
        train=all/eval=none and the estimator would confidently report
        0.0 +/- 0.0 (review fix)."""
        from options_model_tpu.pricers.american import (
            richardson_nn_stat, simulate_paths)

        mc = MCConfig(n_paths=1024, n_steps=12, path_block=1024)
        S_paths = simulate_paths(key, S0, T, mc, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        lsm = LSMConfig(regressor="nn", nn_epochs=2, nn_hidden=8, nn_layers=1,
                        out_of_sample=True, richardson=True)
        with pytest.raises(ValueError, match="two path blocks"):
            richardson_nn_stat(jax.random.fold_in(key, 7), S_paths, None,
                               PUT_SPEC, T, lsm, pair_block=mc.path_block)

    def test_bad_grid_mode_rejected(self):
        from options_model_tpu.apps.curves import CurveRequest, compute_curves
        req = CurveRequest(s0_list=[100.0], strike=100.0, rate=0.05,
                           grid_mode="Trading", total_points=1,
                           num_simulations=1024, sigma=0.2)
        with pytest.raises(ValueError):
            compute_curves(req)


class TestRichardson:
    def test_beats_plain_lsm_vs_crr(self, key):
        from options_model_tpu.pricers.american import price_american_richardson

        mc = MCConfig(n_paths=2**17, n_steps=50, path_block=4096)
        lsm = LSMConfig(regressor="poly")
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        p_rich, se = price_american_richardson(key, S0, T, PUT_SPEC, mc, lsm)
        # the 50-date Bermudan gap alone is -0.13%; extrapolation must land
        # within noise of the continuous price
        assert abs(float(p_rich) - oracle) / oracle < 0.004
        assert float(se) < 0.02

    def test_exercise_stride_prices_coarser_bermudan(self, key):
        from options_model_tpu.pricers.american import (
            lsm_poly_backward, simulate_paths)

        mc = MCConfig(n_paths=2**16, n_steps=50, path_block=4096)
        S_paths = simulate_paths(key, S0, T, mc, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        p_fine, _ = lsm_poly_backward(S_paths, PUT_SPEC, T)
        p_coarse, _ = lsm_poly_backward(S_paths, PUT_SPEC, T, exercise_stride=2)
        # fewer exercise rights -> cheaper option (same paths: near-exact order)
        assert float(p_coarse) <= float(p_fine) + 1e-4


class TestHestonControlVariate:
    def test_cos_leg_reduces_stderr(self, key):
        """The COS closed-form leg extends the beta=1 CV to Heston in the
        single-point pricer; ATM stderr shrinks, price stays consistent."""
        from options_model_tpu.core.config import (
            PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)
        from options_model_tpu.pricers import price_american

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        mc = MCConfig(n_paths=65536, n_steps=20, path_block=4096)
        p_cv, s_cv = price_american(key, 105.0, 0.5, spec, mc,
                                    LSMConfig(use_control_variate=True),
                                    model="heston", heston=hp, engine="xla")
        p, s = price_american(key, 105.0, 0.5, spec, mc,
                              LSMConfig(use_control_variate=False),
                              model="heston", heston=hp, engine="xla")
        assert float(s_cv) < float(s)
        assert abs(float(p_cv) - float(p)) < 6.0 * float(s)

    def test_richardson_heston_cv(self, key):
        from options_model_tpu.core.config import (
            PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)
        from options_model_tpu.pricers.american import (
            price_american_richardson)

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        mc = MCConfig(n_paths=32768, n_steps=20, path_block=4096)
        p, se = price_american_richardson(key, 100.0, 0.5, spec, mc,
                                          LSMConfig(), model="heston",
                                          heston=hp, engine="xla")
        assert np.isfinite(float(p)) and float(se) > 0

    def test_cv_leg_keyed_on_model_not_sigma(self, key):
        """REGRESSION (review r2, confirmed ~130% bias): Heston dynamics with
        a spec that happens to carry a constant sigma must still use the COS
        leg — a BS leg under Heston paths shifts the price by
        E[BS - EU_heston] behind an unchanged tiny stderr."""
        from options_model_tpu.core.config import (
            PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)
        from options_model_tpu.pricers import price_american

        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        mc = MCConfig(n_paths=32768, n_steps=20, path_block=4096)
        # sigma WILDLY wrong for the dynamics: if the BS leg were used the
        # price would shift by several units.
        spec_sig = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.40)
        spec_none = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        p_sig, _ = price_american(key, 100.0, 1.0, spec_sig, mc,
                                  LSMConfig(use_control_variate=True),
                                  model="heston", heston=hp, engine="xla")
        p_ref, se = price_american(key, 100.0, 1.0, spec_none, mc,
                                   LSMConfig(use_control_variate=True),
                                   model="heston", heston=hp, engine="xla")
        assert abs(float(p_sig) - float(p_ref)) < 6.0 * float(se) + 0.02
