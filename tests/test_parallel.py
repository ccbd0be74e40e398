"""Distributed pricing on the virtual 8-device CPU mesh: task grids, sharded
paths with exact psum equivalence, device-count invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import (
    PUT,
    HestonParams,
    LSMConfig,
    MCConfig,
    OptionSpec,
)
from options_model_tpu.parallel import (
    make_mesh,
    price_american_grid,
    price_american_sharded_paths,
    price_european_sharded,
)
from options_model_tpu.pricers import bs_price, crr_american, price_american_lsm
from options_model_tpu.pricers.american import lsm_poly_backward, simulate_paths
from options_model_tpu.pricers.european import make_terminal_sampler, price_european_mc

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
PUT_SPEC = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)
HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)


class TestMesh:
    def test_make_mesh_default(self, devices8):
        mesh = make_mesh()
        assert mesh.devices.size >= 8
        assert mesh.axis_names == ("tasks",)

    def test_make_mesh_2d(self, devices8):
        mesh = make_mesh(("grid", "paths"), shape=(2, 4), devices=devices8)
        assert mesh.devices.shape == (2, 4)

    def test_bad_shape_raises(self, devices8):
        with pytest.raises(ValueError):
            make_mesh(("a",), shape=(3,), devices=devices8)


class TestEuropeanSharded:
    def test_matches_unsharded(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 2048, n_steps=16, path_block=1024)
        mean_s, se_s, n_s = price_european_sharded(
            key, S0, T, PUT_SPEC, cfg, mesh)
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG, engine="xla")
        mean_u, se_u, n_u = price_european_mc(key, sampler, PUT_SPEC, T, cfg)
        # identical global block ids -> identical streams -> same price
        np.testing.assert_allclose(float(mean_s), float(mean_u), rtol=1e-5)
        assert int(n_s) == int(n_u)

    def test_heston_sharded_close_to_cos(self, key, devices8):
        from options_model_tpu.calibration import heston_cos_price

        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 8192, n_steps=64, path_block=1024)
        spec = OptionSpec(strike=K, rate=R, cp=1.0, sigma=None)
        mean, se, _ = price_european_sharded(key, S0, T, spec, cfg, mesh,
                                             model="heston", heston=HESTON)
        cos = float(heston_cos_price(S0, K, T, R, HESTON, 1.0))
        assert abs(float(mean) - cos) < max(4 * float(se), 0.05)


class TestAmericanShardedPaths:
    def test_matches_unsharded_exactly(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 2048, n_steps=20, path_block=1024)
        p_s, se_s = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg, mesh)

        S_paths = simulate_paths(key, S0, T, cfg, "gbm", sigma=SIG, rate=R,
                                 engine="xla")
        p_u, se_u = lsm_poly_backward(S_paths, PUT_SPEC, T)
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        np.testing.assert_allclose(float(se_s), float(se_u), rtol=1e-3)

    def test_accuracy_vs_crr(self, key, devices8):
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 8192, n_steps=50, path_block=1024)
        price, _ = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg, mesh)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        assert abs(float(price) - oracle) / oracle < 0.01


class TestAmericanGrid:
    def test_grid_prices_sane(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        S0s = jnp.array([90.0, 95.0, 100.0, 105.0, 110.0] * 2)
        Ks = jnp.full((10,), K)
        Ts = jnp.full((10,), T)
        cfg = MCConfig(n_paths=4096, n_steps=20, path_block=1024)
        prices = price_american_grid(key, S0s, Ks, Ts, R, cfg, mesh,
                                     cp=-1.0, sigma=SIG, engine="xla")
        assert prices.shape == (10,)
        p = np.asarray(prices)
        # put value decreasing in S0
        assert p[0] > p[2] > p[4]
        # duplicate tasks at different global indices use different streams but
        # must agree within MC noise
        np.testing.assert_allclose(p[:5], p[5:], atol=0.5)

    def test_nonmultiple_task_count(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 11  # not a multiple of 8
        S0s = jnp.linspace(90.0, 110.0, n)
        cfg = MCConfig(n_paths=2048, n_steps=10, path_block=1024)
        prices = price_american_grid(key, S0s, jnp.full((n,), K),
                                     jnp.full((n,), T), R, cfg, mesh,
                                     cp=-1.0, sigma=SIG, engine="xla")
        assert prices.shape == (n,)
        assert np.all(np.isfinite(np.asarray(prices)))

    @pytest.mark.slow
    def test_nn_grid_honors_grid_level_oos(self, key, devices8):
        """The grid-level lsm_out_of_sample flag must reach the NN branch
        exactly like the poly branch (review fix: it silently priced
        in-sample — the foresight-biased estimator — before)."""
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 2
        args = (key, jnp.full((n,), S0), jnp.full((n,), K), jnp.full((n,), T),
                R, MCConfig(n_paths=2048, n_steps=10, path_block=256), mesh)
        kw = dict(cp=-1.0, sigma=SIG, engine="xla")
        nn = LSMConfig(regressor="nn", nn_epochs=2, nn_hidden=8, nn_layers=1)
        p_flag = price_american_grid(*args, lsm=nn, lsm_out_of_sample=True,
                                     **kw)
        p_cfg = price_american_grid(*args, lsm=nn.replace(out_of_sample=True),
                                    **kw)
        p_ins = price_american_grid(*args, lsm=nn, **kw)
        # both spellings request the same estimator -> identical programs
        np.testing.assert_array_equal(np.asarray(p_flag), np.asarray(p_cfg))
        # and it is NOT the in-sample estimator
        assert not np.array_equal(np.asarray(p_flag), np.asarray(p_ins))

    def test_heston_grid(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 8
        S0s = jnp.linspace(95.0, 105.0, n)
        cfg = MCConfig(n_paths=4096, n_steps=20, path_block=1024)
        prices = price_american_grid(key, S0s, jnp.full((n,), K),
                                     jnp.full((n,), T), R, cfg, mesh,
                                     cp=-1.0, sigma=None, heston=HESTON,
                                     model="heston", engine="xla")
        assert np.all(np.isfinite(np.asarray(prices)))
        assert np.all(np.diff(np.asarray(prices)) < 0.5)  # roughly decreasing


class TestGrid2D:
    """Combined task x path sharding (VERDICT r1 #7): grid tasks on one mesh
    axis, each task's paths psum-reduced on the other. Prices must equal the
    unsharded computation and be invariant across mesh factorizations."""

    def _price(self, key, mesh_shape, devices, **kw):
        from options_model_tpu.parallel import price_american_grid_2d
        mesh = make_mesh(("tasks", "paths"), shape=mesh_shape,
                         devices=devices)
        S0s = np.array([95.0, 100.0, 105.0, 110.0], np.float32)
        Ks = np.full(4, K, np.float32)
        Ts = np.full(4, T, np.float32)
        mc = MCConfig(n_paths=16384, n_steps=10, path_block=2048)
        return price_american_grid_2d(key, S0s, Ks, Ts, R, mc, mesh, cp=PUT,
                                      sigma=SIG, model="gbm",
                                      return_stderr=True, **kw)

    # Tolerance note: the per-task RNG streams are bitwise mesh-invariant,
    # but the psum'ed f32 regression Grams round differently under different
    # program structures; a boundary exercise decision that flips swaps that
    # path's realized (not expected) cash — O(1) per path, so LSM prices
    # intrinsically wobble ~1e-3 relative across equivalent compilations.
    # The DETERMINISM contract (same mesh, same call -> same bits) is tested
    # separately below.

    @pytest.mark.slow
    def test_mesh_shape_invariance(self, key, devices8):
        p18, s18 = self._price(key, (1, 8), devices8)
        p24, s24 = self._price(key, (2, 4), devices8)
        p42, s42 = self._price(key, (4, 2), devices8)
        np.testing.assert_allclose(np.asarray(p18), np.asarray(p24),
                                   rtol=3e-3)
        np.testing.assert_allclose(np.asarray(p18), np.asarray(p42),
                                   rtol=3e-3)
        np.testing.assert_allclose(np.asarray(s18), np.asarray(s24),
                                   rtol=0.05)

    def test_deterministic_rerun(self, key, devices8):
        p1, s1 = self._price(key, (2, 4), devices8)
        p2, s2 = self._price(key, (2, 4), devices8)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_matches_unsharded(self, key, devices8):
        prices, _ = self._price(key, (2, 4), devices8)
        # Unsharded reference: same per-task fold_in + same global path count.
        mc = MCConfig(n_paths=16384, n_steps=10, path_block=2048)
        for i, s0 in enumerate([95.0, 100.0, 105.0, 110.0]):
            task_key = jax.random.fold_in(key, i)
            S_paths = simulate_paths(task_key, s0, T, mc, "gbm", sigma=SIG,
                                     rate=R, engine="xla")
            ref, _ = lsm_poly_backward(S_paths, PUT_SPEC, T,
                                       stat_pair_block=mc.path_block)
            assert abs(float(prices[i]) / float(ref) - 1.0) < 3e-3, (
                f"task {i}: 2-D {float(prices[i])} vs unsharded {float(ref)}")

    def test_control_variate_branch(self, key, devices8):
        p_cv, s_cv = self._price(key, (2, 4), devices8,
                                 use_control_variate=True)
        p, s = self._price(key, (2, 4), devices8)
        # The beta=1 CV (reference semantics) shrinks the error where the
        # European leg correlates with the American cash — ATM/OTM tasks; a
        # deep-ITM put's mostly-early-exercised cash correlates weakly, so
        # the variate can ADD its own variance there. Assert the OTM tasks
        # improve and prices stay consistent.
        assert float(s_cv[-1]) < float(s[-1])  # S0=110 OTM put
        assert float(s_cv[-2]) < float(s[-2])  # S0=105
        np.testing.assert_allclose(np.asarray(p_cv), np.asarray(p),
                                   atol=0.15)

    def test_accuracy_vs_crr(self, key, devices8):
        prices, _ = self._price(key, (4, 2), devices8,
                                use_control_variate=True)
        for i, s0 in enumerate([95.0, 100.0, 105.0, 110.0]):
            oracle = crr_american(float(s0), K, T, R, SIG, cp=-1.0,
                                  n_steps=1024)
            # 10 exercise dates => Bermudan gap dominates; loose band.
            assert abs(float(prices[i]) / oracle - 1.0) < 0.02

    def test_nn_regressor_rejected(self, key, devices8):
        with pytest.raises(ValueError, match="poly"):
            self._price(key, (2, 4), devices8,
                        lsm=LSMConfig(regressor="nn"))

    def test_oos_rejected(self, key, devices8):
        with pytest.raises(ValueError, match="out_of_sample"):
            self._price(key, (2, 4), devices8,
                        lsm=LSMConfig(out_of_sample=True))

    def test_localvol_rejected(self, key, devices8):
        from options_model_tpu.parallel import price_american_grid_2d
        mesh = make_mesh(("tasks", "paths"), shape=(2, 4), devices=devices8)
        with pytest.raises(ValueError, match="gbm/heston"):
            price_american_grid_2d(
                key, np.array([100.0], np.float32),
                np.array([100.0], np.float32), np.array([0.5], np.float32),
                R, MCConfig(n_paths=2048, path_block=256), mesh,
                model="localvol")

    def test_european_approximation(self, key, devices8):
        """European terminal-payoff shortcut with path-axis psum: must match
        the unsharded discounted-payoff mean on the same global stream."""
        from options_model_tpu.core.payoff import vanilla_payoff
        from options_model_tpu.core.stats import masked_mean_stderr

        p2d, s2d = self._price(key, (2, 4), devices8,
                               european_approximation=True)
        mc = MCConfig(n_paths=16384, n_steps=10, path_block=2048)
        for i, s0 in enumerate([95.0, 100.0, 105.0, 110.0]):
            task_key = jax.random.fold_in(key, i)
            S_paths = simulate_paths(task_key, s0, T, mc, "gbm", sigma=SIG,
                                     rate=R, engine="xla")
            pay = vanilla_payoff(S_paths[-1], K, PUT) * np.exp(-R * T)
            ref, se_ref, _ = masked_mean_stderr(pay, None, None,
                                                mc.path_block)
            np.testing.assert_allclose(float(p2d[i]), float(ref), rtol=1e-5)
            np.testing.assert_allclose(float(s2d[i]), float(se_ref),
                                       rtol=1e-3)


class TestGrid2DHeston:
    """The Heston + variance-basis branch of the 2-D mesh pricer (VERDICT r2
    weak #5): 7-column Grams psum across the path axis; the (S, v) basis and
    the COS control variate must survive sharding."""

    # xi=0.3 keeps Feller satisfied: at the coarse 10-step Euler grid a
    # Feller-violating xi makes the COS control-variate leg's exact European
    # price visibly differ from the SIMULATED European component, which reads
    # as a CV "bias" that is really sim discretization error.
    HP = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    S0S = [95.0, 100.0, 105.0, 110.0]
    MC2 = MCConfig(n_paths=16384, n_steps=10, path_block=2048)

    def _price(self, key, mesh_shape, devices, **kw):
        from options_model_tpu.parallel import price_american_grid_2d
        mesh = make_mesh(("tasks", "paths"), shape=mesh_shape,
                         devices=devices)
        S0s = np.array(self.S0S, np.float32)
        Ks = np.full(4, K, np.float32)
        Ts = np.full(4, T, np.float32)
        return price_american_grid_2d(key, S0s, Ks, Ts, R, self.MC2, mesh,
                                      cp=PUT, heston=self.HP, model="heston",
                                      return_stderr=True, **kw)

    @pytest.mark.slow
    def test_mesh_shape_invariance(self, key, devices8):
        p18, _ = self._price(key, (1, 8), devices8)
        p24, s24 = self._price(key, (2, 4), devices8)
        p42, _ = self._price(key, (4, 2), devices8)
        np.testing.assert_allclose(np.asarray(p18), np.asarray(p24),
                                   rtol=3e-3)
        np.testing.assert_allclose(np.asarray(p18), np.asarray(p42),
                                   rtol=3e-3)
        assert np.all(np.asarray(s24) > 0)

    def test_matches_unsharded_variance_basis(self, key, devices8):
        """The psum'ed 7-column Gram path must reproduce the unsharded
        (S, v)-basis backward, not silently fall back to S-only."""
        prices, _ = self._price(key, (2, 4), devices8)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        for i, s0 in enumerate(self.S0S):
            task_key = jax.random.fold_in(key, i)
            S_paths, v_paths = simulate_paths(
                task_key, s0, T, self.MC2, "heston", rate=R, heston=self.HP,
                engine="xla", return_variance=True)
            ref, _ = lsm_poly_backward(S_paths, spec, T, v_paths=v_paths,
                                       stat_pair_block=self.MC2.path_block)
            assert abs(float(prices[i]) / float(ref) - 1.0) < 3e-3, (
                f"task {i}: 2-D {float(prices[i])} vs unsharded {float(ref)}")

    def test_cos_control_variate_on_mesh(self, key, devices8):
        p_cv, s_cv = self._price(key, (2, 4), devices8,
                                 use_control_variate=True)
        p, s = self._price(key, (2, 4), devices8)
        assert float(s_cv[-1]) < float(s[-1])  # OTM put: variate bites
        np.testing.assert_allclose(np.asarray(p_cv), np.asarray(p), atol=0.15)

    def test_richardson_on_mesh(self, key, devices8):
        p, s = self._price(key, (2, 4), devices8,
                           use_control_variate=True,
                           lsm=LSMConfig(richardson=True))
        assert np.all(np.isfinite(np.asarray(p)))
        # extrapolation closes part of the Bermudan gap: price above the
        # plain estimate under the SAME control variate
        p_plain, _ = self._price(key, (2, 4), devices8,
                                 use_control_variate=True)
        assert float(p[1]) > float(p_plain[1]) - 0.02

    def test_agrees_with_fd_oracle(self, key, devices8):
        """ATM task vs the ADI finite-difference oracle — the accuracy
        anchor for the headline Heston-American workload on the 2-D mesh."""
        from options_model_tpu.pricers.fd_heston import heston_fd_price

        mc = MCConfig(n_paths=65536, n_steps=50, path_block=4096)
        mesh = make_mesh(("tasks", "paths"), shape=(2, 4), devices=devices8)
        from options_model_tpu.parallel import price_american_grid_2d
        S0s = np.array([100.0, 100.0], np.float32)
        prices = price_american_grid_2d(
            key, S0s, np.full(2, K, np.float32), np.full(2, T, np.float32),
            R, mc, mesh, cp=PUT, heston=self.HP, model="heston",
            use_control_variate=True)
        oracle = float(heston_fd_price(100.0, K, T, R, self.HP, cp=-1.0,
                                       american=True))
        # 50 exercise dates: Bermudan gap ~0.3%; band covers gap + MC noise
        assert abs(float(prices[0]) / oracle - 1.0) < 0.01


class TestGridRichardson:
    def test_richardson_shrinks_bermudan_gap(self, key, devices8):
        """--richardson through the grid pricer attacks the n-date Bermudan
        gap. At 16 exercise dates the plain LSM sits ~1.5% below CRR; the
        fine/coarse levels share paths, so the extrapolation's UPLIFT over
        the plain price is a low-noise common-path statistic (measured:
        plain -1.50%, richardson -0.97% on this workload — higher-order
        terms remain at such coarse date grids; at 40+ dates both are
        noise-level)."""
        mesh = make_mesh(("tasks",), devices=devices8)
        cfg = MCConfig(n_paths=65536, n_steps=16, path_block=4096)
        kw = dict(cp=PUT, sigma=SIG, model="gbm", engine="xla",
                  use_control_variate=True)
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=4096)
        p_rich = price_american_grid(
            key, np.array([S0]), np.array([K]), np.array([T]), R, cfg, mesh,
            lsm=LSMConfig(richardson=True), **kw)
        p_plain = price_american_grid(
            key, np.array([S0]), np.array([K]), np.array([T]), R, cfg, mesh,
            lsm=LSMConfig(), **kw)
        # the plain 16-date price shows the documented Bermudan gap...
        assert float(p_plain[0]) / oracle - 1.0 < -0.008
        # ...and the common-path extrapolation recovers a real part of it
        assert float(p_rich[0]) > float(p_plain[0])
        assert abs(float(p_rich[0]) / oracle - 1.0) < abs(
            float(p_plain[0]) / oracle - 1.0)

    def test_richardson_nn_config_valid(self):
        # r2 rejected this combination; r3 supports it (richardson_nn_stat).
        cfg = LSMConfig(regressor="nn", richardson=True).validate()
        assert cfg.richardson and cfg.regressor == "nn"

    def test_cli_richardson_flag(self):
        from options_model_tpu.apps.cli import parse_args, run
        args = parse_args([
            "--spot", "100", "--hist-vol", "0.2", "--K", "100",
            "--model", "bs", "--richardson", "--num-simulations", "8192",
            "--s0-start", "100", "--s0-end", "100", "--total-points", "1",
            "--intervals-per-day", "1", "--engine", "xla",
            "--option-type", "put"])
        out = run(args)
        assert np.isfinite(out["bs"]["Option Value"]).all()

    def test_richardson_on_2d_mesh(self, key, devices8):
        """Richardson now runs on the 2-D mesh: psum'ed fine/coarse levels
        match the 1-D grid pricer's extrapolation within decision-flip
        tolerance, and recover part of the Bermudan gap."""
        from options_model_tpu.parallel import price_american_grid_2d
        mesh2d = make_mesh(("tasks", "paths"), shape=(1, 8), devices=devices8)
        mesh1d = make_mesh(("tasks",), devices=devices8[:1])
        cfg = MCConfig(n_paths=65536, n_steps=16, path_block=4096)
        arrs = (np.array([S0]), np.array([K]), np.array([T]))
        kw = dict(cp=PUT, sigma=SIG, model="gbm",
                  use_control_variate=True, lsm=LSMConfig(richardson=True))
        p2d = price_american_grid_2d(key, *arrs, R, cfg, mesh2d, **kw)
        p1d = price_american_grid(key, *arrs, R, cfg, mesh1d, engine="xla",
                                  **kw)
        np.testing.assert_allclose(float(p2d[0]), float(p1d[0]), rtol=3e-3)


class TestGridJumpFamilies:
    """Jump families on the sharded grids (1-D task axis and the 2-D
    task x path mesh). The compound-jump draws key per GLOBAL path block
    (models/{merton,bates}.py), so 2-D results must be invariant to the mesh
    factorization and match the unsharded backward on the same streams."""

    from options_model_tpu.core.config import BatesParams, MertonParams
    MP = MertonParams(sigma=0.2, lam=0.5, mu_j=-0.1, sigma_j=0.15)
    BP = BatesParams(heston=HestonParams(kappa=2.0, theta=0.04, xi=0.3,
                                         rho=-0.7, v0=0.04),
                     lam=0.3, mu_j=-0.1, sigma_j=0.15)
    MC2 = MCConfig(n_paths=16384, n_steps=10, path_block=2048)

    def test_merton_grid_1d_cv(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 8
        S0s = jnp.linspace(95.0, 105.0, n)
        cfg = MCConfig(n_paths=4096, n_steps=20, path_block=1024)
        prices, stderrs = price_american_grid(
            key, S0s, jnp.full((n,), K), jnp.full((n,), T), R, cfg, mesh,
            cp=-1.0, sigma=SIG, merton=self.MP, model="merton", engine="xla",
            use_control_variate=True, return_stderr=True)
        p = np.asarray(prices)
        assert np.all(np.isfinite(p)) and np.all(np.asarray(stderrs) > 0)
        assert np.all(np.diff(p) < 0.5)  # put roughly decreasing in S0
        # American >= European closed form (within noise)
        from options_model_tpu.models.merton import merton_price
        eu = float(merton_price(100.0, K, T, R, self.MP, cp=-1.0))
        i = 4  # S0 close to 100
        assert float(prices[i]) > eu - 4 * float(stderrs[i]) - 0.05

    @pytest.mark.slow
    def test_bates_grid_1d_cv(self, key, devices8):
        mesh = make_mesh(("tasks",), devices=devices8)
        n = 4
        S0s = jnp.full((n,), 100.0)
        cfg = MCConfig(n_paths=8192, n_steps=20, path_block=1024)
        prices, stderrs = price_american_grid(
            key, S0s, jnp.full((n,), K), jnp.full((n,), T), R, cfg, mesh,
            cp=-1.0, bates=self.BP, model="bates", engine="xla",
            use_control_variate=True, return_stderr=True)
        from options_model_tpu.calibration import bates_cos_price
        eu = float(bates_cos_price(100.0, K, T, R, self.BP, cp=-1.0))
        for i in range(n):
            assert float(prices[i]) > eu - 4 * float(stderrs[i]) - 0.05
            assert float(prices[i]) < eu * 1.3

    def _price_2d(self, key, mesh_shape, devices, model, **kw):
        from options_model_tpu.parallel import price_american_grid_2d
        mesh = make_mesh(("tasks", "paths"), shape=mesh_shape,
                         devices=devices)
        S0s = np.array([95.0, 100.0, 105.0, 110.0], np.float32)
        Ks = np.full(4, K, np.float32)
        Ts = np.full(4, T, np.float32)
        extra = (dict(bates=self.BP) if model == "bates"
                 else dict(merton=self.MP, sigma=SIG))
        return price_american_grid_2d(key, S0s, Ks, Ts, R, self.MC2, mesh,
                                      cp=PUT, model=model,
                                      return_stderr=True, **extra, **kw)

    @pytest.mark.slow
    def test_bates_2d_mesh_shape_invariance(self, key, devices8):
        p18, _ = self._price_2d(key, (1, 8), devices8, "bates")
        p42, s42 = self._price_2d(key, (4, 2), devices8, "bates")
        np.testing.assert_allclose(np.asarray(p18), np.asarray(p42),
                                   rtol=3e-3)
        assert np.all(np.asarray(s42) > 0)

    @pytest.mark.slow
    def test_merton_2d_mesh_shape_invariance(self, key, devices8):
        p24, _ = self._price_2d(key, (2, 4), devices8, "merton")
        p42, _ = self._price_2d(key, (4, 2), devices8, "merton")
        np.testing.assert_allclose(np.asarray(p24), np.asarray(p42),
                                   rtol=3e-3)

    @pytest.mark.slow
    def test_bates_2d_matches_unsharded_variance_basis(self, key, devices8):
        """The (S, v) basis must survive the path sharding for bates exactly
        as for heston — the jump overlay does not touch the variance
        matrix."""
        prices, _ = self._price_2d(key, (2, 4), devices8, "bates")
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        for i, s0 in enumerate([95.0, 100.0, 105.0, 110.0]):
            task_key = jax.random.fold_in(key, i)
            S_paths, v_paths = simulate_paths(
                task_key, s0, T, self.MC2, "bates", rate=R, bates=self.BP,
                engine="xla", return_variance=True)
            ref, _ = lsm_poly_backward(S_paths, spec, T, v_paths=v_paths,
                                       stat_pair_block=self.MC2.path_block)
            assert abs(float(prices[i]) / float(ref) - 1.0) < 3e-3, (
                f"task {i}: 2-D {float(prices[i])} vs unsharded {float(ref)}")

    @pytest.mark.slow
    def test_bates_2d_cv_and_richardson(self, key, devices8):
        p_cv, s_cv = self._price_2d(key, (2, 4), devices8, "bates",
                                    use_control_variate=True)
        assert np.all(np.isfinite(np.asarray(p_cv)))
        p_r, _ = self._price_2d(key, (2, 4), devices8, "bates",
                                use_control_variate=True,
                                lsm=LSMConfig(richardson=True))
        assert np.all(np.isfinite(np.asarray(p_r)))


class TestShardedSinglePricingJump:
    def test_bates_european_sharded_matches_unsharded(self, key, devices8):
        from options_model_tpu.core.config import BatesParams
        bp = BatesParams(heston=HESTON, lam=0.3, mu_j=-0.1, sigma_j=0.15)
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 2048, n_steps=16, path_block=1024)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        m_s, se_s, n_s = price_european_sharded(key, S0, T, spec, cfg, mesh,
                                                model="bates", bates=bp)
        sampler = make_terminal_sampler("bates", S0, R, T, bates=bp,
                                        engine="xla")
        m_u, se_u, n_u = price_european_mc(key, sampler, spec, T, cfg)
        np.testing.assert_allclose(float(m_s), float(m_u), rtol=1e-5)
        assert int(n_s) == int(n_u)

    @pytest.mark.slow
    def test_bates_american_sharded_matches_unsharded(self, key, devices8):
        from options_model_tpu.core.config import BatesParams
        bp = BatesParams(heston=HESTON, lam=0.3, mu_j=-0.1, sigma_j=0.15)
        mesh = make_mesh(("paths",), devices=devices8)
        cfg = MCConfig(n_paths=8 * 1024, n_steps=10, path_block=1024)
        spec = OptionSpec(strike=K, rate=R, cp=PUT, sigma=None)
        p_s, se_s = price_american_sharded_paths(key, S0, T, spec, cfg, mesh,
                                                 model="bates", bates=bp)
        S_paths, v_paths = simulate_paths(key, S0, T, cfg, "bates", rate=R,
                                          bates=bp, engine="xla",
                                          return_variance=True)
        p_u, se_u = lsm_poly_backward(S_paths, spec, T, v_paths=v_paths)
        # The paths are bitwise identical per shard (tested via
        # simulate_paths chunk equality); the psum'ed Grams differ from the
        # unsharded single matmul in float reduction ORDER, which can flip
        # O(1) boundary exercise decisions (observed for heston too, seed 1:
        # rel 9e-4 at 8k paths) — the guarantee is agreement up to those
        # flips, not bitwise equality.
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-3)
