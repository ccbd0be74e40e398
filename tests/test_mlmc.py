"""Multilevel Monte Carlo (pricers/mlmc.py).

Validates the coupling (fine/coarse pairs share Brownian increments), the
telescoping identity, the Giles driver's eps contract, and agreement with the
closed forms (BS for GBM, COS for Heston) — the MLMC analogue of the suite's
pair-mean/oracle discipline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.calibration.charfn import heston_cos_price
from options_model_tpu.core.config import HestonParams
from options_model_tpu.pricers.blackscholes import bs_price
from options_model_tpu.pricers.mlmc import (
    _coupled_heston_block, _level_sampler, _payoff_fn, price_mlmc)

HP = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
S0, K, R, T = 100.0, 100.0, 0.05, 1.0


class TestCoupling:
    def test_gbm_european_correction_vanishes(self, key):
        """Exact log scheme: fine and coarse terminals are the same sum of
        increments, so the European correction is pure float32 roundoff."""
        pay = _payoff_fn("european", K, 1.0, jnp.float32)
        s = _level_sampler("gbm", pay, S0, R, T, 3, 2, 2, 512, True,
                           jnp.float32, sigma=0.2, n_blocks=2)
        y = s(key, 0)
        assert float(jnp.abs(y).max()) < 5e-3  # cumsum-order roundoff only

    def test_gbm_asian_correction_small_and_decaying(self, key):
        """The Asian average DOES differ by grid; corrections must shrink
        with level (variance decay is what MLMC monetizes)."""
        pay = _payoff_fn("asian", K, 1.0, jnp.float32)
        v = []
        for level in (1, 3):
            s = _level_sampler("gbm", pay, S0, R, T, level, 2, 2, 1024, True,
                               jnp.float32, sigma=0.2, n_blocks=8)
            y = np.asarray(s(key, 0), dtype=np.float64)
            v.append(y.var())
        assert v[1] < 0.25 * v[0]  # beta ~ 2 for smooth payoff: 16x over 2 levels

    def test_heston_coupling_shares_increments(self, key):
        """Coarse state must follow the fine path, not an independent one:
        corr(S_f_T, S_c_T) within a coupled pair ~ 1."""
        sf, sc, _, _ = _coupled_heston_block(
            key, S0, R, T, HP, nc=8, M=2, block=2048, antithetic=True,
            dtype=jnp.float32)
        c = np.corrcoef(np.asarray(sf), np.asarray(sc))[0, 1]
        # measured 0.95 at this coarse grid (dt_c = T/8, xi = 0.5); an
        # independently-keyed coarse path correlates only through the
        # common marginal, ~0
        assert c > 0.9
        sf2, _, _, _ = _coupled_heston_block(
            jax.random.fold_in(key, 99), S0, R, T, HP, nc=8, M=2,
            block=2048, antithetic=True, dtype=jnp.float32)
        c_indep = np.corrcoef(np.asarray(sf2), np.asarray(sc))[0, 1]
        assert abs(c_indep) < 0.2

    def test_heston_level0_matches_production_simulator_law(self, key):
        """Level-0 fine samples use the same full-truncation Euler drift and
        truncation as models/heston.simulate_heston: equal n_steps means
        equal European estimates within joint MC error."""
        from options_model_tpu.core.config import MCConfig
        from options_model_tpu.models.heston import simulate_heston
        pay = _payoff_fn("european", K, 1.0, jnp.float32)
        s = _level_sampler("heston", pay, S0, R, T, 0, 16, 2, 4096, True,
                           jnp.float32, heston=HP, n_blocks=8)
        y = np.asarray(s(key, 0), dtype=np.float64)
        cfg = MCConfig(n_paths=8 * 4096, n_steps=16, path_block=4096)
        st = simulate_heston(jax.random.fold_in(key, 1), S0, R, T, HP, cfg,
                             return_paths=False)
        p = np.maximum(np.asarray(st, dtype=np.float64) - K, 0.0)
        se = np.hypot(y.std() / np.sqrt(y.size), p.std() / np.sqrt(p.size))
        assert abs(y.mean() - p.mean()) < 4 * se


class TestEstimator:
    def test_gbm_european_matches_bs(self, key):
        res = price_mlmc(key, S0, K, R, T, cp=1.0, payoff="european",
                         model="gbm", sigma=0.2, eps=2e-2, n_pilot=4096,
                         L_min=2, L_max=4)
        truth = float(bs_price(S0, K, T, R, 0.2, 1.0))
        assert res.stderr <= 2e-2  # eps contract (variance half)
        assert abs(res.price - truth) < 4 * res.stderr + res.bias_bound + 1e-3

    @pytest.mark.slow
    def test_heston_european_matches_cos(self, key):
        res = price_mlmc(key, S0, K, R, T, cp=1.0, payoff="european",
                         model="heston", heston=HP, eps=2.5e-2, n0=4,
                         n_pilot=4096, L_min=2, L_max=6)
        truth = float(heston_cos_price(S0, K, T, R, HP, cp=1.0))
        tol = 4 * res.stderr + max(res.bias_bound, 2.5e-2 / np.sqrt(2))
        assert abs(res.price - truth) < tol
        # the sample allocation must be multilevel, not flat
        assert res.n_per_level[0] > 4 * res.n_per_level[-1]

    @pytest.mark.slow
    def test_variance_decay_measured(self, key):
        res = price_mlmc(key, S0, K, R, T, cp=1.0, payoff="european",
                         model="heston", heston=HP, eps=2.5e-2, n0=4,
                         n_pilot=8192, L_min=3, L_max=3)
        v = res.var_per_level
        assert v[1] > v[2] > v[3]  # geometric decay across corrections
        assert res.beta > 0.5

    @pytest.mark.slow
    def test_put_and_asian_routes(self, key):
        res = price_mlmc(key, S0, K, R, T, cp=-1.0, payoff="asian",
                         model="gbm", sigma=0.2, eps=3e-2, n_pilot=4096,
                         L_min=2, L_max=5)
        # continuously-monitored arithmetic Asian put: below the European put
        euro = float(bs_price(S0, K, T, R, 0.2, -1.0))
        assert 0.0 < res.price < euro

    def test_eps_drives_cost(self, key):
        loose = price_mlmc(key, S0, K, R, T, cp=1.0, payoff="european",
                           model="gbm", sigma=0.2, eps=5e-2, n_pilot=4096,
                           L_min=2, L_max=3)
        tight = price_mlmc(key, S0, K, R, T, cp=1.0, payoff="european",
                           model="gbm", sigma=0.2, eps=1.25e-2, n_pilot=4096,
                           L_min=2, L_max=3)
        assert tight.cost > 4 * loose.cost  # O(eps^-2) in the variance half
        assert tight.stderr < loose.stderr

    def test_mesh_sampler_stream_matches_single_device(self, key, devices8):
        """Blocks are keyed by GLOBAL index, so the 8-device sampler must
        emit the single-device stream sample-for-sample."""
        from jax.sharding import Mesh
        pay = _payoff_fn("european", K, 1.0, jnp.float32)
        args = ("heston", pay, S0, R, T, 1, 4, 2, 512, True, jnp.float32)
        ref = _level_sampler(*args, heston=HP, n_blocks=16)(key, 0)
        mesh = Mesh(np.array(devices8), ("paths",))
        shd = _level_sampler(*args, heston=HP, n_blocks=16, mesh=mesh)(key, 0)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(shd))

    @pytest.mark.slow
    def test_mesh_estimate_statistically_consistent(self, key, devices8):
        """The meshed estimate may draw a few extra blocks (counts round to
        whole per-device sets) but must agree within joint MC error."""
        from jax.sharding import Mesh
        kw = dict(cp=1.0, payoff="european", model="heston", heston=HP,
                  eps=3e-2, n0=4, n_pilot=8192, L_min=2, L_max=3, block=512)
        ref = price_mlmc(key, S0, K, R, T, **kw)
        with Mesh(np.array(devices8), ("paths",)) as mesh:
            sharded = price_mlmc(key, S0, K, R, T, mesh=mesh, **kw)
        tol = 4 * float(np.hypot(ref.stderr, sharded.stderr)) + 1e-4
        assert abs(sharded.price - ref.price) < tol
        assert sharded.levels == ref.levels

    def test_validation(self, key):
        with pytest.raises(ValueError):
            price_mlmc(key, S0, K, R, T, model="gbm")  # sigma missing
        with pytest.raises(ValueError):
            price_mlmc(key, S0, K, R, T, model="heston", sigma=0.2)
