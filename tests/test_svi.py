"""SVI surface (surface/svi.py): slice fits, no-arbitrage diagnostics, and
the Dupire local-vol bridge into the local-vol simulator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import HestonParams, MCConfig
from options_model_tpu.pricers.blackscholes import bs_price, implied_vol
from options_model_tpu.surface.svi import (
    SVISlice, SVISurface, fit_svi_from_chain, fit_svi_slice, fit_svi_surface,
    svi_butterfly_g, svi_total_variance)

S0, R = 100.0, 0.05


def _slice_surface(expiries, slices):
    return SVISurface(S0=S0, rate=R, div_yield=0.0,
                      expiries=tuple(expiries), slices=tuple(slices))


class TestSlice:
    def test_fit_round_trip_exact(self):
        truth = SVISlice(a=0.01, b=0.1, rho=-0.4, m=0.05, s=0.2)
        T, F = 0.5, 100.0
        Ks = np.linspace(70.0, 130.0, 15)
        k = np.log(Ks / F)
        ivs = np.sqrt(np.asarray(svi_total_variance(jnp.asarray(k), truth)) / T)
        sl, info = fit_svi_slice(F, T, Ks, ivs)
        assert info["rmse_iv"] < 1e-6
        for name in ("a", "b", "rho", "m", "s"):
            assert getattr(sl, name) == pytest.approx(
                getattr(truth, name), abs=1e-4), name

    def test_validate_rejects_negative_min_variance(self):
        with pytest.raises(ValueError):
            SVISlice(a=-0.5, b=0.1, rho=0.0, m=0.0, s=0.1).validate()
        with pytest.raises(ValueError):
            SVISlice(a=0.01, b=-0.1, rho=0.0, m=0.0, s=0.1).validate()


class TestNoArbitrage:
    def test_clean_slice_passes_butterfly(self):
        sl = SVISlice(a=0.01, b=0.1, rho=-0.4, m=0.05, s=0.2)
        g = np.asarray(svi_butterfly_g(jnp.linspace(-1.5, 1.5, 301), sl))
        assert g.min() >= 0.0

    def test_butterfly_arbitrage_detected(self):
        """The classic Gatheral-Jacquier (2014, §3) vintage example — a
        fitted-to-market slice whose density goes negative near k ~ 0.4."""
        bad = SVISlice(a=-0.0410, b=0.1331, rho=0.3060, m=0.3586, s=0.4153)
        surf = _slice_surface([0.5], [bad])
        chk = surf.check_butterfly()
        assert not chk["ok"]
        assert chk["min_g"][0] < 0.0

    def test_calendar_arbitrage_detected(self):
        lo = SVISlice(a=0.04, b=0.05, rho=0.0, m=0.0, s=0.2)
        hi = SVISlice(a=0.01, b=0.05, rho=0.0, m=0.0, s=0.2)  # w drops in T
        surf = _slice_surface([0.25, 0.5], [lo, hi])
        chk = surf.check_calendar()
        assert not chk["ok"]
        clean = _slice_surface([0.25, 0.5], [hi, lo])
        assert clean.check_calendar()["ok"]


class TestSurface:
    def _flat_surface(self, sigma=0.2, expiries=(0.25, 0.5, 0.75, 1.0)):
        Ks = np.linspace(70.0, 130.0, 13)
        rows_iv = [np.full_like(Ks, sigma)] * len(expiries)
        surf, infos = fit_svi_surface(S0, R, list(expiries),
                                      [Ks] * len(expiries), rows_iv)
        return surf, infos

    def test_flat_fit_and_iv_interpolation(self):
        surf, infos = self._flat_surface()
        assert all(i["rmse_iv"] < 1e-5 for i in infos)
        # iv() at expiries and between them reproduces the flat vol
        for T in (0.25, 0.4, 0.8, 1.0):
            iv = float(surf.iv(105.0, T))
            assert iv == pytest.approx(0.2, abs=2e-4), T

    def test_flat_dupire_local_vol_is_constant(self):
        surf, _ = self._flat_surface()
        fn = surf.local_vol_fn(T_option=0.9)
        sig = np.asarray(fn(jnp.array([80.0, 100.0, 125.0]),
                            jnp.float32(0.4)))
        np.testing.assert_allclose(sig, 0.2, atol=2e-4)

    def test_flat_surface_reprices_bs_through_simulator(self, key):
        """End-to-end: SVI fit -> Dupire local vol -> local-vol simulator ->
        European price == Black-Scholes (the engine-bridge contract)."""
        from options_model_tpu.models.localvol import simulate_local_vol
        surf, _ = self._flat_surface()
        T = 0.8
        fn = surf.local_vol_fn(T_option=T)
        cfg = MCConfig(n_paths=131_072, n_steps=32, path_block=4096)
        S_T = simulate_local_vol(key, S0, R, T, fn, cfg, return_paths=False)
        pay = np.exp(-R * T) * np.maximum(np.asarray(S_T) - 100.0, 0.0)
        se = pay.std() / np.sqrt(pay.size)
        truth = float(bs_price(S0, 100.0, T, R, 0.2, 1.0))
        assert abs(pay.mean() - truth) < 4 * se

    def test_heston_smile_consistency(self, key):
        """Fit SVI to Heston-COS smiles, convert to Dupire local vol, and
        reprice a vanilla through the simulator: local vol reprices the
        vanillas it was built from (Dupire's theorem), so the MC must land
        on the COS price within MC error + fit/interp tolerance."""
        from options_model_tpu.calibration.charfn import heston_cos_price
        from options_model_tpu.models.localvol import simulate_local_vol
        hp = HestonParams(kappa=2.0, theta=0.04, xi=0.4, rho=-0.6, v0=0.04)
        Ks = np.linspace(75.0, 130.0, 14)
        exps = [0.25, 0.5, 0.75, 1.0]
        rows_iv = []
        for T in exps:
            px = heston_cos_price(S0, jnp.asarray(Ks), T, R, hp, cp=1.0)
            rows_iv.append(np.asarray(implied_vol(
                px, S0, jnp.asarray(Ks), T, R, cp=1.0)))
        surf, infos = fit_svi_surface(S0, R, exps, [Ks] * 4, rows_iv)
        assert all(i["rmse_iv"] < 2e-3 for i in infos)  # SVI fits Heston well
        assert surf.check_butterfly()["ok"]
        assert surf.check_calendar()["ok"]

        T = 0.75
        fn = surf.local_vol_fn(T_option=T)
        cfg = MCConfig(n_paths=262_144, n_steps=48, path_block=4096)
        S_T = simulate_local_vol(key, S0, R, T, fn, cfg, return_paths=False)
        for K in (90.0, 100.0, 110.0):
            pay = np.exp(-R * T) * np.maximum(np.asarray(S_T) - K, 0.0)
            se = pay.std() / np.sqrt(pay.size)
            truth = float(heston_cos_price(S0, K, T, R, hp, cp=1.0))
            # tolerance: MC error + fit rmse propagated through vega
            assert abs(pay.mean() - truth) < 4 * se + 0.01 * truth, K

    def test_single_expiry_guards(self):
        sl = SVISlice(a=0.01, b=0.1, rho=-0.4, m=0.05, s=0.2)
        surf = _slice_surface([0.5], [sl])
        assert np.isfinite(float(surf.iv(100.0, 0.5)))
        with pytest.raises(ValueError):
            surf.local_vol_fn(T_option=0.5)


class TestChainAndEngine:
    def test_fit_from_flattened_chain(self):
        from options_model_tpu.data.synthetic import synthetic_smile_surface
        K, T, iv, S0_o = synthetic_smile_surface(S0=S0)
        surf, infos = fit_svi_from_chain(K, T, iv, S0_o, rate=R)
        assert len(surf.expiries) == 3
        # SVI's smoothed-|k| form fits the synthetic |logm| smile closely
        assert all(i["rmse_iv"] < 5e-3 for i in infos)
        assert surf.check_butterfly()["ok"]

    def test_chain_drops_thin_expiries_and_nan_rows(self):
        K = np.concatenate([np.linspace(80, 120, 9)] * 2 + [[100.0, 105.0]])
        T = np.concatenate([np.full(9, 0.25), np.full(9, 0.5), [1.0, 1.0]])
        iv = np.full(20, 0.2)
        iv[3] = np.nan
        with pytest.raises(ValueError):
            # dropping the NaN row leaves the first expiry with 8 quotes;
            # require 9 and only ONE expiry survives
            fit_svi_from_chain(K, T, iv, S0, rate=R, min_strikes=9)
        surf, _ = fit_svi_from_chain(K, T, iv, S0, rate=R, min_strikes=8)
        assert surf.expiries == (0.25, 0.5)   # the 2-quote expiry is dropped

    def test_engine_adapter_factory(self):
        from options_model_tpu.surface.svi import SVILocalVolEngine
        surf, _ = TestSurface()._flat_surface()
        eng = SVILocalVolEngine(surf)
        assert eng.get_sigma_iv(100.0, S0, 0.5) == pytest.approx(0.2, abs=2e-4)
        factory = eng.sigma_fn(100.0)
        with pytest.raises(TypeError):
            factory(jnp.ones(4), 0.5)   # must bind a maturity first
        fn = factory.for_maturity(0.8)
        sig = np.asarray(fn(jnp.array([90.0, 110.0]), jnp.float32(0.3)))
        np.testing.assert_allclose(sig, 0.2, atol=2e-4)

    def test_cli_synthetic_svi_run(self):
        """--iv svi end-to-end: chain fit -> Dupire local vol -> fused
        local-vol sweep (mirrors the --iv nn pipeline test in test_apps)."""
        from options_model_tpu.apps.cli import parse_args, run
        args = parse_args([
            "--spot", "100", "--K", "100", "--model", "bs", "--iv", "svi",
            "--synthetic", "--num-simulations", "2048",
            "--s0-start", "100", "--s0-end", "100", "--s0-step", "1",
            "--total-points", "1", "--intervals-per-day", "1",
            "--engine", "xla", "--option-type", "put"])
        out = run(args)
        assert 0.15 < out["sigma"] < 0.4
        assert np.isfinite(out["bs"]["Option Value"]).all()
