"""End-to-end pipeline on a RECORDED realistic option chain (VERDICT r3
missing #3): the reference's flagship flow ticker -> chain -> calibrate /
train -> price (options_model_3/options_model_3.py:908-1061,
heston_calibration.py:777-806) driven entirely offline against
tests/data/chain_fixture.json — a bytes-stable recording shaped like raw
yfinance output, generated from KNOWN Heston dynamics and corrupted the way
live chains are: vega-scaled bid-ask noise, stale quotes, crossed/junk IVs,
zero-volume rows, duplicates, sparse maturities and wings
(scripts/record_chain_fixture.py documents the recipe).

Because the generating parameters are known, every stage gets a real
assertion: the parser must drop exactly the junk, the calibrator must recover
the variance structure THROUGH the microstructure noise, the fitted dynamics
must reprice vanillas and Americans near the truth, and the IV net must fit
the chain to its noise floor.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from options_model_tpu.core.config import HestonParams

from tests.test_market_offline import FakeChain, FakeTicker

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "chain_fixture.json")


def _load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def _fixture_ticker(fx):
    """Build the yfinance stand-in from the recording. Day-offset keys map to
    calendar dates such that fetch_option_chain's floor((midnight - now).days)
    reproduces the recorded days-to-expiry exactly."""
    base = pd.Timestamp.now().normalize()
    chains, options = {}, []
    for days, sides in sorted(fx["expiries"].items(), key=lambda kv: int(kv[0])):
        date = (base + pd.Timedelta(days=int(days) + 1)).strftime("%Y-%m-%d")
        options.append(date)
        dfs = {}
        for side in ("calls", "puts"):
            rows = np.array(sides[side], np.float64)
            dfs[side] = pd.DataFrame({"strike": rows[:, 0],
                                      "impliedVolatility": rows[:, 1],
                                      "volume": rows[:, 2]})
        chains[date] = FakeChain(dfs["calls"], dfs["puts"])
    return FakeTicker(closes=fx["closes"], options=options, chains=chains)


@pytest.fixture(scope="module")
def fx():
    return _load_fixture()


@pytest.fixture
def recorded_chain(fx, monkeypatch):
    """Stub yfinance with the recording; returns the parsed chain."""
    import types

    from options_model_tpu.data import market

    tk = _fixture_ticker(fx)
    monkeypatch.setattr(market, "yf",
                        types.SimpleNamespace(Ticker=lambda s: tk))
    monkeypatch.setattr(market, "_YF", True)
    from options_model_tpu.data.market import fetch_option_chain
    return fetch_option_chain("RECORDED")


def _x64_or_skip():
    from options_model_tpu.calibration.calibrator import (
        _try_enable_explicit_x64)
    if not _try_enable_explicit_x64():
        pytest.skip("explicit x64 dtypes unavailable")


class TestRecordedChainParsing:
    def test_junk_quotes_dropped(self, fx, recorded_chain):
        K, T, iv, S0 = recorded_chain
        assert S0 == pytest.approx(fx["meta"]["S0"])
        # the sanity range ate the crossed (0.005), fat-finger (2.6) and
        # NaN rows; the liquidity filter ate volume==0
        assert ((iv > 0.01) & (iv < 2.0)).all() and not np.isnan(iv).any()
        # every recorded expiry survives (only 7 — under the 8-expiry cap)
        days = np.unique(np.round(T * 365.0)).astype(int)
        assert set(days) == {int(d) for d in fx["expiries"]}
        # exact survivor count: replay the parser's filter/dedupe contract on
        # the raw recording — nothing extra dropped, nothing junk kept
        expected = set()
        for d, sides in fx["expiries"].items():
            t = int(d) / 365.0
            for side in ("calls", "puts"):
                for k, v, q in sides[side]:
                    if 0.01 < v < 2.0 and q > 0:   # NaN fails the comparison
                        expected.add((k, t, v))
        assert len(K) == len(expected)
        # sorted by (T, K)
        assert (np.diff(T) >= 0).all()

    def test_quotes_scatter_around_truth(self, fx, recorded_chain):
        """Parsed IVs sit within bid-ask + stale-quote distance of the
        generating surface at the ATM bucket (coarse sanity that the
        recording is the surface it claims to be)."""
        K, T, iv, S0 = recorded_chain
        atm = np.abs(K / S0 - 1.0) < 0.02
        # ATM half-spread is ~0.15 vol-pt, stale-spot shift adds ~0.5; the
        # true ATM IV of the fixture params is ~0.18-0.21 across the ladder
        assert atm.sum() >= 10
        assert (np.abs(iv[atm] - 0.195) < 0.05).all()


@pytest.mark.slow
class TestRecordedChainCalibration:
    """chain -> calibrate -> price, the flagship flow on the recording."""

    def _calibrate(self, recorded_chain, fx):
        from options_model_tpu.calibration.calibrator import (
            calibrate_heston_to_data)
        from options_model_tpu.core.config import CalibrationConfig

        K, T, iv, S0 = recorded_chain
        cfg = CalibrationConfig(optimization_methods=("L-BFGS-B",),
                                verbose=False)
        params, summary = calibrate_heston_to_data(
            K, T, iv, S0=S0, rate=fx["meta"]["rate"], config=cfg)
        return params, summary, S0

    @pytest.mark.slow
    def test_params_recovered_through_microstructure_noise(
            self, recorded_chain, fx):
        _x64_or_skip()
        params, summary, _ = self._calibrate(recorded_chain, fx)
        true = HestonParams(**fx["meta"]["true_params"])
        assert summary["regime"] == "normal_vol"
        # vega weighting concentrates the fit where half-spreads are ~0.15
        # vol-pt; stale quotes (4%) push the floor above the ATM spread
        assert summary["error"] < 0.01
        assert abs(params.theta - true.theta) < 0.01
        assert abs(params.v0 - true.v0) < 0.01
        assert abs(params.rho - true.rho) < 0.15
        assert abs(params.xi / true.xi - 1.0) < 0.35

    def test_fitted_dynamics_reprice_near_truth(self, recorded_chain, fx):
        """The economically meaningful closure: vanilla AND American prices
        under the FITTED params match prices under the TRUE params — the
        pipeline's output is prices, not parameters."""
        _x64_or_skip()
        import jax
        import jax.numpy as jnp

        from options_model_tpu.calibration.charfn import heston_cos_price
        from options_model_tpu.core.config import (LSMConfig, MCConfig,
                                                   OptionSpec)
        from options_model_tpu.pricers.american import price_american

        params, _, S0 = self._calibrate(recorded_chain, fx)
        true = HestonParams(**fx["meta"]["true_params"])
        r = fx["meta"]["rate"]

        # European closure (deterministic): OTM put, ATM call, OTM call @ 6m
        Ks = jnp.asarray([0.9 * S0, S0, 1.1 * S0], jnp.float32)
        Ts = jnp.full(3, 0.5, jnp.float32)
        p_fit = heston_cos_price(S0, Ks, Ts, r, params, cp=1.0)
        p_true = heston_cos_price(S0, Ks, Ts, r, true, cp=1.0)
        rel = np.abs(np.asarray(p_fit) / np.asarray(p_true) - 1.0)
        assert rel.max() < 0.01, rel

        # American closure (same key both runs: difference is params only)
        spec = OptionSpec(strike=float(S0), rate=r, cp=-1.0)
        mc = MCConfig(n_paths=2 ** 15, n_steps=50)
        lsm = LSMConfig()
        key = jax.random.key(7)
        a_fit, _ = price_american(key, float(S0), 0.5, spec, mc, lsm,
                                  model="heston", heston=params)
        a_true, _ = price_american(key, float(S0), 0.5, spec, mc, lsm,
                                   model="heston", heston=true)
        assert abs(float(a_fit) / float(a_true) - 1.0) < 0.015

    def test_cli_flow_on_recording(self, fx, monkeypatch):
        """The actual CLI entry (apps.calibrate, --ticker path) against the
        stubbed feed — the reference's heston_calibration.py:777-806 flow."""
        _x64_or_skip()
        import types

        from options_model_tpu.apps import calibrate as app
        from options_model_tpu.data import market

        tk = _fixture_ticker(fx)
        monkeypatch.setattr(market, "yf",
                            types.SimpleNamespace(Ticker=lambda s: tk))
        monkeypatch.setattr(market, "_YF", True)
        args = app.parse_args(["--ticker", "RECORDED",
                               "--rate", str(fx["meta"]["rate"]),
                               "--methods", "L-BFGS-B"])
        summary = app.run(args)
        assert summary["error"] < 0.01
        true = fx["meta"]["true_params"]
        assert abs(summary["params"].theta - true["theta"]) < 0.01


@pytest.mark.slow
class TestRecordedChainSurface:
    @pytest.mark.slow
    def test_iv_net_fits_chain_to_noise_floor(self, fx, monkeypatch):
        """ticker -> train path (IVSurfaceModel.fit_ticker, the reference's
        IVSurfaceModel.fit(ticker) at NN_training_stock_iv.py:722-739): the
        net must recover the clean surface from the noisy quotes —
        predictions at interior nodes within ~1.2 vol-pt of the TRUE
        generating IV (tighter than the wing noise it was trained on)."""
        import types

        from options_model_tpu.core.config import SurfaceTrainConfig
        from options_model_tpu.data import market
        from options_model_tpu.surface.model import IVSurfaceModel

        tk = _fixture_ticker(fx)
        monkeypatch.setattr(market, "yf",
                            types.SimpleNamespace(Ticker=lambda s: tk))
        monkeypatch.setattr(market, "_YF", True)

        cfg = SurfaceTrainConfig(epochs=220, batch_size=256,
                                 use_augmentation=False, seed=3,
                                 patience=60)
        model = IVSurfaceModel.fit_ticker("RECORDED", cfg=cfg,
                                          rate=fx["meta"]["rate"])

        # evaluate against the TRUE surface on interior nodes (|m| < 7%,
        # 30-182d) where quotes were densest
        from options_model_tpu.calibration.charfn import heston_cos_price
        from options_model_tpu.pricers.blackscholes import implied_vol
        import jax.numpy as jnp

        true = HestonParams(**fx["meta"]["true_params"])
        r = fx["meta"]["rate"]
        S0 = fx["meta"]["S0"]
        Ke = np.linspace(0.93 * S0, 1.07 * S0, 9).astype(np.float32)
        for Tq in (30 / 365.0, 91 / 365.0, 182 / 365.0):
            Te = np.full_like(Ke, Tq)
            p = heston_cos_price(S0, jnp.asarray(Ke), jnp.asarray(Te), r,
                                 true, cp=1.0)
            iv_true = np.asarray(implied_vol(p, S0, jnp.asarray(Ke),
                                             jnp.asarray(Te), r, cp=1.0))
            iv_net = np.asarray(model.predict(Ke, Tq))
            assert np.abs(iv_net - iv_true).max() < 0.012, (
                Tq, np.abs(iv_net - iv_true).max())
