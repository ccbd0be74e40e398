"""Offline coverage of the live-chain parsing logic (VERDICT r1 weak #8):
the yfinance adapter's filter/dedupe/sort, per-expiry skip, nearest-strike IV
lookup, and historical-vol estimate — all against a stubbed yfinance module,
no network. (The reference never tested this layer at all, SURVEY.md §4.)"""

import types

import numpy as np
import pandas as pd
import pytest

from options_model_tpu.data import market
from options_model_tpu.data.market import (
    MarketDataError,
    fetch_live_iv,
    fetch_live_quote,
    fetch_option_chain,
)


class FakeChain:
    def __init__(self, calls, puts):
        self.calls = calls
        self.puts = puts


class FakeTicker:
    """Configurable stand-in for yfinance.Ticker."""

    def __init__(self, closes=None, options=(), chains=None, fail_expiries=()):
        self._closes = closes if closes is not None else [100.0]
        self.options = tuple(options)
        self._chains = chains or {}
        self._fail = set(fail_expiries)

    def history(self, period="1d"):
        if period == "1d":
            return pd.DataFrame({"Close": self._closes[-1:]})
        return pd.DataFrame({"Close": self._closes})

    def option_chain(self, expiry):
        if expiry in self._fail:
            raise RuntimeError(f"simulated fetch failure for {expiry}")
        return self._chains[expiry]


@pytest.fixture
def stub_yf(monkeypatch):
    """Install a stub yfinance into the market module; yields a setter that
    binds the FakeTicker the next call should return."""
    holder = {}
    fake_mod = types.SimpleNamespace(Ticker=lambda symbol: holder["ticker"])
    monkeypatch.setattr(market, "yf", fake_mod)
    monkeypatch.setattr(market, "_YF", True)
    return lambda ticker: holder.__setitem__("ticker", ticker)


def _chain_df(strikes, ivs, volumes):
    return pd.DataFrame({"strike": strikes, "impliedVolatility": ivs,
                         "volume": volumes})


EXP1 = (pd.Timestamp.now() + pd.Timedelta(days=30)).strftime("%Y-%m-%d")
EXP2 = (pd.Timestamp.now() + pd.Timedelta(days=60)).strftime("%Y-%m-%d")


class TestFetchOptionChain:
    def test_happy_path_filters_dedupes_sorts(self, stub_yf):
        calls1 = _chain_df([110.0, 90.0, 95.0, 95.0, 100.0],
                           [0.25, 0.30, 0.28, 0.28, 3.5],   # 3.5 -> filtered
                           [10, 5, 3, 3, 100])               # dup row dropped
        puts1 = _chain_df([105.0, 85.0], [0.27, 0.005], [7, 50])  # .005 filtered
        calls2 = _chain_df([100.0], [0.22], [1])
        stub_yf(FakeTicker(closes=[99.0, 101.0], options=[EXP1, EXP2],
                           chains={EXP1: FakeChain(calls1, puts1),
                                   EXP2: FakeChain(calls2, _chain_df([], [], []))}))
        K, T, iv, S0 = fetch_option_chain("FAKE")
        assert S0 == pytest.approx(101.0)
        # 4 surviving rows from EXP1 (90, 95 deduped, 105, 110) + 1 from EXP2
        assert len(K) == 5
        # sorted by (T, K)
        assert list(K[:4]) == [90.0, 95.0, 105.0, 110.0]
        assert K[4] == 100.0 and T[4] > T[0]
        assert ((iv > 0.01) & (iv < 2.0)).all()

    def test_zero_volume_filtered(self, stub_yf):
        calls = _chain_df([100.0, 105.0], [0.2, 0.21], [0, 4])
        stub_yf(FakeTicker(options=[EXP1],
                           chains={EXP1: FakeChain(calls,
                                                   _chain_df([], [], []))}))
        K, _, _, _ = fetch_option_chain("FAKE")
        assert list(K) == [105.0]

    def test_failing_expiry_skipped(self, stub_yf):
        calls = _chain_df([100.0], [0.2], [5])
        stub_yf(FakeTicker(options=[EXP1, EXP2], fail_expiries=[EXP1],
                           chains={EXP2: FakeChain(calls,
                                                   _chain_df([], [], []))}))
        K, T, iv, S0 = fetch_option_chain("FAKE")
        assert len(K) == 1  # EXP1 degraded-and-continued

    def test_all_expiries_failed_raises(self, stub_yf):
        stub_yf(FakeTicker(options=[EXP1, EXP2],
                           fail_expiries=[EXP1, EXP2]))
        with pytest.raises(MarketDataError, match="No valid option data"):
            fetch_option_chain("FAKE")

    def test_no_expiries_raises(self, stub_yf):
        stub_yf(FakeTicker(options=[]))
        with pytest.raises(MarketDataError, match="No option data"):
            fetch_option_chain("FAKE")

    def test_no_price_history_raises(self, stub_yf):
        stub_yf(FakeTicker(closes=[], options=[EXP1]))
        with pytest.raises(MarketDataError, match="No price data"):
            fetch_option_chain("FAKE")

    def test_max_expiries_cap(self, stub_yf):
        exps = [(pd.Timestamp.now() + pd.Timedelta(days=30 * i))
                .strftime("%Y-%m-%d") for i in range(1, 11)]
        chains = {e: FakeChain(_chain_df([100.0 + i], [0.2], [5]),
                               _chain_df([], [], []))
                  for i, e in enumerate(exps)}
        stub_yf(FakeTicker(options=exps, chains=chains))
        K, _, _, _ = fetch_option_chain("FAKE")
        assert len(K) == 8  # reference cap (NN_training_stock_iv.py:299)


class TestFetchLiveIV:
    def test_nearest_strike(self, stub_yf):
        calls = _chain_df([90.0, 100.0, 110.0], [0.3, 0.25, 0.28], [1, 1, 1])
        stub_yf(FakeTicker(options=[EXP1],
                           chains={EXP1: FakeChain(calls, calls)}))
        assert fetch_live_iv("FAKE", EXP1, 101.0) == pytest.approx(0.25)
        assert fetch_live_iv("FAKE", EXP1, 88.0) == pytest.approx(0.3)

    def test_out_of_range_iv_is_nan(self, stub_yf):
        calls = _chain_df([100.0], [2.5], [1])
        stub_yf(FakeTicker(options=[EXP1],
                           chains={EXP1: FakeChain(calls, calls)}))
        assert np.isnan(fetch_live_iv("FAKE", EXP1, 100.0))

    def test_missing_expiry_is_nan(self, stub_yf):
        stub_yf(FakeTicker(options=[EXP1]))
        assert np.isnan(fetch_live_iv("FAKE", "1999-01-01", 100.0))

    def test_puts_side(self, stub_yf):
        calls = _chain_df([100.0], [0.5], [1])
        puts = _chain_df([100.0], [0.33], [1])
        stub_yf(FakeTicker(options=[EXP1],
                           chains={EXP1: FakeChain(calls, puts)}))
        assert fetch_live_iv("FAKE", EXP1, 100.0,
                             option_type="put") == pytest.approx(0.33)


class TestFetchLiveQuote:
    def test_spot_and_hist_vol(self, stub_yf):
        # Deterministic log returns: sigma = std(logret, ddof=1) * sqrt(252)
        closes = [100.0, 102.0, 101.0, 103.0, 104.0]
        stub_yf(FakeTicker(closes=closes))
        S0, sigma = fetch_live_quote("FAKE")
        assert S0 == pytest.approx(104.0)
        logrets = np.log(np.array(closes[1:]) / np.array(closes[:-1]))
        assert sigma == pytest.approx(float(np.std(logrets, ddof=1)
                                            * np.sqrt(252.0)))

    def test_insufficient_history_raises(self, stub_yf):
        stub_yf(FakeTicker(closes=[100.0]))
        with pytest.raises(MarketDataError, match="Not enough history"):
            fetch_live_quote("FAKE")
