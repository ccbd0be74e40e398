"""Live market-data adapters (yfinance), import-gated for offline environments.

Rebuilds the reference's L1 data layer:
- fetch_live_quote: spot + annualized historical vol from 1y log returns
  (MarketDataFetcher.get_live_quote, options_model_3/options_model_3.py:191-205)
- fetch_live_iv: option-chain IV at the nearest strike with the [0.01, 2.0]
  sanity range and NaN fallback (get_live_iv, :161-189)
- fetch_option_chain: bulk ingestion over <=8 expiries with liquidity filters
  (DataProcessor.fetch_option_data, NN_training_stock_iv.py:280-356)

Failure semantics follow the reference's degrade-and-continue pattern
(SURVEY.md §5): per-expiry failures are skipped; a fully failed fetch raises
``MarketDataError`` so callers can fall back (live IV -> historical vol chain).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

try:  # pragma: no cover - import gate exercised implicitly
    import yfinance as yf
    _YF = True
except ImportError:  # pragma: no cover
    yf = None
    _YF = False


class MarketDataError(RuntimeError):
    pass


def yfinance_available() -> bool:
    return _YF


def _require_yf():
    if not _YF:
        raise MarketDataError(
            "yfinance is not installed; use the synthetic oracles in "
            "options_model_tpu.data.synthetic for offline work")


def fetch_live_quote(ticker: str, vol_window: str = "1y") -> Tuple[float, float]:
    """(spot, annualized historical vol) — sigma = std(log returns) * sqrt(252)."""
    _require_yf()
    data = yf.Ticker(ticker)
    hist = data.history(period="1d")
    if hist.empty:
        raise MarketDataError(f"No data found for ticker {ticker}")
    S0 = float(hist["Close"].iloc[-1])
    hist1 = data.history(period=vol_window)
    closes = hist1["Close"].dropna()
    if len(closes) < 2:
        raise MarketDataError(f"Not enough history to estimate volatility for {ticker}")
    logrets = np.log(closes.values[1:] / closes.values[:-1])
    sigma = float(np.std(logrets, ddof=1) * np.sqrt(252.0))
    return S0, sigma


def fetch_live_iv(ticker: str, expiry: str, strike: float,
                  option_type: str = "call") -> float:
    """IV at the nearest listed strike for the given expiry; NaN when missing
    or outside the (0.01, 2.0) sanity range."""
    _require_yf()
    tk = yf.Ticker(ticker)
    try:
        if expiry not in tk.options:
            return float("nan")
        chain = tk.option_chain(expiry)
        df = chain.calls if option_type == "call" else chain.puts
        strikes = df["strike"].values
        idx = int(np.abs(strikes - strike).argmin())
        iv = float(df.iloc[idx]["impliedVolatility"])
        if np.isnan(iv) or iv < 0.01 or iv > 2.0:
            return float("nan")
        return iv
    except Exception:
        return float("nan")


def fetch_option_chain(ticker: str, max_expiries: int = 8,
                       min_volume: float = 0.0
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Flattened (K, T, iv, S0) across up to ``max_expiries`` expiries, filtered
    to iv in (0.01, 2.0) and volume > min_volume; duplicates dropped, sorted by
    (T, K)."""
    _require_yf()
    import pandas as pd

    tk = yf.Ticker(ticker)
    hist = tk.history(period="1d")
    if hist.empty:
        raise MarketDataError(f"No price data found for {ticker}")
    S0 = float(hist["Close"].iloc[-1])

    expiries = tk.options
    if not expiries:
        raise MarketDataError(f"No option data found for {ticker}")

    rows: List[Tuple[float, float, float]] = []
    for exp_date in expiries[:max_expiries]:
        try:
            chain = tk.option_chain(exp_date)
            T = max((pd.to_datetime(exp_date) - pd.Timestamp.now()).days / 365.0,
                    1.0 / 365.0)
            for df in (chain.calls, chain.puts):
                if df.empty:
                    continue
                ok = ((df["impliedVolatility"] > 0.01)
                      & (df["impliedVolatility"] < 2.0)
                      & (df["volume"] > min_volume))
                for _, row in df[ok].iterrows():
                    rows.append((float(row["strike"]), T,
                                 float(row["impliedVolatility"])))
        except Exception:
            continue  # degrade-and-continue per expiry

    if not rows:
        raise MarketDataError(f"No valid option data found for {ticker}")

    arr = np.array(sorted(set(rows), key=lambda r: (r[1], r[0])), np.float64)
    return arr[:, 0], arr[:, 1], arr[:, 2], S0
