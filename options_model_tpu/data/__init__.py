"""Data layer (reference L1, SURVEY.md §1): live market adapters (yfinance,
import-gated for offline use) and synthetic oracles as first-class test
fixtures (SURVEY.md §4: synthetic generators instead of mocks)."""

from options_model_tpu.data.synthetic import (
    synthetic_iv_smile,
    synthetic_smile_surface,
)
from options_model_tpu.data.market import (
    MarketDataError,
    fetch_live_quote,
    fetch_live_iv,
    fetch_option_chain,
    yfinance_available,
)

__all__ = [
    "synthetic_iv_smile",
    "synthetic_smile_surface",
    "MarketDataError",
    "fetch_live_quote",
    "fetch_live_iv",
    "fetch_option_chain",
    "yfinance_available",
]
