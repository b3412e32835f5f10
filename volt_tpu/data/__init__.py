"""Data edge: synthetic SDE generation, ticker universes, market ingestion."""

import os as _os

from .synthetic import sabr_paths
from .tickers import make_ticker_list, ticker_file_path
from .universes import (corrvol_windows, gbm_windows, gusty_wind_windows,
                        sabr_windows, wind_windows)

__all__ = ["sabr_paths", "make_ticker_list", "ticker_file_path",
           "corrvol_windows", "gbm_windows", "gusty_wind_windows",
           "sabr_windows",
           "wind_windows", "fixtures_dir"]


def fixtures_dir() -> str:
    """Vendored offline ingestion sample (2 tickers in the yfinance
    ``DataGetter`` CSV layout + truncated USCRN station files): lets the
    full ingestion -> backtest path execute with zero network access."""
    return _os.path.join(_os.path.dirname(__file__), "fixtures")
