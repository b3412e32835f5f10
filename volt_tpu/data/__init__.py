"""Data edge: synthetic SDE generation, ticker universes, market ingestion."""

from .synthetic import sabr_paths
from .tickers import make_ticker_list, ticker_file_path
from .universes import gbm_windows, sabr_windows, wind_windows

__all__ = ["sabr_paths", "make_ticker_list", "ticker_file_path",
           "gbm_windows", "sabr_windows", "wind_windows"]
