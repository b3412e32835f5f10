"""Backtest drivers and CLIs (reference ``experiments/``)."""

from .basic_wind import basic_wind_rollouts
from .mt_wind import run_multitask_wind
from .generate_preds import (
    generate_basic_predictions,
    generate_gpcv_predictions,
    generate_one_day_predictions,
    generate_stock_predictions,
)

__all__ = [
    "basic_wind_rollouts",
    "generate_stock_predictions",
    "generate_one_day_predictions",
    "generate_basic_predictions",
    "generate_gpcv_predictions",
    "run_multitask_wind",
]
