"""LSTM baseline backtest CLI (reference
``experiments/stocks/LSTMGenerator.py`` + ``LSTMUtils.py``).

Per window: normalize log prices, fit the flax LSTM with Gaussian-NLL
Adam(0.01), then autoregressively sample ``nsample`` paths over the
horizon and de-normalize.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import make_ticker_list
from ..models.lstm import train_lstm
from .forecast_generator import load_prices
from .generate_preds import rolling_windows

__all__ = ["main"]


def main(args):
    tckr_list = make_ticker_list(args.ticker_fname + ".txt")
    for tckr in tckr_list:
        try:
            prices, dates = load_prices(tckr, args.ntrain + args.lookback,
                                        args.csv_dir, args.synthetic)
            ends = rolling_windows(prices, args.ntrain, args.ntimes)
            savepath = os.path.join(args.outdir, tckr)
            os.makedirs(savepath, exist_ok=True)
            key = jax.random.key(0)
            for e in ends:
                label = str(dates[e]) if dates is not None else str(e)
                log_y = np.log(prices[e - args.ntrain:e].astype(np.float32))
                key, k_fit, k_s = jax.random.split(key, 3)
                state = train_lstm(
                    log_y, seq_len=args.seq_length, hidden_size=128,
                    num_layers=1, epochs=args.train_epochs,
                    batch_size=args.batch_size, key=k_fit,
                )
                samples = state.forecast(k_s, args.forecast_horizon,
                                         args.nsample)
                np.save(os.path.join(savepath, f"lstm_{label}.npy"),
                        np.asarray(samples))
            print("done", tckr)
        except Exception as e:
            print("FAILED", tckr, e)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--ticker_fname", type=str, default="test_tickers")
    p.add_argument("--ntrain", type=int, default=400)
    p.add_argument("--ntimes", type=int, default=25)
    p.add_argument("--forecast_horizon", type=int, default=20)
    p.add_argument("--seq_length", type=int, default=25)
    p.add_argument("--nsample", type=int, default=1000)
    p.add_argument("--train_epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lookback", type=int, default=500)
    p.add_argument("--end_date", type=str, default="none")
    p.add_argument("--csv_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--outdir", type=str, default="./saved-outputs")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
