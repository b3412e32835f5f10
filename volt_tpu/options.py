"""Option valuation from Monte-Carlo price paths.

Reference ``voltron/option_utils.py``: per-expiry/strike call payoffs
averaged over sampled paths, compared against bid/ask quotes, plus the
empirical CDF percentile of the realized price among the samples.

TPU-native form: the payoff evaluation is vectorized over the full
``strike x expiry`` grid in one fused pass (:func:`price_call_grid`);
pandas appears only at the DataFrame edge (:func:`pricer`), exactly like
the reference's I/O boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ecdf",
    "price_call_grid",
    "price_put_grid",
    "pricer",
    "get_training_data",
    "get_true_value",
    "get_trading_days",
    "find_last_trading_days",
    "ECDF",
    "Pricer",
]


def ecdf(sample_pxs, true_px):
    """Fraction of sampled *log* prices below the realized log price
    (reference ``option_utils.py:48-51``)."""
    smp = jnp.log(jnp.asarray(sample_pxs))
    return jnp.mean((smp < jnp.log(true_px)).astype(jnp.float32), axis=-1)


@jax.jit
def price_call_grid(mc_pxs, strikes):
    """MC call values over a ``strike x expiry`` grid in one pass.

    ``mc_pxs``: ``(n_paths, n_expiries)`` sampled prices at each expiry.
    ``strikes``: ``(n_strikes,)``.  Returns ``(n_strikes, n_expiries)``
    ``mean(max(S - K, 0))`` — the vectorized form of the reference's
    per-row loop (``option_utils.py:28-40``).
    """
    payoff = jnp.maximum(mc_pxs[None, :, :] - strikes[:, None, None], 0.0)
    return jnp.mean(payoff, axis=1)


@jax.jit
def price_put_grid(mc_pxs, strikes):
    """MC put values ``mean(max(K - S, 0))`` over the same grid.

    No reference analog (``option_utils.Pricer`` values calls only); puts
    are the natural companion and are pinned to calls in tests through
    put-call parity on the same sampled paths:
    ``call - put = mean(S) - K`` exactly, path by path.
    """
    payoff = jnp.maximum(strikes[:, None, None] - mc_pxs[None, :, :], 0.0)
    return jnp.mean(payoff, axis=1)


def pricer(mc_pxs, options, edays, true_pxs, quote_price):
    """Option-chain valuation DataFrame (reference ``Pricer``,
    ``option_utils.py:26-45``).

    ``mc_pxs``: ``(n_paths, n_expiries)`` MC prices; ``options``: DataFrame
    with ``expiration/strike/bid/ask``; ``edays``: expiry dates aligned with
    the columns of ``mc_pxs``; ``true_pxs``: realized prices per expiry.
    """
    import pandas as pd

    mc = np.asarray(mc_pxs)
    true_pxs = np.asarray(true_pxs)
    logger = []
    for eday_idx, eday in enumerate(edays):
        eday = pd.Timestamp(eday)
        year = pd.DatetimeIndex([eday])[0].year
        opts = options[options.expiration == eday]
        if len(opts) == 0:
            continue
        strikes = jnp.asarray(opts.strike.to_numpy(), jnp.float32)
        vals = np.asarray(
            price_call_grid(jnp.asarray(mc[:, eday_idx:eday_idx + 1]),
                            strikes)
        )[:, 0]
        pct = float(ecdf(mc[:, eday_idx], float(true_pxs[eday_idx])))
        for i, (_, row) in enumerate(opts.iterrows()):
            rtn = max(true_pxs[eday_idx] - row.strike, 0.0)
            logger.append([
                eday, row.strike, row.bid, row.ask, float(vals[i]),
                float(rtn), float(true_pxs[eday_idx]), quote_price, year,
                pct,
            ])
    # columns passed to the constructor so an empty chain (no expiry
    # matched any eday) yields an empty frame with the right schema
    # instead of a "Length mismatch" ValueError from .columns assignment
    return pd.DataFrame(
        logger,
        columns=["Expiry", "Strike", "Bid", "Ask", "Voltron", "Return",
                 "ExpClose", "QuoteClose", "Year", "Sample_Percentile"],
    )


# --- pandas date helpers (reference option_utils.py:6-24) -------------------


def get_training_data(spy, date, n):
    idx = spy[spy["Date"] == date].index.item()
    return spy["Close"].iloc[(idx - n):idx]


def get_true_value(spy, date, strike):
    close_px = spy["Close"][spy["Date"] == date].item()
    return np.maximum(close_px - strike, 0)


def get_trading_days(spy, start, stop):
    start_idx = spy[spy["Date"] == start].index.item()
    stop_idx = spy[spy["Date"] == stop].index.item()
    return stop_idx - start_idx


def find_last_trading_days(spy, dates):
    last_days = [np.max(np.where(spy.Date < date)[0]) for date in dates]
    return np.array(spy.Date[last_days])


# Reference-style aliases
ECDF = ecdf
Pricer = pricer
