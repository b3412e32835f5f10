"""Option-valuation accuracy: MC prices from fitted forecasts vs closed form.

The reference's third use case (after stock and wind forecasting) is
option valuation from MC forecast paths — ``option_utils.Pricer``
(``option_utils.py:26-45``) computes ``mean(max(S - K, 0))`` per
strike/expiry against an SPY chain.  The paper evaluates it on market
quotes, which need egress; this harness evaluates the same surface on a
universe where the *true* expected payoff is closed-form: the GBM
evaluation universe (`data.universes.gbm_windows` — driftless log
random walk, known sigma), where

    E[max(S_{t+h} - K, 0) | S_t]  =  Black76(F, K, V),
    F = S_t * exp(V / 2),  V = sigma^2 * h * dt

(no Ito compensation in the generator, so the forward carries the
+V/2; no discounting anywhere, matching the reference's Pricer).

Per lane (the eval_compare fit+rollout lanes, unchanged) it fits each
window, rolls out price paths, prices a moneyness x expiry grid of
calls AND puts through ``options.price_call_grid``/``price_put_grid``
(the production pricing surface), and scores against the closed form:

* ``mae_bps``  — mean |MC - closed| / S_last, in basis points of spot,
  pooled over windows x strikes x expiries x {call, put};
* ``bias_bps`` — same but signed (systematic over/under-valuation);
* ``atm_rel``  — mean |MC - closed| / closed at the ATM strike only
  (relative error where the option has full value).

An ``oracle-mc`` lane draws the same number of sample paths from the
TRUE data law anchored at the same S_last — the metric's MC noise
floor at this nsample; a fitted lane cannot beat it in expectation.

Usage::

    python tools/eval_options.py [--windows 32] [--lanes volt-ewma,...]

Prints one JSON line per lane; honors ``JAX_PLATFORMS=cpu``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: F401  (backend configured before heavy imports)

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import numpy as np  # noqa: E402
from scipy.stats import norm  # noqa: E402

from eval_compare import DT, basic_lane, lstm_lane, volt_lane  # noqa: E402
from volt_tpu.data import gbm_windows  # noqa: E402
from volt_tpu.options import price_call_grid, price_put_grid  # noqa: E402

MONEYNESS = np.array([0.95, 1.00, 1.05])


def black76(fwd, k, v):
    """Undiscounted expected call payoff under lognormal(F, V)."""
    sv = np.sqrt(v)
    d1 = (np.log(fwd / k) + 0.5 * v) / sv
    return fwd * norm.cdf(d1) - k * norm.cdf(d1 - sv)


def score(log_samples, s_last, expiry_idx, sigma):
    """log_samples (W, S, H) forecast log prices; s_last (W,) anchors."""
    w = log_samples.shape[0]
    abs_err, sgn_err, atm_rel = [], [], []
    for i in range(w):
        px = np.exp(np.asarray(log_samples[i]))[:, expiry_idx]  # (S, E)
        strikes = MONEYNESS * s_last[i]                          # (K,)
        mc_call = np.asarray(price_call_grid(px, strikes))       # (K, E)
        mc_put = np.asarray(price_put_grid(px, strikes))
        v = sigma**2 * (expiry_idx + 1) * DT                     # (E,)
        fwd = s_last[i] * np.exp(0.5 * v)
        cf_call = black76(fwd[None, :], strikes[:, None], v[None, :])
        cf_put = cf_call - (fwd[None, :] - strikes[:, None])
        err = np.concatenate([mc_call - cf_call, mc_put - cf_put])
        abs_err.append(np.abs(err) / s_last[i])
        sgn_err.append(err / s_last[i])
        atm = np.abs(mc_call[1] - cf_call[1]) / cf_call[1]       # (E,)
        atm_rel.append(atm)
    return {
        "mae_bps": round(float(np.mean(abs_err)) * 1e4, 2),
        "bias_bps": round(float(np.mean(sgn_err)) * 1e4, 2),
        "atm_rel": round(float(np.mean(atm_rel)), 4),
    }


def oracle_mc_lane(s_last, h, nsample, sigma, seed=3):
    """Sample paths from the TRUE law anchored at s_last: the noise floor."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((len(s_last), nsample, h))
    logp = np.log(s_last)[:, None, None] + np.cumsum(
        sigma * np.sqrt(DT) * z, axis=-1)
    return logp


def main(args):
    rng = np.random.default_rng(7)
    sigma = 0.25
    prices = gbm_windows(rng, args.windows, args.ntrain, args.horizon,
                         vol=sigma)
    s_last = prices[:, args.ntrain - 1].astype(np.float64)
    expiry_idx = np.asarray(
        [int(t) for t in args.expiries.split(",")], dtype=int)
    assert expiry_idx.max() < args.horizon

    lanes = {
        "oracle-mc": lambda p: oracle_mc_lane(
            s_last, args.horizon, args.nsample, sigma),
        "volt-ewma": lambda p: volt_lane(
            p, args.ntrain, args.horizon, args.iters, args.nsample, args.k),
        "matern-ewma": lambda p: basic_lane(
            p, args.ntrain, args.horizon, args.basic_iters, args.nsample,
            args.k, "matern"),
        "sm-ewma": lambda p: basic_lane(
            p, args.ntrain, args.horizon, args.basic_iters, args.nsample,
            args.k, "sm"),
        "lstm": lambda p: lstm_lane(
            p, args.ntrain, args.horizon, args.lstm_epochs, args.nsample),
    }
    if args.lanes:
        keep = set(args.lanes.split(","))
        lanes = {n: f for n, f in lanes.items() if n in keep}

    for lname, fn in lanes.items():
        t0 = time.perf_counter()
        log_samples = fn(prices)
        m = score(log_samples, s_last, expiry_idx, sigma)
        m["sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"lane": lname, **m}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--ntrain", type=int, default=252)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--nsample", type=int, default=1024)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--basic_iters", type=int, default=400)
    p.add_argument("--lstm_epochs", type=int, default=40)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--expiries", type=str, default="4,9,19",
                   help="0-based horizon indices used as expiries")
    p.add_argument("--lanes", type=str, default="",
                   help="comma-separated subset of oracle-mc,volt-ewma,"
                        "matern-ewma,sm-ewma,lstm")
    main(p.parse_args())
