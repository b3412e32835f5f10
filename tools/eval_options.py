"""Option-valuation accuracy: MC prices from fitted forecasts vs truth.

The reference's third use case (after stock and wind forecasting) is
option valuation from MC forecast paths — ``option_utils.Pricer``
(``option_utils.py:26-45``) computes ``mean(max(S - K, 0))`` per
strike/expiry against an SPY chain.  The paper evaluates it on market
quotes, which need egress; this harness evaluates the same surface on
universes where the *true* conditional expected payoff is computable:

* ``GBM``  — `data.universes.gbm_windows` (driftless log random walk,
  known sigma): closed form,

      E[max(S_{t+h} - K, 0) | S_t] = Black76(F, K, V),
      F = S_t exp(V/2),  V = sigma^2 h dt

  (no Ito compensation in the generator, so the forward carries +V/2;
  no discounting anywhere, matching the reference's Pricer).  The
  constant-vol, well-specified-for-everyone case.

* ``SABR`` — `data.universes.sabr_windows(return_vol=True)` (the
  tutorial's stochastic-vol generator): no closed form; the oracle
  continues the TRUE Euler SDE from each window's final ``(F, V)``
  state with a large path count (``--oracle-paths``).  The latent
  ``V_last`` is hidden state the models must infer from prices — the
  regime the Volt machinery exists for.

Per lane (the eval_compare fit+rollout lanes, unchanged) it fits each
window, rolls out price paths, prices a moneyness x expiry grid of
calls AND puts through ``options.price_call_grid``/``price_put_grid``
(the production pricing surface), and scores against the oracle grid:

* ``mae_bps``  — mean |MC - oracle| / S_last, in basis points of spot,
  pooled over windows x strikes x expiries x {call, put};
* ``bias_bps`` — same but signed (systematic over/under-valuation);
* ``atm_rel``  — mean |MC - oracle| / oracle at the ATM strike, calls;
* ``fwd_bps``  — forward error |mean(S) - F_true| / S_last via put-call
  parity (call - put = F - K exactly, path by path): the *drift* leg of
  the pricing error;
* ``straddle_rel`` — relative error of the ATM straddle (call + put),
  which is delta-neutral at the forward: the *distribution-width* leg,
  insensitive to the forward error that dominates ``atm_rel``.

An ``oracle-mc`` lane draws ``--nsample`` paths from the TRUE law
(conditioned on the true final state, incl. the latent vol on SABR) —
the metric's floor at the lanes' sample count; fitted lanes cannot
beat it in expectation, and on SABR their gap to it is the price of
inferring the hidden vol state.

Usage::

    python tools/eval_options.py [--universe GBM|SABR] [--windows 32]

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
from volt_tpu.data import gbm_windows, sabr_windows  # noqa: E402
from volt_tpu.options import price_call_grid, price_put_grid  # noqa: E402

MONEYNESS = np.array([0.95, 1.00, 1.05])
# the SABR generator's own dynamics (data/synthetic.py defaults)
SABR = dict(alpha=1.25, beta=0.9, rho=-0.2)


def black76(fwd, k, v):
    """Undiscounted expected call payoff under lognormal(F, V)."""
    sv = np.sqrt(v)
    d1 = (np.log(fwd / k) + 0.5 * v) / sv
    return fwd * norm.cdf(d1) - k * norm.cdf(d1 - sv)


def grids_from_paths(px, strikes):
    """px (S, E) sampled prices, strikes (K,) -> call/put grids (K, E)."""
    return (np.asarray(price_call_grid(px, strikes)),
            np.asarray(price_put_grid(px, strikes)))


def sabr_continue(f_last, v_last, h, n_paths, dt, seed):
    """Continue the true SABR Euler scheme (data/synthetic.py:49-55,
    same floors) from per-window ``(F, V)``: prices (W, n_paths, h)."""
    rng = np.random.default_rng(seed)
    w = len(f_last)
    f = np.repeat(f_last[:, None], n_paths, axis=1).astype(np.float64)
    v = np.repeat(v_last[:, None], n_paths, axis=1).astype(np.float64)
    f_floor, v_floor = 1e-3 * 10.0, 1e-4
    out = np.empty((w, n_paths, h))
    for t in range(h):
        dw = rng.normal(0.0, np.sqrt(dt), (w, n_paths))
        dz = (SABR["rho"] * dw
              + np.sqrt(1 - SABR["rho"] ** 2)
              * rng.normal(0.0, np.sqrt(dt), (w, n_paths)))
        f = np.maximum(f + v * f ** SABR["beta"] * dw, f_floor)
        v = np.maximum(v + SABR["alpha"] * v * dz, v_floor)
        out[:, :, t] = f
    return out


def score(log_samples, s_last, expiry_idx, cf_call, cf_put, fwd_true):
    """log_samples (W, S, H) forecast log prices; cf_* (W, K, E) truth;
    fwd_true (W, E) the true conditional forward at each expiry."""
    w = log_samples.shape[0]
    abs_err, sgn_err, atm_rel, fwd_err, strad_rel = [], [], [], [], []
    for i in range(w):
        px = np.exp(np.asarray(log_samples[i]))[:, expiry_idx]  # (S, E)
        strikes = MONEYNESS * s_last[i]                          # (K,)
        mc_call, mc_put = grids_from_paths(px, strikes)
        err = np.concatenate([mc_call - cf_call[i], mc_put - cf_put[i]])
        abs_err.append(np.abs(err) / s_last[i])
        sgn_err.append(err / s_last[i])
        atm_rel.append(np.abs(mc_call[1] - cf_call[i][1]) / cf_call[i][1])
        fwd_err.append(np.abs(px.mean(axis=0) - fwd_true[i]) / s_last[i])
        strad = mc_call[1] + mc_put[1]                           # (E,)
        strad_true = cf_call[i][1] + cf_put[i][1]
        strad_rel.append(np.abs(strad - strad_true) / strad_true)
    return {
        "mae_bps": round(float(np.mean(abs_err)) * 1e4, 2),
        "bias_bps": round(float(np.mean(sgn_err)) * 1e4, 2),
        "atm_rel": round(float(np.mean(atm_rel)), 4),
        "fwd_bps": round(float(np.mean(fwd_err)) * 1e4, 2),
        "straddle_rel": round(float(np.mean(strad_rel)), 4),
    }


def main(args):
    rng = np.random.default_rng(7)
    expiry_idx = np.asarray(
        [int(t) for t in args.expiries.split(",")], dtype=int)
    assert expiry_idx.max() < args.horizon

    if args.universe == "GBM":
        sigma = 0.25
        prices = gbm_windows(rng, args.windows, args.ntrain, args.horizon,
                             vol=sigma)
        s_last = prices[:, args.ntrain - 1].astype(np.float64)
        v = sigma**2 * (expiry_idx + 1) * DT                     # (E,)
        fwd = s_last[:, None, None] * np.exp(0.5 * v)            # (W,1,E)
        strikes = MONEYNESS[None, :, None] * s_last[:, None, None]
        cf_call = black76(fwd, strikes, v[None, None, :])        # (W,K,E)
        cf_put = cf_call - (fwd - strikes)
        fwd_true = fwd[:, 0, :]                                  # (W,E)

        def true_paths(n_paths, seed):
            z = np.random.default_rng(seed).standard_normal(
                (args.windows, n_paths, args.horizon))
            return np.exp(np.log(s_last)[:, None, None]
                          + np.cumsum(sigma * np.sqrt(DT) * z, axis=-1))
    else:  # SABR
        prices, vols = sabr_windows(args.windows, args.ntrain, args.horizon,
                                    return_vol=True)
        s_last = prices[:, args.ntrain - 1].astype(np.float64)
        v_last = vols[:, args.ntrain - 1].astype(np.float64)
        dt = 1.0 / (args.ntrain + args.horizon)  # the generator's grid

        def true_paths(n_paths, seed):
            return sabr_continue(s_last, v_last, args.horizon, n_paths,
                                 dt, seed)

        big = true_paths(args.oracle_paths, seed=3)[:, :, expiry_idx]
        fwd_true = big.mean(axis=1)                              # (W,E)
        cf_call = np.empty((args.windows, len(MONEYNESS), len(expiry_idx)))
        cf_put = np.empty_like(cf_call)
        for i in range(args.windows):
            cf_call[i], cf_put[i] = grids_from_paths(
                big[i], MONEYNESS * s_last[i])

    lanes = {
        "oracle-mc": lambda p: np.log(
            true_paths(args.nsample, seed=5)),
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
        m = score(log_samples, s_last, expiry_idx, cf_call, cf_put,
                  fwd_true)
        m["sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"universe": args.universe, "lane": lname, **m}),
              flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--universe", choices=["GBM", "SABR"], default="GBM")
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--ntrain", type=int, default=252)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--nsample", type=int, default=1024)
    p.add_argument("--oracle-paths", type=int, default=16384)
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
