"""What the Kronecker multitask vol coupling buys over independent fits.

The reference's multitask pieces (``MultitaskBMGP``, ``BMGP.py:30-56``;
the mtwind experiment, ``mtwind_plotting`` notebook) exist because
volatility is correlated *across* stations/tickers: gust fronts and
market-wide vol episodes hit every series at once.  This harness
measures that claim directly on a universe where the coupling is known:
``data.universes.corrvol_windows`` — T stations per window whose
log-vol shares one slow OU gust factor while the price innovations stay
independent, so volatility carries the ONLY cross-station structure.

Two lanes run the *same* machinery on *identical* per-station GPCV vol
paths (stage 1 is shared, isolating the vol-GP coupling):

* ``independent`` — ``train_volt_multitask`` + ``rollouts_multitask``
  per station with T=1 (the Kronecker machinery degenerated to a plain
  BMGP vol model: per-station fits, independent vol draws);
* ``multitask``  — the same calls once, jointly over all T stations
  (rank-1 task covariance; vol forecasts correlated across stations).

Scored on:

* per-station marginals (calib_err / crps / nll, pooled over
  W x T x H) — coupling can only help marginally, by pooling the
  shared gust level across stations;
* the cross-station **gust energy** ``G = mean_{i,t} (dlog p_{i,t})^2``
  over the horizon — a joint functional whose ensemble dispersion an
  independent-draw lane *structurally* underestimates (averaging T
  independent vol draws shrinks the shared-factor variance by ~1/T),
  reported as PIT-based calibration error, per-window CRPS, and the
  ensemble-dispersion ratio vs the realized spread.

Usage::

    python tools/eval_multitask.py [--windows 16] [--tasks 8] ...

Prints one JSON line per lane + a verdict line; honors
``JAX_PLATFORMS=cpu``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import numpy as np  # noqa: E402

from eval_compare import DT, LEVELS, metrics  # noqa: E402
from volt_tpu.data import corrvol_windows  # noqa: E402


def batched_gpcv(train_x, prices, iters, lr=0.01):
    """Identical per-station GPCV fits, vmapped over stations.

    ``prices`` (T, ntrain) -> vol paths (T, ntrain-1).  Both lanes get
    the same output, so any quality difference downstream is the vol-GP
    coupling alone.
    """
    from volt_tpu.models.gpcv import GPCVModel
    from volt_tpu.train import _adam_scan, scaled_returns

    module = GPCVModel(kernel="bm", q="tridiag")

    def fit_one(y):
        yy = scaled_returns(train_x, y)
        p = module.init(train_x, yy)
        p, _ = _adam_scan(lambda q: -module.elbo(q, train_x, yy), p, iters,
                          lr)
        return module.predicted_scale(p, train_x)

    return jax.jit(jax.vmap(fit_one))(jnp.asarray(prices))


def gust_energy(log_prices, last_logp):
    """G = mean squared log-increment across (station, step).

    ``log_prices`` (..., T, S, H) samples or (..., T, H) truth;
    ``last_logp`` (..., T) the final observed log price.  The first
    increment is taken from the last observed point so every horizon
    step contributes.
    """
    if log_prices.ndim == 3:  # samples (T, S, H) -> (S,)
        first = np.broadcast_to(last_logp[:, None, None],
                                (*log_prices.shape[:2], 1))
        d = np.diff(np.concatenate([first, log_prices], axis=-1), axis=-1)
        return (d ** 2).mean(axis=(0, 2))
    d = np.diff(np.concatenate([last_logp[:, None], log_prices], axis=-1),
                axis=-1)
    return float((d ** 2).mean())  # truth (T, H) -> scalar


def functional_metrics(g_samples, g_truth):
    """g_samples (W, S), g_truth (W,): PIT calibration + CRPS of the
    scalar gust-energy ensemble, pooled over windows."""
    w, s = g_samples.shape
    pits = (g_samples <= g_truth[:, None]).mean(axis=1)
    cov = np.array([((pits >= 0.5 - p / 2) & (pits <= 0.5 + p / 2)).mean()
                    for p in LEVELS])
    calib_err = float(np.abs(cov - LEVELS).mean())
    # sample-ensemble CRPS, exact O(S log S) form per window
    srt = np.sort(g_samples, axis=1)
    ranks = np.arange(1, s + 1)
    crps = float(np.mean(
        np.mean(np.abs(g_samples - g_truth[:, None]), axis=1)
        + np.mean(srt * (s + 1 - 2 * ranks) / s, axis=1)
    ))
    disp = float(np.mean(g_samples.std(axis=1)))
    return {"calib_err": round(calib_err, 4), "crps_x1e4": round(crps * 1e4, 4),
            "ens_std_x1e4": round(disp * 1e4, 4)}


def main(args):
    rng = np.random.default_rng(23)
    prices = corrvol_windows(rng, args.windows, args.tasks, args.ntrain,
                             args.horizon)
    w, tt, n_full = prices.shape
    ntrain, h = args.ntrain, args.horizon
    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(h, dtype=jnp.float32) * DT + train_x[-1] + DT
    truth = np.log(prices[:, :, ntrain:])  # (W, T, H)
    last_logp = np.log(prices[:, :, ntrain - 1])  # (W, T)

    from volt_tpu.rollouts import rollouts_multitask
    from volt_tpu.train import train_volt_multitask

    def run_lane(joint: bool):
        out = []
        key = jax.random.key(3)
        for b in range(w):
            train_p = prices[b, :, :ntrain]
            vols = batched_gpcv(train_x, train_p, args.iters)
            key, k_roll = jax.random.split(key)
            if joint:
                volt_state, mt_state = train_volt_multitask(
                    train_x, jnp.asarray(train_p[:, 1:]), vols,
                    train_iters=args.iters, vol_iters=args.vol_iters,
                    k=args.k, mean_func="ewma", rank=1,
                )
                samples = rollouts_multitask(
                    k_roll, volt_state, mt_state, jnp.asarray(train_p),
                    test_x, nsample=args.nsample,
                )  # (T, S, H)
            else:
                per = []
                for i in range(tt):
                    k_roll, k_i = jax.random.split(k_roll)
                    volt_state, mt_state = train_volt_multitask(
                        train_x, jnp.asarray(train_p[i:i + 1, 1:]),
                        vols[i:i + 1], train_iters=args.iters,
                        vol_iters=args.vol_iters, k=args.k,
                        mean_func="ewma", rank=1,
                    )
                    per.append(rollouts_multitask(
                        k_i, volt_state, mt_state,
                        jnp.asarray(train_p[i:i + 1]), test_x,
                        nsample=args.nsample,
                    )[0])
                samples = jnp.stack(per)
            out.append(np.asarray(samples))
        return np.stack(out)  # (W, T, S, H)

    results = {}
    for lname, joint in (("independent", False), ("multitask", True)):
        t0 = time.perf_counter()
        samples = run_lane(joint)
        marg = metrics(samples.reshape(w * tt, args.nsample, h),
                       truth.reshape(w * tt, h))
        g_s = np.stack([gust_energy(samples[b], last_logp[b])
                        for b in range(w)])  # (W, S)
        g_t = np.array([gust_energy(truth[b], last_logp[b])
                        for b in range(w)])  # (W,)
        func = functional_metrics(g_s, g_t)
        rec = {"lane": lname, "marginal": marg, "gust_energy": func,
               "sec": round(time.perf_counter() - t0, 1)}
        results[lname] = rec
        print(json.dumps(rec), flush=True)

    # realized cross-window spread of G as the dispersion yardstick
    g_t_std = float(np.std([gust_energy(truth[b], last_logp[b])
                            for b in range(w)]))
    ratio = (results["multitask"]["gust_energy"]["ens_std_x1e4"]
             / max(results["independent"]["gust_energy"]["ens_std_x1e4"],
                   1e-12))
    print(json.dumps({"verdict": {
        "realized_G_spread_x1e4": round(g_t_std * 1e4, 4),
        "mt_over_ind_dispersion": round(ratio, 3),
    }}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=16)
    p.add_argument("--tasks", type=int, default=8)
    p.add_argument("--ntrain", type=int, default=200)
    p.add_argument("--horizon", type=int, default=24)
    p.add_argument("--nsample", type=int, default=256)
    p.add_argument("--iters", type=int, default=200)
    # the /10-downscaled task-covariance init (reference parity,
    # BMGP.py:36-40) needs ~600 Adam steps to recover a DGP task
    # correlation of ~0.8 (0.64 at 200, 0.925 at 600); both lanes get
    # the same budget
    p.add_argument("--vol-iters", type=int, default=600)
    p.add_argument("--k", type=int, default=50)
    main(p.parse_args())
