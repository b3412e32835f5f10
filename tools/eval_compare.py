"""Head-to-head forecast quality: Volt vs the reference's own baselines.

The reference paper's headline evaluation ("Volatility Based Kernels and
Moving Average Means...", ICML 2022; the in-repo `calib_plotter`
notebook, SURVEY.md §4/§6) compares Volt+Magpie against standard exact
GPs (Matérn / spectral-mixture with moving-average means,
``BasicGPModels.py``) and an LSTM (``models/LSTM.py``) on forecast
*calibration* and likelihood.  The reference ships the machinery but no
numbers; this harness runs that comparison end-to-end in volt_tpu on
synthetic universes where the dynamics (and thus the fairness of the
comparison) are known:

* GBM  — constant vol 0.25, zero drift;
* SABR — stochastic-vol paths (the tutorial's generator, harder);
* WIND — squared-OU mean-reverting speed surrogate (+1-shifted like the
  reference's USCRN preprocessing); the Volt lane uses the reference's
  wind config — EWMA(k=400) mean with theta=0.01 mean-reverting
  rollouts (``GPGenerator.py:68-107``);
* WINDGUST — the same speed process with stochastic log-vol gust
  episodes (``data.universes.gusty_wind_windows``): the heteroscedastic
  end of the wind bracket, the regime the Volt paper targets.

Per (universe, model) it reports, pooled over W independent forecast
windows x H horizon steps, all in log-price space:

* ``calib_err`` — mean_p |empirical central-interval coverage(p) − p|
  over nine nominal levels 10%..90% (the notebook's curve-vs-diagonal
  distance);
* ``crps`` — mean sample-ensemble CRPS against the realized path;
* ``nll`` — mean Gaussian NLL of the realized value under the
  ensemble's per-step mean/std.

Usage::

    python tools/eval_compare.py [--windows 32] [--out EVALUATION.md]

Prints one JSON line per (universe, model); ``--out`` writes the
markdown tables.  Honors ``JAX_PLATFORMS=cpu``.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache

import numpy as np  # noqa: E402

DT = 1.0 / 252
LEVELS = np.linspace(0.1, 0.9, 9)


# single source of the evaluation universes (shared with
# examples/calibration_study.py): volt_tpu.data.universes
from volt_tpu.data import (  # noqa: E402
    gbm_windows,
    gusty_wind_windows,
    sabr_windows,
    wind_windows,
)


def metrics(samples, truth):
    """samples (W, S, H) log-price forecasts; truth (W, H) realized."""
    from volt_tpu.calibration import crps

    from volt_tpu.calibration import interval_coverage

    cov = interval_coverage(samples, truth, LEVELS)
    calib_err = float(np.abs(cov - LEVELS).mean())
    crps_val = float(np.mean(jax.vmap(crps)(jnp.asarray(samples),
                                            jnp.asarray(truth))))
    mu = samples.mean(axis=1)
    sd = samples.std(axis=1) + 1e-9
    nll = float(np.mean(0.5 * ((truth - mu) / sd) ** 2 + np.log(sd)
                        + 0.5 * math.log(2 * math.pi)))
    return {"calib_err": round(calib_err, 4), "crps": round(crps_val, 5),
            "nll": round(nll, 4)}


def volt_lane(prices, ntrain, h, iters, nsample, k, theta=None):
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(h, dtype=jnp.float32) * DT + train_x[-1] + DT
    cfg = PipelineConfig(gpcv_iters=iters, vol_iters=iters, data_iters=iters,
                         mean_func="ewma", k=k, nsample=nsample, theta=theta)
    samples, aux = fit_forecast_batch(
        jax.random.key(0), train_x, jnp.asarray(prices[:, :ntrain]),
        test_x, cfg,
    )
    ok = np.asarray(aux["ok"])
    assert ok.all(), f"volt lane failed windows: {np.where(~ok)[0]}"
    return np.asarray(samples)


def basic_lane(prices, ntrain, h, iters, nsample, k, kernel_name):
    from volt_tpu.experiments.basic_wind import make_basic_model
    from volt_tpu.rollouts import nonvol_rollouts

    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(h, dtype=jnp.float32) * DT + train_x[-1] + DT
    out = []
    key = jax.random.key(0)
    for widx in range(prices.shape[0]):
        train_y = jnp.asarray(prices[widx, :ntrain])[1:]
        key, k_fit, k_s = jax.random.split(key, 3)
        model = make_basic_model(train_x, jnp.log(train_y), kernel_name,
                                 "ewma", k, iters, num_mixtures=10,
                                 key=k_fit)
        out.append(np.asarray(nonvol_rollouts(k_s, model, train_x, train_y,
                                              test_x, nsample=nsample)))
    return np.stack(out)


def lstm_lane(prices, ntrain, h, epochs, nsample, seq_len=20):
    from volt_tpu.models.lstm import train_lstm

    out = []
    key = jax.random.key(0)
    for widx in range(prices.shape[0]):
        log_y = np.log(prices[widx, :ntrain].astype(np.float32))
        key, k_fit, k_s = jax.random.split(key, 3)
        state = train_lstm(log_y, seq_len=seq_len, hidden_size=64,
                           num_layers=1, epochs=epochs, batch_size=128,
                           key=k_fit)
        out.append(np.asarray(state.forecast(k_s, h, nsample)))
    return np.stack(out)


def main(args):
    rng = np.random.default_rng(7)
    # per-universe Magpie window + mean-reversion: stocks use the
    # stock-backtest defaults; wind uses the reference's EWMA(k=400) +
    # theta=0.01 rollouts (GPGenerator.py:68-107)
    universes = {
        "GBM": (gbm_windows(rng, args.windows, args.ntrain, args.horizon),
                dict(k=args.k, theta=None)),
        "SABR": (sabr_windows(args.windows, args.ntrain, args.horizon),
                 dict(k=args.k, theta=None)),
        "WIND": (wind_windows(rng, args.windows, args.ntrain, args.horizon),
                 dict(k=min(400, args.ntrain - 1), theta=0.01)),
        # the heteroscedastic end of the wind bracket (WIND is the
        # stationary end): same mean reversion, stochastic log-vol gust
        # episodes — the regime the Volt paper targets.  Same reference
        # wind config.
        "WINDGUST": (gusty_wind_windows(rng, args.windows, args.ntrain,
                                        args.horizon),
                     dict(k=min(400, args.ntrain - 1), theta=0.01)),
    }
    if args.universes:
        keep = set(args.universes.split(","))
        universes = {n: u for n, u in universes.items() if n in keep}

    def lanes_for(ucfg):
        return {
            "volt-ewma": lambda p: volt_lane(
                p, args.ntrain, args.horizon, args.iters, args.nsample,
                ucfg["k"], ucfg["theta"]),
            "matern-ewma": lambda p: basic_lane(
                p, args.ntrain, args.horizon, args.basic_iters,
                args.nsample, ucfg["k"], "matern"),
            "sm-ewma": lambda p: basic_lane(
                p, args.ntrain, args.horizon, args.basic_iters,
                args.nsample, ucfg["k"], "sm"),
            "lstm": lambda p: lstm_lane(
                p, args.ntrain, args.horizon, args.lstm_epochs,
                args.nsample),
        }

    tables = {}
    for uname, (prices, ucfg) in universes.items():
        truth = np.log(prices[:, args.ntrain:])
        rows = {}
        lanes = lanes_for(ucfg)
        if args.lanes:
            keep = set(args.lanes.split(","))
            lanes = {n: f for n, f in lanes.items() if n in keep}
        for lname, fn in lanes.items():
            t0 = time.perf_counter()
            samples = fn(prices)
            m = metrics(samples, truth)
            m["sec"] = round(time.perf_counter() - t0, 1)
            rows[lname] = m
            print(json.dumps({"universe": uname, "model": lname, **m}),
                  flush=True)
        tables[uname] = rows

    if args.out:
        lines = [
            "# EVALUATION — forecast quality, Volt vs the reference's "
            "baselines",
            "",
            "The reference paper's headline comparison (calibration / "
            "likelihood of Volt+Magpie",
            "vs standard exact GPs with moving-average means and an LSTM), "
            "run end-to-end in",
            "volt_tpu on synthetic universes with known dynamics "
            "(`tools/eval_compare.py`;",
            f"W={args.windows} windows, ntrain={args.ntrain}, "
            f"H={args.horizon}, S={args.nsample}, log-price space, "
            "pooled over windows x steps).",
            "",
            "Metrics: `calib_err` = mean |central-interval coverage - "
            "nominal| over levels",
            "10%..90% (the reference notebook's curve-vs-diagonal "
            "distance); `crps`; Gaussian",
            "ensemble `nll`.  Lower is better for all three.",
            "",
        ]
        for uname, rows in tables.items():
            lines += [f"## {uname}", "",
                      "| model | calib_err | crps | nll |",
                      "|---|---|---|---|"]
            for lname, m in rows.items():
                lines.append(f"| {lname} | {m['calib_err']:.3f} | "
                             f"{m['crps']:.4f} | {m['nll']:.3f} |")
            lines.append("")
        with open(args.out, "w") as fh:
            fh.write("\n".join(lines))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--ntrain", type=int, default=252)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--nsample", type=int, default=256)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--basic_iters", type=int, default=400)
    p.add_argument("--lstm_epochs", type=int, default=40)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--lanes", type=str, default="",
                   help="comma-separated subset of "
                        "volt-ewma,matern-ewma,sm-ewma,lstm")
    p.add_argument("--universes", type=str, default="",
                   help="comma-separated subset of GBM,SABR,WIND,WINDGUST")
    p.add_argument("--out", type=str, default="")
    main(p.parse_args())
