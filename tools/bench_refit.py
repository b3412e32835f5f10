"""Warm-refit latency at the north-star shape: the live-serving loop.

A production forecaster re-fits every asset each new tick.  The reference
refits every backtest window from scratch (``GenerateMultiMeanPreds.py:
63-137``); here :func:`volt_tpu.parallel.warm_start` seeds the Adam scans
from the previous window's fitted parameters, so the refit runs the SAME
compiled program with ~10x fewer iterations (quality pinned in
``tests/test_parallel.py::TestWarmStart``).  This harness measures the
cold fit vs the warm refit per batch, plus the warm/cold vol-path
agreement on the slid window, and prints one JSON line per config.

Usage:  python tools/bench_refit.py [--assets 64] [--ntrain 1000]
        [--iters 300] [--warm-iters 30] [--shift 1] [--nsample 1000]
        [--reps 3]

Honors ``JAX_PLATFORMS=cpu`` (toy smoke runs; the suite does this).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--assets", type=int, default=64)
    p.add_argument("--ntrain", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--warm-iters", type=int, default=30)
    p.add_argument("--shift", type=int, default=1)
    p.add_argument("--nsample", type=int, default=1000)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import (PipelineConfig, fit_forecast_batch,
                                   warm_start)
    from volt_tpu.utils.profiling import timed_best

    n = args.ntrain - 1
    dt = 1.0 / 252
    # shift extra steps so the slid window exists
    f, _ = sabr_paths(steps=args.ntrain + args.shift, seed=0,
                      n_paths=args.assets)
    prices = jnp.asarray(f)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(args.horizon, dtype=jnp.float32) * dt \
        + train_x[-1] + dt
    base = dict(mean_func="ewma", k=min(100, max(2, n // 4)),
                nsample=args.nsample, output="quantiles")
    cold_cfg = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                              data_iters=args.iters, **base)
    w = args.warm_iters
    warm_cfg = PipelineConfig(gpcv_iters=w, vol_iters=w, data_iters=w,
                              **base)

    def cold_fit():
        out, aux = fit_forecast_batch(jax.random.key(0), train_x,
                                      prices[:, :args.ntrain], test_x,
                                      cold_cfg)
        return out, aux

    (_, aux0), cold_s = timed_best(cold_fit, repeats=args.reps)
    ip = warm_start(aux0, shift=args.shift, n=n)

    slid = prices[:, args.shift:args.ntrain + args.shift]

    def warm_refit():
        out, aux = fit_forecast_batch(jax.random.key(1), train_x, slid,
                                      test_x, warm_cfg, init_params=ip)
        return out, aux

    (_, aux_w), warm_s = timed_best(warm_refit, repeats=args.reps)

    # quality: warm refit vs a full cold fit of the same slid window
    def cold_refit():
        return fit_forecast_batch(jax.random.key(1), train_x, slid,
                                  test_x, cold_cfg)

    _, aux_c = cold_refit()
    vw = np.asarray(aux_w["vol"])
    vc = np.asarray(aux_c["vol"])
    rel = np.abs(vw - vc) / vc
    print(json.dumps({
        "stage": "warm_refit",
        "assets": args.assets, "ntrain": args.ntrain,
        "backend": jax.default_backend(),
        "cold_ms": round(1e3 * cold_s, 1),
        "warm_ms": round(1e3 * warm_s, 1),
        "speedup": round(cold_s / warm_s, 2),
        "iters": args.iters, "warm_iters": w, "shift": args.shift,
        "vol_rel_err_mean": round(float(rel.mean()), 4),
        "vol_rel_err_max": round(float(rel.max()), 4),
        "ok": bool(np.asarray(aux_w["ok"]).all()),
    }))


if __name__ == "__main__":
    main()
