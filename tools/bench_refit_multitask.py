"""Warm-refit latency for the multitask (Kronecker) pipeline at scale.

The multitask analog of ``tools/bench_refit.py`` — the mtwind/portfolio
live-serving loop re-fits all T coupled tasks each new tick.  The
reference has no multitask training driver at all, let alone a warm path;
here :func:`volt_tpu.parallel.warm_start_multitask` re-seeds the joint
GPCV, the Kronecker vol GP, and the per-task Volt fits from the previous
window's state, so the refit reuses the compiled program with ~10x fewer
iterations.  Measures cold fit vs warm refit wall time and the
warm-vs-cold vol-path agreement on the slid window; prints one JSON line.

Usage:  python tools/bench_refit_multitask.py [--tasks 505] [--ntrain 1000]
        [--iters 300] [--warm-iters 30] [--shift 1] [--nsample 100]
        [--horizon 100] [--reps 3]

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
    p.add_argument("--tasks", type=int, default=505)
    p.add_argument("--ntrain", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--warm-iters", type=int, default=30)
    p.add_argument("--shift", type=int, default=1)
    p.add_argument("--nsample", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import (MultitaskPipelineConfig,
                                   fit_forecast_multitask,
                                   warm_start_multitask)
    from volt_tpu.utils.profiling import timed_best

    n = args.ntrain - 1
    dt = 1.0 / 252
    f, _ = sabr_paths(steps=args.ntrain + args.shift, seed=0,
                      n_paths=args.tasks)
    prices = jnp.asarray(f)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt + dt
    test_x = jnp.arange(args.horizon, dtype=jnp.float32) * dt \
        + train_x[-1] + dt
    base = dict(nsample=args.nsample, output="quantiles",
                k=min(25, max(2, n // 4)))
    cold_cfg = MultitaskPipelineConfig(gpcv_iters=args.iters,
                                       vol_iters=args.iters,
                                       data_iters=args.iters, **base)
    w = args.warm_iters
    warm_cfg = MultitaskPipelineConfig(gpcv_iters=w, vol_iters=w,
                                       data_iters=w, **base)

    def cold_fit():
        return fit_forecast_multitask(jax.random.key(0), train_x,
                                      prices[:, :args.ntrain], test_x,
                                      cold_cfg)

    (_, aux0), cold_s = timed_best(cold_fit, repeats=args.reps)
    ip = warm_start_multitask(aux0, shift=args.shift, n=n)

    slid = prices[:, args.shift:args.ntrain + args.shift]

    def warm_refit():
        return fit_forecast_multitask(jax.random.key(1), train_x, slid,
                                      test_x, warm_cfg, init_params=ip)

    (_, aux_w), warm_s = timed_best(warm_refit, repeats=args.reps)

    # quality: warm refit vs a full cold fit of the same slid window
    _, aux_c = fit_forecast_multitask(jax.random.key(1), train_x, slid,
                                      test_x, cold_cfg)
    vw = np.asarray(aux_w["vols"])
    vc = np.asarray(aux_c["vols"])
    rel = np.abs(vw - vc) / vc
    print(json.dumps({
        "stage": "warm_refit_multitask",
        "tasks": args.tasks, "ntrain": args.ntrain,
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
