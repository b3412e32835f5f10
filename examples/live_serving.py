"""Live-serving walkthrough: warm-start refits on a simulated tick stream.

A production forecaster holds a rolling window per asset and re-fits on
every new tick.  The reference refits each backtest window from scratch
(``experiments/stocks/GenerateMultiMeanPreds.py:63-137``); here the
previous fit's parameters seed the next one via
:func:`volt_tpu.parallel.warm_start`, so each tick runs the SAME
compiled program with ~10x fewer Adam iterations at the same fit
quality (pinned in ``tests/test_parallel.py::TestWarmStart``; on-chip
latency table in PERFORMANCE.md — 79 ms per 64-asset refit+forecast).

The loop below:

1. cold-fits a batch of assets on the first window (300+300+300 iters),
2. then, per arriving tick, slides every window by one, warm-starts
   from the previous parameters, re-fits with 30+30+30 iters, and
   forecasts a fresh on-device quantile fan.

Run:  python examples/live_serving.py  [--assets 8 --steps 200 --ticks 5]
      (--cpu to force the CPU backend)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Backend selection must run BEFORE any jax config/device use: sitecustomize
# force-selects the TPU plugin, a dead tunnel hangs its init, and the
# compilation cache must stay TPU-only (utils/platform.configure_backend).
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.data import sabr_paths
from volt_tpu.parallel import PipelineConfig, fit_forecast_batch, warm_start


def main(args):
    dt = 1.0 / 252
    n = args.steps - 1          # return-grid length of each window
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(args.horizon, dtype=jnp.float32) * dt \
        + train_x[-1] + dt

    # the simulated stream: `ticks` extra observations beyond window 0
    f, _ = sabr_paths(steps=args.steps + args.ticks, seed=11,
                      n_paths=args.assets)
    stream = jnp.asarray(f)

    base = dict(mean_func="ewma", k=min(100, max(2, n // 4)),
                nsample=args.nsample, output="quantiles")
    cold = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                          data_iters=args.iters, **base)
    warm = PipelineConfig(gpcv_iters=args.warm_iters,
                          vol_iters=args.warm_iters,
                          data_iters=args.warm_iters, **base)

    t0 = time.perf_counter()
    fan, aux = fit_forecast_batch(jax.random.key(0), train_x,
                                  stream[:, :args.steps], test_x, cold)
    fan = jax.device_get(fan)   # fetch = the only real barrier on axon
    print(f"cold fit      B={args.assets}  "
          f"{1e3 * (time.perf_counter() - t0):8.1f} ms  "
          f"ok={int(np.asarray(aux['ok']).sum())}/{args.assets}")

    for tick in range(1, args.ticks + 1):
        window = stream[:, tick:args.steps + tick]
        ip = warm_start(aux, shift=1, n=n)
        t0 = time.perf_counter()
        fan, aux = fit_forecast_batch(jax.random.key(tick), train_x,
                                      window, test_x, warm,
                                      init_params=ip)
        fan = jax.device_get(fan)
        med = fan[:, fan.shape[1] // 2, -1]   # median log-price at horizon
        print(f"tick {tick:3d} refit  B={args.assets}  "
              f"{1e3 * (time.perf_counter() - t0):8.1f} ms  "
              f"ok={int(np.asarray(aux['ok']).sum())}/{args.assets}  "
              f"median@H: {np.exp(med).mean():.3f}")
    print("(first warm call includes its compile; later ticks reuse it)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--assets", type=int, default=8)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--ticks", type=int, default=5)
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--warm-iters", type=int, default=30)
    p.add_argument("--nsample", type=int, default=256)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (handled pre-import)")
    main(p.parse_args())
