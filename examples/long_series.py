"""Long-series forecasting: one asset, n in the tens of thousands.

The reference caps training length at n ~ 2000 (exact-GP Cholesky guard,
``stocks/ForecastGenerator.py:61``: ``data[-min(len(data), 2000):]``) —
its GPCV, vol GP, and rollout all factorize dense n x n objects.  Here
every stage is O(n) in time and memory at any n:

* GPCV: tridiagonal-precision variational family + natural-gradient VI
  (n-independent convergence, ``gp/natural.py``);
* vol GP: closed-form min-kernel spectrum with Bluestein-FFT projections
  (``ops/brownian.min_kernel_project`` — past n=4096 no n x n basis is
  ever built, so n=40,000+ works where the materialized basis would
  need gigabytes);
* forecast: filtered-state Brownian sampling + O(1)/step Markov
  rollouts (no joint covariance).

Run:  python examples/long_series.py [--steps 20000 --horizon 100]
      (--cpu to force the CPU backend)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Backend selection must run BEFORE any jax config/device use (a dead
# TPU tunnel hangs init; utils/platform.configure_backend handles it).
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.data import sabr_paths
from volt_tpu.parallel import PipelineConfig, fit_forecast


def main(args):
    dt = 1.0 / 252
    n = args.steps - 1
    f, vol_true = sabr_paths(steps=args.steps, seed=7)  # (steps,) each
    prices = jnp.asarray(f)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt + dt
    test_x = train_x[-1] + dt * jnp.arange(1, args.horizon + 1)

    cfg = PipelineConfig(
        gpcv_iters=args.iters, vol_iters=args.iters, data_iters=args.iters,
        mean_func="ewma", k=min(args.k, n // 2), nsample=args.nsample,
        output="quantiles",
    )

    t0 = time.perf_counter()
    fan, aux = fit_forecast(jax.random.key(0), train_x, prices, test_x, cfg)
    fan = jax.device_get(fan)  # fetch = the only reliable barrier here
    wall = time.perf_counter() - t0
    assert np.isfinite(fan).all() and bool(aux["ok"])

    vol = np.asarray(jax.device_get(aux["vol"]))
    rel = float(np.mean(np.abs(vol - vol_true[1:]) / vol_true[1:]))
    print(f"n={n}: fit+forecast in {wall:.2f}s "
          f"(first call includes compile)")
    print(f"vol-path recovery rel-err vs the SABR oracle: {rel:.3f}")
    med = fan[len(cfg.quantile_levels) // 2]
    print(f"long-series quantile fan: median day-1 {med[0]:+.4f}, "
          f"day-{args.horizon} {med[-1]:+.4f} (log-price)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--nsample", type=int, default=512)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    main(args)
