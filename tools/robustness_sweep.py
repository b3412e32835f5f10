"""Production-robustness sweep: ok-lane rates at the north-star scale.

Runs the full 500-asset pipeline over several independent synthetic
universes and reports the per-asset ``ok`` fraction and forecast-finite
rate — the round-3 evidence that the per-asset failure-lane design
(`parallel/pipeline.py`) holds at production scale, not just in unit
tests.

Usage: ``python tools/robustness_sweep.py [--seeds 1 2 3 4]``
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--assets", type=int, default=500)
    ap.add_argument("--ntrain", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--nsample", type=int, default=1000)
    args = ap.parse_args()

    import numpy as np

    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    dt = 1.0 / 252
    n = args.ntrain - 1
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = train_x[-1] + dt * jnp.arange(1, 101, dtype=jnp.float32)
    cfg = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                         data_iters=args.iters,
                         mean_func="ewma", k=100, nsample=args.nsample,
                         output="quantiles")

    total_ok = total = 0
    for seed in args.seeds:
        f, _ = sabr_paths(steps=args.ntrain, seed=seed,
                          n_paths=args.assets)
        t0 = time.perf_counter()
        fan, aux = fit_forecast_batch(jax.random.key(seed), train_x,
                                      jnp.asarray(f), test_x, cfg)
        fan = jax.device_get(fan)
        ok = jax.device_get(aux["ok"])
        el = time.perf_counter() - t0
        total_ok += int(ok.sum())
        total += len(ok)
        print(json.dumps({
            "seed": seed, "assets": args.assets,
            "ok": int(ok.sum()), "fan_finite": bool(np.isfinite(fan).all()),
            "sec": round(el, 2),
        }), flush=True)
    print(json.dumps({"total_ok": total_ok, "total": total,
                      "ok_rate": round(total_ok / total, 5)}), flush=True)


if __name__ == "__main__":
    main()
