"""FBM-kernel pipeline scaling (round-2 verdict item 6).

With ``kernel="fbm"`` there is no Markov/spectral shortcut: the GPCV ELBO
Choleskys ``kuu`` every step and the vol GP pays a dense MLL — the only
per-iteration factorizations left in the package (reference-parity
complexity: FBM is not Markov, ``FBMKernel.py:38-59``).  This measures
what that actually costs on-chip so BENCH_SCALING.md can state the
practical n-cap.

Usage: ``python tools/bench_fbm.py --ntrain 400 1000 2000 --assets 8``
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
    ap.add_argument("--ntrain", type=int, nargs="+",
                    default=[400, 1000, 2000])
    ap.add_argument("--assets", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--nsample", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import numpy as np

    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    dt = 1.0 / 252
    for ntrain in args.ntrain:
        n = ntrain - 1
        cfg = PipelineConfig(
            gpcv_iters=args.iters, vol_iters=args.iters,
            data_iters=args.iters, kernel="fbm", mean_func="ewma", k=100,
            nsample=args.nsample,
        )
        f, _ = sabr_paths(steps=ntrain, seed=0, n_paths=args.assets)
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = train_x[-1] + dt * jnp.arange(1, args.horizon + 1,
                                               dtype=jnp.float32)

        from volt_tpu.utils.profiling import timed_best

        def run(key):
            s, aux = fit_forecast_batch(key, train_x, jnp.asarray(f),
                                        test_x, cfg)
            return s, aux["ok"]

        t0 = time.perf_counter()
        jax.device_get(run(jax.random.key(0)))
        warm = time.perf_counter() - t0
        (out, ok), best = timed_best(lambda: run(jax.random.key(1)),
                                     repeats=args.repeats)
        out = np.asarray(out)
        ok = np.asarray(ok)
        print(json.dumps({
            "kernel": "fbm", "ntrain": ntrain, "assets": args.assets,
            "iters_per_stage": args.iters,
            "batch_sec": round(best, 2),
            "assets_per_sec": round(args.assets / best, 3),
            "warm_compile_sec": round(warm, 1),
            "finite": bool(np.isfinite(out).all()),
            "ok_frac": float(np.mean(ok)),
        }), flush=True)


if __name__ == "__main__":
    main()
