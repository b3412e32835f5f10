"""Stage ablation at the north-star shape on the real chip.

Times fit_forecast_batch variants that zero out one stage's iterations (or
the rollout) to decompose the per-batch cost; min-of-N fetch-timed (the
axon tunnel needs a device_get barrier and adds sporadic multi-second
stalls — see CLAUDE.md).

Usage:  python tools/ablate_stages.py [n_assets] [ntrain]
"""

import os
import sys

# repo root on sys.path for `python tools/ablate_stages.py` — deliberately
# NOT via PYTHONPATH, which the axon plugin's subprocess would inherit and
# trip over (repo dirs shadow its imports).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache


def main():
    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    n_assets = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ntrain = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    dt = 1.0 / 252
    n = ntrain - 1
    f, _ = sabr_paths(steps=ntrain, seed=0, n_paths=n_assets)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(100, dtype=jnp.float32) * dt + train_x[-1] + dt
    train_ys = jnp.asarray(f)

    iters = int(os.environ.get("ABLATE_ITERS", "300"))
    base = dict(gpcv_iters=iters, vol_iters=iters, data_iters=iters,
                mean_func="ewma", k=100,
                nsample=int(os.environ.get("ABLATE_NSAMPLE", "1000")),
                output=os.environ.get("BENCH_OUTPUT", "samples"))
    variants = {
        "full": {},
        "gpcv_1": {"gpcv_iters": 1},
        "vol_1": {"vol_iters": 1},
        "data_1": {"data_iters": 1},
        "mc_1path": {"nsample": 1},
    }
    from volt_tpu.utils.profiling import timed_best

    out = {}
    for name, delta in variants.items():
        cfg = PipelineConfig(**{**base, **delta})

        def run():
            s, _ = fit_forecast_batch(jax.random.key(0), train_x, train_ys,
                                      test_x, cfg)
            return s

        got, out[name] = timed_best(run, repeats=3)
        assert np.isfinite(np.asarray(got)).all(), name
        print(f"{name:10s} {out[name]*1e3:9.1f} ms", flush=True)

    full = out["full"]
    print("\nstage cost estimates (full minus ablated):")
    for name in ("gpcv_1", "vol_1", "data_1", "mc_1path"):
        print(f"  {name:10s} {(full - out[name])*1e3:9.1f} ms")
    print(f"  residual   {(out['gpcv_1'] + out['vol_1'] + out['data_1'] + out['mc_1path'] - 3*full)*1e3:9.1f} ms (overhead-ish)")
    print(f"\nthroughput: {n_assets/full:.1f} assets/sec/chip at ntrain={ntrain}")


if __name__ == "__main__":
    main()
