"""Sequence-length scaling of the full pipeline at batch B on one chip.

python tools/scaling_study.py  ->  markdown rows for BENCH_SCALING.md
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache


def main():
    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    b = int(os.environ.get("SCALE_ASSETS", "16"))
    iters = int(os.environ.get("SCALE_ITERS", "300"))
    nsample = int(os.environ.get("SCALE_NSAMPLE", "1000"))
    cfg = PipelineConfig(gpcv_iters=iters, vol_iters=iters,
                         data_iters=iters, mean_func="ewma", k=100,
                         nsample=nsample,
                         output=os.environ.get("BENCH_OUTPUT", "samples"))
    dt = 1.0 / 252
    sizes = tuple(int(s) for s in os.environ.get(
        "SCALE_NTRAIN", "400,1000,2000,4000,8000").split(","))
    for ntrain in sizes:
        n = ntrain - 1
        f, _ = sabr_paths(steps=ntrain, seed=0, n_paths=b)
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = jnp.arange(100, dtype=jnp.float32) * dt + train_x[-1] + dt
        ys = jnp.asarray(f)

        from volt_tpu.utils.profiling import timed_best

        def run():
            s, _ = fit_forecast_batch(jax.random.key(0), train_x, ys,
                                      test_x, cfg)
            return s

        got, best = timed_best(run, repeats=3)
        assert np.isfinite(np.asarray(got)).all(), ntrain
        print(f"| {ntrain} | {best:.3f} | {b / best:.1f} |", flush=True)


if __name__ == "__main__":
    main()
