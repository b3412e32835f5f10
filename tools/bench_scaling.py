"""Sequence-length scaling study (secondary benchmark; the driver metric
stays in bench.py).

The reference's exact-GP machinery is O(n^3) per training iteration and
hard-capped at n ~ 2000; this pipeline's per-iteration work is O(n) for
the vol/data stages and O(n m^2) for sparse GPCV.  This script measures
end-to-end fit+rollout wall time across n on the real chip and writes
BENCH_SCALING.md.

Usage: python tools/bench_scaling.py [--sizes 400,2000,8000,25000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache


def run_one(n, horizon=100, nsample=1000, iters=300, m_inducing=256,
            reps=3):
    from volt_tpu.train import (
        learn_gpcv, learn_gpcv_sparse, train_vol_model, train_volt_magpie,
    )
    from volt_tpu.rollouts import rollouts

    rng = np.random.default_rng(0)
    dt = 1.0 / 252
    vol_true = 0.2 * np.exp(0.3 * np.sin(np.linspace(0, 20, n + 1)))
    rets = vol_true * rng.standard_normal(n + 1) * np.sqrt(dt)
    prices = jnp.asarray((100 * np.exp(np.cumsum(rets))).astype(np.float32))
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(horizon, dtype=jnp.float32) * dt + train_x[-1] + dt

    sparse = n > 1000

    def pipeline(key):
        if sparse:
            vol = learn_gpcv_sparse(train_x, prices, num_inducing=m_inducing,
                                    train_iters=iters)
        else:
            vol = learn_gpcv(train_x, prices, train_iters=iters)
        vol_state = train_vol_model(train_x, vol, train_iters=iters)
        model = train_volt_magpie(train_x, prices[1:], vol_state, vol,
                                  train_iters=iters, k=100,
                                  mean_func="ewma")
        return rollouts(key, model, train_x, prices, test_x,
                        nsample=nsample)

    jax.device_get(pipeline(jax.random.key(0)))  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = jax.device_get(pipeline(jax.random.key(r + 1)))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(out).all()
    return best, ("sparse-GPCV(m=%d)" % m_inducing) if sparse else "full GPCV"


def main(args):
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        secs, mode = run_one(n, nsample=args.nsample, iters=args.iters,
                             reps=args.reps)
        rows.append((n, secs, mode))
        print(f"n={n:>6}  {secs:7.3f}s  ({mode})", flush=True)

    lines = [
        "# BENCH_SCALING — sequence-length scaling (one v5e chip)",
        "",
        # provenance interpolated from the actual run config — a table
        # written at reduced shapes must not claim the production ones
        f"Fit (3x{args.iters} Adam iters) + {args.nsample}-path x "
        f"100-step rollout, single",
        f"asset, min of {args.reps} run(s).  The reference is "
        "O(n^3)/iteration and",
        "guards n <= ~2000 (`max_cholesky_size`, GPGenerator.py:62).",
        "",
        "| n | seconds | GPCV mode |",
        "|---|---|---|",
    ]
    for n, secs, mode in rows:
        lines.append(f"| {n} | {secs:.3f} | {mode} |")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=str, default="400,2000,8000,25000")
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--nsample", type=int, default=1000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "BENCH_SCALING.md"),
                   help="output markdown path (point elsewhere for "
                        "trial runs; the default overwrites the "
                        "repo-root table)")
    main(p.parse_args())
