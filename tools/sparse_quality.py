"""Sparse-GPCV quality vs the full-resolution family on the SABR oracle.

The long-context story (sparse GPCV at O(n m^2)/step for n far past the
reference's ~2000-point `max_cholesky_size` cap, `GPGenerator.py:62`) needs
a *quality* leg, not just a throughput one: at an n where both families
run, how much vol-recovery accuracy does the m-inducing-point family give
up against the full-resolution fit, as a function of m?

Protocol: one SABR path (`volt_tpu.data.sabr_paths`, the example.ipynb
oracle) discretized at n points; `learn_gpcv` (the production
tridiagonal-precision family — full resolution, contains the dense
family's optimum) vs `learn_gpcv_sparse` at each m; error is the mean
relative deviation from the true latent vol path (the same metric as
`tests/test_pipeline.py::TestNotebookConfigRecovery`).

Usage:
    python tools/sparse_quality.py [--n 2000] [--ms 64,128,256]
        [--iters 400] [--spot-n 0] [--seed 2019]

`--spot-n 16000` appends a sparse-only spot row at a length the
full-resolution ELBO still handles but the reference cannot (rel-err vs
the true path; no dense lane).  Honors JAX_PLATFORMS=cpu.  Prints one
JSON object (consumed by BENCH_SCALING.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()


def rel_err(vol_hat, v_true):
    vol_hat = np.asarray(vol_hat)
    return float(np.mean(np.abs(vol_hat - v_true) / v_true))


def make_oracle(n: int, seed: int):
    """SABR path at n+1 steps over a 1-year horizon (finer discretization
    of the same tutorial oracle as n grows)."""
    from volt_tpu.data import sabr_paths

    f, v = sabr_paths(steps=n + 1, seed=seed)
    dt = 1.0 / (n + 1)
    train_x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) + dt
    return train_x, jnp.asarray(f), v[1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--ms", default="64,128,256")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--spot-n", type=int, default=0)
    ap.add_argument("--seed", type=int, default=2019)
    args = ap.parse_args()

    from volt_tpu.train import learn_gpcv, learn_gpcv_sparse

    train_x, f, v_true = make_oracle(args.n, args.seed)
    out = {"n": args.n, "iters": args.iters, "seed": args.seed}

    t0 = time.perf_counter()
    vol = learn_gpcv(train_x, f, train_iters=args.iters)
    vol = np.asarray(vol)  # fetch = barrier
    out["dense"] = {"rel_err": rel_err(vol, v_true),
                    "secs": round(time.perf_counter() - t0, 2)}

    out["sparse"] = {}
    for m in [int(s) for s in args.ms.split(",")]:
        t0 = time.perf_counter()
        vol_m = learn_gpcv_sparse(train_x, f, num_inducing=m,
                                  train_iters=args.iters)
        vol_m = np.asarray(vol_m)
        out["sparse"][str(m)] = {
            "rel_err": rel_err(vol_m, v_true),
            "ratio_vs_dense": round(
                rel_err(vol_m, v_true) / out["dense"]["rel_err"], 3),
            "secs": round(time.perf_counter() - t0, 2),
        }

    if args.spot_n:
        sx, sf, sv = make_oracle(args.spot_n, args.seed)
        t0 = time.perf_counter()
        vol_s = np.asarray(learn_gpcv_sparse(sx, sf, num_inducing=256,
                                             train_iters=args.iters))
        out["spot"] = {"n": args.spot_n, "m": 256,
                       "rel_err": rel_err(vol_s, sv),
                       "secs": round(time.perf_counter() - t0, 2)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
