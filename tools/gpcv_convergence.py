"""Diagnose the full-resolution GPCV convergence vs n (VERDICT r4 item 1).

Round 4's sparse-quality table showed the production full-resolution
tridiagonal-precision family (rel-err 0.297 @ 400 iters, 0.252 @ 1000) losing
to a 64-inducing-point sparse fit (0.220) at n=2000 on the SABR oracle — a
family that *contains* the dense optimum being beaten by a 30x-smaller one.
This harness separates the hypotheses:

* under-convergence (rel-err still falling at the iteration budget)?
* init quality degrading with n (the Laplace/running-std start)?
* lr mis-scaled with n (the per-datum-normalized ELBO shrinks per-coordinate
  gradients as n grows)?
* or a genuine regularization effect (the m-point bottleneck smooths)?

Protocol: the same SABR oracle as `tools/sparse_quality.py` (seed 2019);
for each n and lr, fit the full-resolution family in chunks and record
rel-err + ELBO after each chunk, plus the rel-err of the initialization
itself (iter 0).

Measured answer (recorded in BENCH_SCALING.md): under-convergence — at
n=2000 Adam @ lr=0.01 is still descending at 4000 iters (0.297 -> 0.222,
approaching the sparse 0.220 asymptote n=500 reaches by ~1000), and
lr=0.03 diverges.  The conditioning of the tridiag parameterization
degrades with n; natural-gradient VI (``--opt ngvi``, gp/natural.py)
reaches the same optimum in ~10 iterations at every n.

Usage:
    python tools/gpcv_convergence.py [--ns 500,1000,2000] [--lrs 0.01,0.03]
        [--chunks 400,600,1000,2000] [--opt adam|ngvi] [--seed 2019]

Honors JAX_PLATFORMS=cpu.  Prints one JSON object.
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
    return float(np.mean(np.abs(np.asarray(vol_hat) - v_true) / v_true))


def make_oracle(n: int, seed: int):
    from volt_tpu.data import sabr_paths

    f, v = sabr_paths(steps=n + 1, seed=seed)
    dt = 1.0 / (n + 1)
    train_x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) + dt
    return train_x, jnp.asarray(f), v[1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="500,1000,2000")
    ap.add_argument("--lrs", default="0.01,0.03")
    ap.add_argument("--chunks", default="400,600,1000,2000",
                    help="iteration increments; cumulative budgets are the "
                         "running sums")
    ap.add_argument("--opt", default="adam", choices=["adam", "ngvi"])
    ap.add_argument("--seed", type=int, default=2019)
    args = ap.parse_args()

    from volt_tpu.models.gpcv import GPCVModel, GPCVState
    from volt_tpu.train import _fit_gpcv, scaled_returns

    ns = [int(s) for s in args.ns.split(",")]
    lrs = [float(s) for s in args.lrs.split(",")]
    chunks = [int(s) for s in args.chunks.split(",")]

    out = {"seed": args.seed, "opt": args.opt, "runs": []}
    for n in ns:
        train_x, f, v_true = make_oracle(n, args.seed)
        yy = scaled_returns(train_x, f)
        module = GPCVModel(kernel="bm", q="tridiag")
        params0 = module.init(train_x, yy)
        state0 = GPCVState(module=module, params=params0, train_x=train_x,
                           targets=yy)
        init_err = rel_err(state0.predicted_scale(), v_true)
        for lr in lrs:
            params = params0
            row = {"n": n, "lr": lr, "init_rel_err": round(init_err, 4),
                   "trace": []}
            total = 0
            t0 = time.perf_counter()
            for c in chunks:
                params, losses = _fit_gpcv(module, params, train_x, yy, c, lr,
                                           args.opt)
                total += c
                st = GPCVState(module=module, params=params, train_x=train_x,
                               targets=yy)
                row["trace"].append({
                    "iters": total,
                    "rel_err": round(rel_err(st.predicted_scale(), v_true), 4),
                    "elbo": round(-float(losses[-1]), 5),
                })
            row["secs"] = round(time.perf_counter() - t0, 2)
            out["runs"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
