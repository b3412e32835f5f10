"""Microbenchmark: Pallas volt-covariance build vs the XLA twin.

The Pallas tile build is the TPU default inside
``VolatilityKernel.__call__`` (``kernels.py``); this harness times the
kernel and its XLA reference (``ops.volint.min_index_covariance``) at
bench-like shapes and checks bit-identity, so BlockSpec/tiling changes
get a measured before/after (PERFORMANCE.md round-2 table: 0.871 ->
0.782 ms at B=64, n=999).

Run:  python tools/bench_voltcov.py [--batch 64 --n 999 --reps 30]
(honors JAX_PLATFORMS=cpu for off-chip smoke runs; CPU numbers are
interpret-mode and meaningless for perf — the tool still validates
plumbing + bit-identity there).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import json  # noqa: E402

import numpy as np  # noqa: E402


def _time_best(fn, reps):
    # fetch-timed (axon: block_until_ready does not sync), min-of-reps
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=999)
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    from volt_tpu.ops.pallas import volt_covariance
    from volt_tpu.ops.volint import min_index_covariance, vol_integral

    x = jnp.arange(args.n, dtype=jnp.float32) * (1.0 / 252)
    vol = 0.2 + 0.01 * jax.random.normal(jax.random.key(0),
                                         (args.batch, args.n))

    pallas_fn = jax.jit(lambda: volt_covariance(x, vol))
    xla_fn = jax.jit(lambda: min_index_covariance(vol_integral(x, vol)))

    got, _ = _time_best(pallas_fn, 1)   # compile + correctness fetch
    want, _ = _time_best(xla_fn, 1)
    identical = bool(np.array_equal(got, want))

    _, t_pallas = _time_best(pallas_fn, args.reps)
    _, t_xla = _time_best(xla_fn, args.reps)
    print(json.dumps({
        "stage": "volt_cov_build",
        "backend": jax.default_backend(),
        "batch": args.batch, "n": args.n,
        "pallas_ms": round(t_pallas * 1e3, 4),
        "xla_ms": round(t_xla * 1e3, 4),
        "bit_identical": identical,
    }))
    if not identical:
        raise SystemExit("Pallas output differs from the XLA twin")


if __name__ == "__main__":
    main()
