"""Time-to-first-forecast vs steady-state across scan-unroll settings.

The pipeline's two latency-bound scans (Kalman MLL in ``ops/tridiag.py``,
the rollout in ``rollouts.py``) are unrolled on TPU for measured
steady-state wins, at the cost of larger HLO — i.e. a slower FIRST
compile (PERFORMANCE.md).  ``VOLT_TPU_SCAN_UNROLL`` trades that back.
This harness measures both sides of the trade at the north-star shape:
per (unroll, batch) config it spawns a fresh child process with the
persistent compilation cache disabled and records

  * ``first_s``  — wall of the first call incl. the result fetch
                   (trace + compile + run: time-to-first-forecast), and
  * ``steady_ms`` — min-of-N fetch-timed subsequent calls.

Usage:  python tools/bench_compile.py [--unrolls 1,8,32] [--assets 64,500]
        [--ntrain 1000] [--iters 300] [--nsample 1000] [--reps 3]

Honors ``JAX_PLATFORMS=cpu`` (toy smoke runs; the suite does this).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(args):
    import jax

    from volt_tpu.utils.platform import cpu_requested

    # cold compile on purpose: no persistent cache in the child (different
    # unrolls are different programs anyway, but repeat tool runs must not
    # read a warm cache and report it as a first compile).
    if cpu_requested():
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

    import jax.numpy as jnp

    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch
    from volt_tpu.utils.profiling import timed_best

    n = args.ntrain - 1
    dt = 1.0 / 252
    f, _ = sabr_paths(steps=args.ntrain, seed=0, n_paths=args.assets)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(args.horizon, dtype=jnp.float32) * dt \
        + train_x[-1] + dt
    train_ys = jnp.asarray(f)
    cfg = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                         data_iters=args.iters, mean_func="ewma",
                         k=min(100, max(2, n // 4)), nsample=args.nsample,
                         output="quantiles")

    def run():
        out, _ = fit_forecast_batch(jax.random.key(0), train_x, train_ys,
                                    test_x, cfg)
        return out

    t0 = time.perf_counter()
    first = jax.device_get(run())  # fetch is the only real barrier (axon)
    first_s = time.perf_counter() - t0
    assert bool(jnp.isfinite(jnp.asarray(first)).all())
    _, steady_s = timed_best(run, repeats=args.reps)
    print(json.dumps({
        "unroll": os.environ.get("VOLT_TPU_SCAN_UNROLL", "default"),
        "assets": args.assets, "ntrain": args.ntrain,
        "backend": jax.default_backend(),
        "first_s": round(first_s, 2),
        "steady_ms": round(1e3 * steady_s, 1),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", default="1,8,32")
    p.add_argument("--assets", default="64,500")
    p.add_argument("--ntrain", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--nsample", type=int, default=1000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--child-assets", type=int, default=0,
                   help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.child_assets:
        args.assets = args.child_assets
        child(args)
        return

    for b in [int(x) for x in args.assets.split(",")]:
        for u in [x.strip() for x in args.unrolls.split(",")]:
            env = {**os.environ, "VOLT_TPU_SCAN_UNROLL": u}
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child-assets", str(b)]
            for flag in ("ntrain", "horizon", "iters", "nsample", "reps"):
                cmd += [f"--{flag}", str(getattr(args, flag))]
            try:
                # generous hard bound: a dead tunnel hangs rather than errors
                r = subprocess.run(cmd, env=env, capture_output=True,
                                   text=True, timeout=2400)
            except subprocess.TimeoutExpired:
                print(json.dumps({"unroll": u, "assets": b,
                                  "error": "timeout (dead tunnel?)"}))
                continue
            out = [ln for ln in r.stdout.splitlines()
                   if ln.startswith("{")]
            if r.returncode != 0 or not out:
                print(json.dumps({"unroll": u, "assets": b, "error":
                                  (r.stderr or r.stdout)[-400:]}))
            else:
                print(out[-1], flush=True)


if __name__ == "__main__":
    main()
