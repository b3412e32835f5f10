"""On-chip multitask scaling: the T>=64 evidence the round-2 verdict asked
for (item 1).

Measures, at a given (T, n), on the real TPU:

* the Kronecker multitask vol-GP fit (``train_volt_multitask``'s
  ``mll_spectral`` path — low-rank Woodbury blocks) — ms/iter;
* the multitask GPCV ELBO step (``learn_gpcv_multitask``) — ms/iter;
* the correlated forecast sampling + rollouts
  (``sample_forecast`` Matheron + per-task Markov scans) — ms total.

Usage: ``python tools/bench_multitask.py --tasks 64 128 256 505 --n 1000``
Prints one JSON line per (T, stage).  All timings fetch (axon tunnel:
``block_until_ready`` does not synchronize); min over repeats.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache


from volt_tpu.utils.profiling import timed_best as timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, nargs="+",
                    default=[64, 128, 256, 505])
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--nsample", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", type=str, default="vol,gpcv,rollout")
    ap.add_argument("--gpcv-q", type=str, default="full",
                    help="comma list of variational families for the gpcv "
                         "stage: full,tridiag")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import numpy as np

    from volt_tpu.likelihoods import VolatilityGaussianLikelihood
    from volt_tpu.models.multitask import (MultitaskBMGP,
                                           MultitaskVariationalGP)
    from volt_tpu.train import _adam_scan

    n = args.n - 1
    dt = 1.0 / 252
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = train_x[-1] + dt * jnp.arange(1, args.horizon + 1,
                                           dtype=jnp.float32)
    rng = np.random.default_rng(0)

    for t in args.tasks:
        log_vols_nt = jnp.asarray(
            np.log(0.2) + 0.1 * rng.standard_normal((n, t)), jnp.float32
        )
        yy = jnp.asarray(0.2 * rng.standard_normal((n, t)), jnp.float32)

        if "vol" in stages:
            mt = MultitaskBMGP(num_tasks=t, rank=1)

            @jax.jit
            def fit_vol(p):
                cache = mt.spectral_cache(train_x, log_vols_nt)
                return _adam_scan(
                    lambda q: -mt.mll_spectral(q, cache, n, t),
                    p, args.iters, 0.01,
                )[1][-1]

            loss, el = timed(partial(fit_vol, mt.init()), args.repeats)
            assert np.isfinite(loss), f"vol fit non-finite at T={t}"
            print(json.dumps({
                "stage": "mt_vol_fit", "T": t, "n": n,
                "ms_per_iter": round(1e3 * el / args.iters, 3),
                "fit_sec_400iter": round(el / args.iters * 400, 2),
            }), flush=True)

        if "gpcv" in stages:
            lik = VolatilityGaussianLikelihood(param="exp")
            for fam in args.gpcv_q.split(","):
                mvg = MultitaskVariationalGP(num_tasks=t, rank=1, q=fam)
                params = mvg.init(train_x)
                params = mvg.initialize_variational_parameters(
                    params, lik, {}, train_x, yy
                )

                @jax.jit
                def fit_gpcv(p, mvg=mvg):
                    return _adam_scan(
                        lambda q: -mvg.elbo(q, train_x, yy, lik, {}),
                        p, args.iters, 0.01,
                    )[1][-1]

                loss, el = timed(partial(fit_gpcv, params), args.repeats)
                assert np.isfinite(loss), f"gpcv non-finite at T={t}"
                print(json.dumps({
                    "stage": "mt_gpcv_fit", "T": t, "n": n, "q": fam,
                    "ms_per_iter": round(1e3 * el / args.iters, 3),
                }), flush=True)

        if "rollout" in stages:
            mt = MultitaskBMGP(num_tasks=t, rank=1)
            state = mt.fit_state(mt.init(), train_x, log_vols_nt)

            @jax.jit
            def sample(key):
                return state.sample_forecast(key, test_x, (args.nsample,))

            vols, el = timed(partial(sample, jax.random.key(0)),
                             args.repeats)
            assert np.isfinite(vols).all(), f"forecast NaN at T={t}"
            print(json.dumps({
                "stage": "mt_vol_forecast", "T": t, "n": n,
                "S": args.nsample, "H": args.horizon,
                "ms_total": round(1e3 * el, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
