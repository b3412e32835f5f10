"""Calibration effect of the vol-integral quadrature: quirk vs trapezoid.

The reference's CumTrapz endpoint halving makes every autoregressive
rollout step's conditional std ``vol * sqrt(dx/2)`` instead of the exact
trapezoid's ``sqrt(dx (v_t^2 + v_{t-1}^2)/2)`` — a 1/sqrt(2)-narrow
one-step forecast (PARITY.md).  With ``integral_rule`` wired end-to-end
this harness finally measures what the quirk costs in *calibration*: fit
the full pipeline both ways over a SABR universe of B assets, roll H
steps, and score interval coverage + CRPS of the fans against the
realized SDE continuations.

Usage:
    python tools/eval_integral_rule.py [--assets 24] [--ntrain 400]
        [--horizon 20] [--iters 150] [--nsample 500] [--seed 7]

Honors JAX_PLATFORMS=cpu.  Prints one JSON object per rule plus a
verdict line (consumed by PARITY.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", type=int, default=24)
    ap.add_argument("--ntrain", type=int, default=400)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--nsample", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from volt_tpu.calibration import crps, interval_coverage
    from volt_tpu.data import sabr_paths
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    steps = args.ntrain + args.horizon
    f, _ = sabr_paths(steps=steps, seed=args.seed, n_paths=args.assets)
    prices = jnp.asarray(f[:, :args.ntrain])
    truth_log = np.log(np.asarray(f[:, args.ntrain:]))  # (B, H) realized

    n = args.ntrain - 1
    dt = 1.0 / 252
    train_x = jnp.arange(n, dtype=jnp.float32) * dt + dt
    test_x = train_x[-1] + dt * jnp.arange(1, args.horizon + 1)

    levels = (0.5, 0.8, 0.95)
    out = {}
    for rule in ("reference", "trapezoid"):
        cfg = PipelineConfig(
            gpcv_iters=args.iters, vol_iters=args.iters,
            data_iters=args.iters, nsample=args.nsample,
            k=min(100, max(2, n // 4)), integral_rule=rule,
        )
        samples, aux = fit_forecast_batch(jax.random.key(0), train_x,
                                          prices, test_x, cfg)
        samples = np.asarray(samples)  # (B, S, H) log prices
        ok = np.asarray(aux["ok"])
        res = {"ok_frac": float(ok.mean())}
        # one-step and full-horizon interval coverage, pooled over
        # (asset, step) — interval_coverage takes (W, S, H) + (W, H)
        for tag, sl in (("step1", slice(0, 1)), ("all", slice(None))):
            s = samples[ok][..., sl]
            t = truth_log[ok][..., sl]
            cov = interval_coverage(s, t, levels)
            res[f"coverage_{tag}"] = {
                str(lv): round(float(c), 4)
                for lv, c in zip(levels, np.asarray(cov))
            }
            # crps takes (S, H) + (H,) per asset; average over assets+steps
            cr = [float(np.mean(np.asarray(crps(jnp.asarray(si),
                                                jnp.asarray(ti)))))
                  for si, ti in zip(s, t)]
            res[f"crps_{tag}"] = round(float(np.mean(cr)), 6)
        out[rule] = res
        print(json.dumps({rule: res}), flush=True)

    # verdict: distance of empirical coverage from nominal, one-step
    def cov_gap(res):
        return float(np.mean([abs(res["coverage_step1"][str(lv)] - lv)
                              for lv in levels]))

    print(json.dumps({
        "verdict": {
            "step1_coverage_gap_reference": round(cov_gap(out["reference"]), 4),
            "step1_coverage_gap_trapezoid": round(cov_gap(out["trapezoid"]), 4),
            "crps_all_reference": out["reference"]["crps_all"],
            "crps_all_trapezoid": out["trapezoid"]["crps_all"],
        }
    }))


if __name__ == "__main__":
    main()
