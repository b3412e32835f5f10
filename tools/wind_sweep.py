"""Wind-config sensitivity sweep for the Volt lane (round-3 verdict #6).

WIND is the one universe where Volt trails its baselines in EVALUATION.md
(volt-ewma crps 0.464 vs sm-ewma 0.359).  This sweeps the reference's own
wind knobs — EWMA window ``k`` (GPGenerator.py flag ``--k``, default 400)
and the mean-reversion rate ``theta`` (``:68-107``, default 0.01) — over
the exact EVALUATION.md universe (same rng protocol: the GBM draw happens
first, as in eval_compare.main) to establish whether the gap is config or
model.  Prints one JSON line per combo and a markdown table at the end.

    python tools/wind_sweep.py [--windows 32] [--ntrain 400]
"""

import argparse
import itertools
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: volt_tpu package
sys.path.insert(0, _HERE)                   # tools dir: eval_compare lanes

import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

from eval_compare import metrics, volt_lane  # noqa: E402  (same dir)
from volt_tpu.data import gbm_windows, wind_windows  # noqa: E402


def main(args):
    # reproduce eval_compare.main's universe exactly: the shared rng first
    # draws the GBM universe (dict-literal evaluation order), then WIND
    rng = np.random.default_rng(7)
    gbm_windows(rng, args.windows, args.ntrain, args.horizon)
    prices = wind_windows(rng, args.windows, args.ntrain, args.horizon)
    truth = np.log(prices[:, args.ntrain:])

    ks = [int(s) for s in args.ks.split(",")]
    thetas = [None if s == "none" else float(s)
              for s in args.thetas.split(",")]
    rows = []
    for k, theta in itertools.product(ks, thetas):
        t0 = time.perf_counter()
        samples = volt_lane(prices, args.ntrain, args.horizon, args.iters,
                            args.nsample, k, theta)
        m = metrics(samples, truth)
        m["sec"] = round(time.perf_counter() - t0, 1)
        row = {"k": k, "theta": theta, **m}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| k | theta | calib_err | crps | nll |")
    print("|---|---|---|---|---|")
    for r in rows:
        th = "—" if r["theta"] is None else f"{r['theta']:g}"
        print(f"| {r['k']} | {th} | {r['calib_err']:.3f} | "
              f"{r['crps']:.4f} | {r['nll']:.3f} |")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--ntrain", type=int, default=400)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--nsample", type=int, default=256)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--ks", type=str, default="100,200,400")
    p.add_argument("--thetas", type=str, default="0.01,0.05,0.1,none")
    main(p.parse_args())
