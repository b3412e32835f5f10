"""Option pricing from Volt forecasts — the reference's `option_utils`
flow (`Pricer`/`ECDF`, `option_utils.py:26-51`) end-to-end:

1. simulate a price history (SABR, known dynamics),
2. fit the Volt pipeline and draw a Monte-Carlo forecast fan,
3. value a strike x expiry call grid from the sampled paths
   (`price_call_grid`) plus an option-chain DataFrame via `pricer`,
4. sanity-check put-call parity and the realized-price percentile.

Run:  python examples/option_pricing.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Backend selection must run BEFORE any jax config/device use: sitecustomize
# force-selects the TPU plugin, a dead tunnel hangs its init, and the
# compilation cache must stay TPU-only (utils/platform.configure_backend).
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np


def main(args):
    from volt_tpu.data import sabr_paths
    from volt_tpu.options import ecdf, price_call_grid, price_put_grid, pricer
    from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

    ntrain, horizon = args.ntrain, args.horizon
    dt = 1.0 / 252
    prices, _ = sabr_paths(steps=ntrain + horizon, seed=3, n_paths=1)
    prices = np.atleast_2d(np.asarray(prices, np.float32))
    spot = float(prices[0, ntrain - 1])

    train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * dt
    test_x = jnp.arange(horizon, dtype=jnp.float32) * dt + train_x[-1] + dt
    cfg = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                         data_iters=args.iters, mean_func="ewma", k=50,
                         nsample=args.nsample)
    samples, aux = fit_forecast_batch(
        jax.random.key(0), train_x, jnp.asarray(prices[:, :ntrain]),
        test_x, cfg,
    )
    assert bool(np.asarray(aux["ok"]).all())
    mc_pxs = jnp.exp(samples[0])  # (S, H) price paths

    # strike x expiry call/put grids straight from the MC paths
    expiry_idx = np.array([horizon // 4, horizon // 2, horizon - 1])
    strikes = jnp.asarray(spot * np.linspace(0.9, 1.1, 5), jnp.float32)
    px_at_exp = mc_pxs[:, expiry_idx]
    calls = np.asarray(price_call_grid(px_at_exp, strikes))
    puts = np.asarray(price_put_grid(px_at_exp, strikes))
    fwd = np.asarray(px_at_exp.mean(axis=0))

    print(f"spot {spot:.2f}; call values (rows = strikes, cols = expiry "
          f"days {[int(i) + 1 for i in expiry_idx]}):")
    for k, row in zip(np.asarray(strikes), calls):
        print("  K=%7.2f  " % k + "  ".join(f"{v:7.3f}" for v in row))
    parity_gap = np.abs((calls - puts) - (fwd[None, :]
                                          - np.asarray(strikes)[:, None]))
    print(f"put-call parity max gap: {parity_gap.max():.4f} (0 for "
          f"undiscounted MC by construction)")

    # reference-style option-chain DataFrame via pricer()
    import pandas as pd

    edays = pd.bdate_range("2024-01-02", periods=horizon)[expiry_idx]
    chain = pd.DataFrame({
        "expiration": np.repeat(edays, len(strikes)),
        "strike": np.tile(np.asarray(strikes), len(edays)),
        "bid": 0.0, "ask": 0.0,
    })
    true_pxs = prices[0, ntrain + expiry_idx]
    df = pricer(np.asarray(px_at_exp), chain, edays, true_pxs, spot)
    print(df.head(len(strikes)).to_string(index=False))

    pct = float(ecdf(mc_pxs[:, -1], float(true_pxs[-1])))
    print(f"realized-price percentile at the last expiry: {pct:.2f} "
          f"(calibrated forecasts put this ~Uniform(0,1))")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ntrain", type=int, default=252)
    p.add_argument("--horizon", type=int, default=60)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--nsample", type=int, default=1000)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (e.g. when the TPU "
                        "tunnel is degraded)")
    args = p.parse_args()
    # --cpu already took effect before configure_backend() above
    main(args)
