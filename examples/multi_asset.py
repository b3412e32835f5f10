"""Multi-asset walkthrough: the batch pipeline and the correlated
(Kronecker multitask) chain.

Two ways to forecast a universe of tickers:

1. **Independent assets, one compiled program** —
   ``fit_forecast_batch`` runs GPCV -> vol GP -> Volt -> MC rollout for
   every asset inside a single jitted program, vmapped over the asset
   axis (shardable over a device mesh); ``output="quantiles"`` returns
   the on-device quantile fan instead of raw paths.  This is the
   TPU-native replacement for the reference's per-ticker loop
   (``experiments/stocks/ForecastGenerator.py:27-41``).

2. **Correlated assets** — the ``T x N`` constructor of the high-level
   :class:`volt_tpu.Volt` API couples assets through a Kronecker
   multitask vol GP (reference ``models/Volt.py:30-33,64-71`` /
   ``BMGP.py:30-56``) and samples *jointly correlated* vol forecasts.

Run:  python examples/multi_asset.py  [--assets 8 --steps 200]
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

from volt_tpu.data import sabr_paths
from volt_tpu.models.volt_api import Volt
from volt_tpu.parallel import PipelineConfig, fit_forecast_batch


def main(args):
    dt = 1.0 / 252
    n = args.steps - 1
    h = 50
    f, _ = sabr_paths(steps=args.steps, seed=0, n_paths=args.assets)
    prices = jnp.asarray(f)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = train_x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)

    # --- 1. independent assets: one jitted program, quantile delivery ---
    cfg = PipelineConfig(gpcv_iters=args.iters, vol_iters=args.iters,
                         data_iters=args.iters, mean_func="ewma", k=50,
                         nsample=256, output="quantiles")
    fan, aux = fit_forecast_batch(jax.random.key(0), train_x, prices,
                                  test_x, cfg)
    fan = np.asarray(fan)  # (assets, levels, H) log-price quantiles
    ok = np.asarray(aux["ok"])
    print(f"batch pipeline: {args.assets} assets, ok={ok.sum()}/{len(ok)}")
    med = np.exp(fan[:, len(cfg.quantile_levels) // 2, -1])
    lo = np.exp(fan[:, 0, -1])
    hi = np.exp(fan[:, -1, -1])
    for a in range(min(args.assets, 4)):
        print(f"  asset {a}: spot {f[a, -1]:8.2f} -> {h}d median "
              f"{med[a]:8.2f}  [{lo[a]:.2f}, {hi[a]:.2f}] 95% band")

    # --- 2. correlated assets: T x N Volt -> multitask chain ---
    v = Volt(jnp.concatenate([train_x[:1] - dt, train_x]),
             jnp.log(prices), mean="ewma", k=50)
    assert v.batched
    v.Train(gpcv_iters=args.iters, vol_mod_iters=args.iters,
            data_mod_iters=args.iters)
    samples = v.Forecast(test_x, nsample=128, key=jax.random.key(1))
    samples = np.asarray(samples)  # (T, S, H)
    print(f"\nmultitask chain: forecast {samples.shape} finite="
          f"{np.isfinite(samples).all()}")
    # correlated vol propagates into cross-asset forecast correlation
    last = samples[:, :, -1]
    corr = np.corrcoef(last)
    off = np.abs(corr - np.eye(len(corr)))
    print(f"cross-asset forecast correlation: max off-diag {off.max():.3f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", type=int, default=8)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when the TPU "
                         "tunnel is degraded)")
    args = ap.parse_args()
    # --cpu already took effect before configure_backend() above
    main(args)
