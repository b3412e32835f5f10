"""End-to-end walkthrough — the reference's ``example.ipynb`` as a script.

Simulates a SABR-like SDE with known volatility, runs the full two-stage
pipeline (GPCV volatility inference -> vol GP -> Volt price model), draws
hierarchical forecasts (vol paths x price paths), and reports how well the
learned volatility tracks the truth.

Run:  python examples/example.py  [--steps 400 --gpcv_iters 500]
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
from volt_tpu.rollouts import generate_prediction
from volt_tpu.train import learn_gpcv, train_data_model, train_vol_model


def main(args):
    # --- synthetic SDE with known vol (example.ipynb cells 2-3) ---
    f, v_true = sabr_paths(steps=args.steps, seed=2019)
    n = args.steps - 1
    t_max = 1.0
    dt = t_max / args.steps
    train_x = jnp.linspace(0, t_max, n) + dt
    test_x = jnp.linspace(t_max + dt, 1.5 * t_max, args.steps // 2 - 1) + dt
    prices = jnp.asarray(f)

    # --- stage 1: GPCV (cells 8-9) ---
    vol = learn_gpcv(train_x, prices, train_iters=args.gpcv_iters,
                     printing=True)
    err = float(jnp.mean(jnp.abs(vol - v_true[1:])) / jnp.mean(v_true[1:]))
    print(f"\nlearned vol vs truth: mean |rel err| = {err:.3f}")

    # --- stage 2: vol GP (cell 11) ---
    vol_state = train_vol_model(train_x, vol, train_iters=args.vol_iters,
                                printing=True)

    # --- stage 3: Volt data model (cell 12) ---
    model = train_data_model(train_x, prices[1:], vol_state, vol,
                             train_iters=args.data_iters, printing=True)

    # --- hierarchical sampling: nvol vol paths x npx price paths (cell 15)
    nvol, npx = 8, 1
    key = jax.random.key(0)
    k_vol, k_px = jax.random.split(key)
    log_vol_draws = vol_state.sample(k_vol, test_x, (nvol,))
    vol_paths = jnp.exp(log_vol_draws)
    px_paths = jnp.exp(
        generate_prediction(k_px, model, test_x, vol_paths, n_sample=npx)
    ).reshape(nvol * npx, -1)

    print(f"\nforecast horizon: {test_x.shape[0]} steps")
    print(f"vol paths:   {vol_paths.shape}  (mean {float(vol_paths.mean()):.3f})")
    print(f"price paths: {px_paths.shape}  "
          f"(start {float(px_paths[:, 0].mean()):.2f} "
          f"vs last price {float(prices[-1]):.2f})")

    q = np.quantile(np.asarray(px_paths), [0.1, 0.5, 0.9], axis=0)
    print("\nforecast fan (10/50/90% quantiles at horizon end):",
          [round(float(x), 2) for x in q[:, -1]])

    if args.figure:
        make_figure(train_x, f, v_true, np.asarray(vol), test_x, vol_paths,
                    px_paths)




def make_figure(train_x, prices, v_true, vol, test_x, vol_paths, px_paths,
                out_path=os.path.join(os.path.dirname(__file__),
                                      "example_output.png")):
    """The tutorial's 3-panel figure (example.ipynb cell 17): data+vol,
    learned vs true vol with forecasts, price forecasts."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(3, 1, figsize=(8, 10), dpi=100)
    plt.subplots_adjust(hspace=0.3)

    ax[0].plot(train_x, prices[1:], label="Data", alpha=0.8)
    ax0b = ax[0].twinx()
    ax0b.plot(train_x, v_true[1:], color="tab:orange", label="Volatility")
    ax[0].set_ylabel("Price")
    ax0b.set_ylabel("Vol")
    ax[0].set_title("data and true volatility")

    ax[1].plot(train_x, v_true[1:], color="tab:orange", alpha=0.75,
               label="True Vol.")
    ax[1].plot(train_x, vol, color="tab:purple", label="Learned Vol.")
    ax[1].plot(test_x, np.asarray(vol_paths).T, color="tab:red", alpha=0.4)
    ax[1].set_ylabel("Vol")
    ax[1].legend(loc="upper left")
    ax[1].set_title("GPCV volatility recovery + forecasts")

    ax[2].plot(train_x, prices[1:], alpha=0.8, label="Data")
    ax[2].plot(test_x, np.asarray(px_paths).T, color="tab:green", alpha=0.6)
    ax[2].set_ylabel("Price")
    ax[2].set_xlabel("t")
    ax[2].set_title("Monte-Carlo price forecasts")
    fig.savefig(out_path, bbox_inches="tight")
    print("figure saved to", out_path)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--gpcv_iters", type=int, default=500)
    p.add_argument("--vol_iters", type=int, default=500)
    p.add_argument("--data_iters", type=int, default=400)
    p.add_argument("--figure", action="store_true")
    p.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when the TPU "
                         "tunnel is degraded)")
    args = p.parse_args()
    # --cpu already took effect before configure_backend() above
    main(args)
