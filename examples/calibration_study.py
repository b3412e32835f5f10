"""Forecast-calibration study — the reference paper's own quality metric.

The reference evaluates Volt by forecast *calibration*: the fraction of
realized prices falling inside each central prediction interval should
match the interval's nominal level (`calib_plotter` notebook, SURVEY.md
§4/§6).  This script runs many independent forecast windows through the
batched pipeline on two synthetic data sets with known dynamics —

* GBM: constant vol 0.25, zero drift (well-specified for the model);
* SABR: stochastic-vol paths (the tutorial's harder generator) —

then plots empirical central-interval coverage against the nominal level.

Run:  python examples/calibration_study.py   (one chip, ~2-4 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu must take effect BEFORE configure_backend: otherwise the
# persistent compilation cache is enabled first (TPU-only on purpose —
# CPU AOT artifacts from the remote compiler risk SIGILL) and only then
# the platform flips
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from volt_tpu.utils.platform import configure_backend  # noqa: E402

configure_backend()  # JAX_PLATFORMS=cpu honored; TPU gets the compile cache

from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

NTRAIN, H, WINDOWS = 252, 20, 64
DT = 1.0 / 252
LEVELS = np.linspace(0.1, 0.9, 9)


# single source of the window generators and the coverage metric
# (shared with tools/eval_compare.py): volt_tpu.data.universes /
# volt_tpu.calibration.interval_coverage
from volt_tpu.data import gbm_windows as _gbm_windows  # noqa: E402
from volt_tpu.data import sabr_windows as _sabr_windows  # noqa: E402
from volt_tpu.calibration import interval_coverage  # noqa: E402


def gbm_windows(rng, vol=0.25):
    return _gbm_windows(rng, WINDOWS, NTRAIN, H, vol=vol)


def sabr_windows():
    return _sabr_windows(WINDOWS, NTRAIN, H)


def coverage(samples, truth):
    return interval_coverage(samples, truth, LEVELS)


ITERS, NSAMPLE = 300, 600
OUT = ""


def run(prices):
    train_x = jnp.arange(NTRAIN - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    cfg = PipelineConfig(gpcv_iters=ITERS, vol_iters=ITERS, data_iters=ITERS,
                         mean_func="ewma", k=min(50, NTRAIN - 2),
                         nsample=NSAMPLE)
    samples, aux = fit_forecast_batch(
        jax.random.key(0), train_x, jnp.asarray(prices[:, :NTRAIN]),
        test_x, cfg,
    )
    ok = np.asarray(aux["ok"])
    assert ok.all(), f"non-finite assets: {np.where(~ok)[0]}"
    truth = np.log(prices[:, NTRAIN:])
    return coverage(np.asarray(samples), truth)


def halving_prediction():
    """Coverage predicted by the CumTrapz endpoint-halving parity artifact.

    The reference's ``CumTrapz`` (``VolKernel.py:4-10``) halves each
    rollout step's variance contribution, so on EXACT constant-vol data
    the one-step forecast std is ``true_sigma / sqrt(2)`` — a faithful
    reproduction of the reference's own behavior (documented parity
    quirk, kept deliberately).  Under-coverage then follows in closed
    form: ``2 Phi(z_p / sqrt(2)) - 1``.
    """
    import scipy.stats as st

    z = st.norm.ppf(0.5 + LEVELS / 2)
    return 2 * st.norm.cdf(z / np.sqrt(2.0)) - 1


def main():
    rng = np.random.default_rng(7)
    cov_gbm = run(gbm_windows(rng))
    cov_sabr = run(sabr_windows())
    pred = halving_prediction()

    for name, cov in (("GBM", cov_gbm), ("SABR", cov_sabr),
                      ("pred½", pred)):
        gap = np.abs(cov - LEVELS).max()
        rows = " ".join(f"{lv:.0%}:{cv:.2f}" for lv, cv in zip(LEVELS, cov))
        print(f"{name:5s} max |coverage - nominal| = {gap:.3f}   {rows}")
    print(f"GBM vs halving prediction: max gap = "
          f"{np.abs(cov_gbm - pred).max():.3f} (the under-coverage IS the "
          f"reference's CumTrapz parity artifact)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.2, 5.0))
    ax.plot([0, 1], [0, 1], color="#9ca3af", lw=1.2, ls="--", zorder=1)
    ax.text(0.86, 0.90, "ideal", color="#6b7280", fontsize=9, rotation=41)
    ax.plot(LEVELS, pred, color="#9ca3af", lw=1.2, ls=":", zorder=2)
    ax.annotate("predicted under CumTrapz ½\n(reference parity artifact)",
                (LEVELS[2], pred[2]), xytext=(10, -24),
                textcoords="offset points", color="#6b7280", fontsize=8)
    ax.plot(LEVELS, cov_gbm, color="#2563eb", lw=2, marker="o", ms=5,
            zorder=3)
    ax.plot(LEVELS, cov_sabr, color="#d97706", lw=2, marker="s", ms=5,
            zorder=3)
    # direct labels at the curve ends (identity never color-alone)
    ax.annotate("GBM (well-specified)", (LEVELS[-1], cov_gbm[-1]),
                xytext=(8, -4), textcoords="offset points", ha="left",
                color="#1e3a8a", fontsize=9)
    ax.annotate("SABR (stochastic vol)", (LEVELS[-1], cov_sabr[-1]),
                xytext=(8, 0), textcoords="offset points", ha="left",
                color="#92400e", fontsize=9)
    ax.set_xlabel("nominal central-interval level")
    ax.set_ylabel("empirical coverage of realized prices")
    ax.set_title(f"Forecast calibration ({WINDOWS} windows, "
                 f"{H}-step horizons)", fontsize=11)
    ax.set_xlim(0, 1.28)
    ax.set_xticks(np.linspace(0, 1, 6))
    ax.set_ylim(0, 1)
    ax.grid(True, color="#e5e7eb", lw=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    out = OUT or os.path.join(os.path.dirname(__file__),
                              "calibration_output.png")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (e.g. when the TPU "
                        "tunnel is degraded)")
    # smoke-test knobs (defaults reproduce the committed figure)
    p.add_argument("--windows", type=int, default=WINDOWS)
    p.add_argument("--ntrain", type=int, default=NTRAIN)
    p.add_argument("--horizon", type=int, default=H)
    p.add_argument("--iters", type=int, default=ITERS)
    p.add_argument("--nsample", type=int, default=NSAMPLE)
    p.add_argument("--out", type=str, default="",
                   help="figure path (default: the committed "
                        "calibration_output.png)")
    a = p.parse_args()  # --cpu already took effect before configure_backend
    WINDOWS, NTRAIN, H = a.windows, a.ntrain, a.horizon
    ITERS, NSAMPLE, OUT = a.iters, a.nsample, a.out
    main()
