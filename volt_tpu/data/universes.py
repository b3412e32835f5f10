"""Known-dynamics synthetic evaluation universes.

The calibration example (``examples/calibration_study.py``) and the
model-comparison harness (``tools/eval_compare.py``) both evaluate on the
same window ensembles; these are the single definitions so the two
studies cannot silently diverge (e.g. on the window-length convention).

All generators return ``(w, ntrain + h)`` float32 *prices/levels*: the
first ``ntrain`` points train, the last ``h`` are the realized truth.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DT", "gbm_windows", "gusty_wind_windows", "sabr_windows",
           "wind_windows"]

DT = 1.0 / 252


def gbm_windows(rng, w, ntrain, h, vol=0.25, s0=50.0):
    """Constant-vol zero-drift GBM — well-specified for the model."""
    z = rng.standard_normal((w, ntrain + h - 1))
    logp = np.concatenate(
        [np.zeros((w, 1)), np.cumsum(vol * np.sqrt(DT) * z, axis=1)], axis=1
    )
    return (s0 * np.exp(logp)).astype(np.float32)


def sabr_windows(w, ntrain, h, seed=11):
    """Stochastic-vol SABR paths (the tutorial's harder generator)."""
    from .synthetic import sabr_paths

    f, _ = sabr_paths(steps=ntrain + h, seed=seed, n_paths=w)
    return np.asarray(f, np.float32).reshape(w, ntrain + h)


def wind_windows(rng, w, ntrain, h, rho=0.02, sig=0.25):
    """Squared-OU wind-speed surrogate: mean-reverting, heteroscedastic,
    strictly positive after the reference's ``+1`` shift
    (``GPGenerator.py:49,56``: ``-99 -> 0`` then ``data + 1``)."""
    n = ntrain + h
    x = np.empty((w, n))
    x[:, 0] = 0.5 * rng.standard_normal(w)
    z = rng.standard_normal((w, n))
    for t in range(1, n):
        x[:, t] = (1.0 - rho) * x[:, t - 1] + sig * z[:, t]
    return (1.0 + 2.0 * x * x).astype(np.float32)


def gusty_wind_windows(rng, w, ntrain, h, rho=0.02, sig=0.25,
                       rho_v=0.01, xi=0.085):
    """Squared-OU wind surrogate with stochastic log-volatility *bursts*.

    Same mean-reverting speed process as :func:`wind_windows`, but the
    innovation scale is itself a slow log-OU process
    (``sig_t = sig * exp(v_t)``, stationary ``std(v) ~ 0.6`` at the
    defaults, i.e. calm/gusty episodes spanning a ~3x scale range with
    ~``1/rho_v = 100``-step persistence).  Real subhourly surface wind is
    intermittent in exactly this sense (gust fronts / convective
    episodes), which is the regime the Volt paper targets — the plain
    squared-OU surrogate is the *stationary* end of the bracket, this is
    the *heteroscedastic* end; neither is USCRN data (no egress on this
    image), together they bracket it.
    """
    n = ntrain + h
    x = np.empty((w, n))
    x[:, 0] = 0.5 * rng.standard_normal(w)
    z = rng.standard_normal((w, n))
    zv = rng.standard_normal((w, n))
    v = np.zeros(w)
    for t in range(1, n):
        v = (1.0 - rho_v) * v + xi * zv[:, t]
        x[:, t] = (1.0 - rho) * x[:, t - 1] + sig * np.exp(v) * z[:, t]
    return (1.0 + 2.0 * x * x).astype(np.float32)
