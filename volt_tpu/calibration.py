"""Forecast-calibration metrics.

The reference evaluates forecasts offline with empirical-CDF percentiles
and fraction-within-centered-band calibration curves
(``experiments/weather/.ipynb_checkpoints/calib_plotter-checkpoint.ipynb``
cells 2-9; ``option_utils.py:48-51``).  These are the library versions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sample_percentiles", "calibration", "calibration_curve", "crps",
           "coverage_from_quantiles", "interval_coverage"]


def sample_percentiles(samples, truth):
    """Per-horizon-step fraction of samples below the truth.

    ``samples``: ``(n_paths, H)``; ``truth``: ``(H,)``.  A perfectly
    calibrated forecaster's percentiles are uniform on [0, 1].
    """
    samples = jnp.asarray(samples)
    truth = jnp.asarray(truth)
    return jnp.mean((samples < truth[None, :]).astype(jnp.float32), axis=0)


def calibration(percentiles, levels=None):
    """Fraction of realized percentiles inside centered bands.

    For each level ``p`` the ideal fraction inside ``[0.5 - p/2, 0.5 + p/2]``
    is ``p`` (the notebook's ``Calibration`` curve vs the diagonal).
    Returns ``(levels, observed_fractions)``.
    """
    percentiles = jnp.asarray(percentiles).reshape(-1)
    if levels is None:
        levels = jnp.linspace(0.05, 0.95, 19)
    lo = 0.5 - levels / 2
    hi = 0.5 + levels / 2
    inside = (percentiles[None, :] >= lo[:, None]) & (
        percentiles[None, :] <= hi[:, None]
    )
    return levels, jnp.mean(inside.astype(jnp.float32), axis=1)


def coverage_from_quantiles(levels, fan, truth):
    """Empirical coverage straight from a quantile fan — the natural
    evaluation consumer of ``PipelineConfig(output="quantiles")``.

    ``levels``: the fan's quantile levels ``(L,)`` (ascending);
    ``fan``: ``(..., L, H)`` on-device quantiles; ``truth``: ``(..., H)``
    realized values.  Returns ``(levels, observed)`` where ``observed[l]``
    is the fraction of (asset, step) cells with ``truth <= fan[..., l, :]``
    — for a calibrated forecaster ``observed ~= levels`` (the notebook's
    curve-vs-diagonal check without ever materializing the raw paths).
    """
    levels = jnp.asarray(levels)
    fan = jnp.asarray(fan)
    truth = jnp.asarray(truth)
    below = (truth[..., None, :] <= fan).astype(jnp.float32)
    axes = tuple(i for i in range(below.ndim) if i != below.ndim - 2)
    return levels, jnp.mean(below, axis=axes)


def calibration_curve(samples_list, truths_list, levels=None):
    """Aggregate calibration over many forecast windows."""
    pcts = jnp.concatenate([
        sample_percentiles(s, t).reshape(-1)
        for s, t in zip(samples_list, truths_list)
    ])
    return calibration(pcts, levels)


def interval_coverage(samples, truth, levels):
    """Empirical central-interval coverage per nominal level.

    ``samples``: ``(W, S, H)`` forecasts; ``truth``: ``(W, H)`` realized
    values; ``levels``: ``(L,)`` nominal central levels.  Returns the
    ``(L,)`` fraction of realized points inside each central interval,
    pooled over windows x steps (the shared metric of
    ``examples/calibration_study.py`` and ``tools/eval_compare.py``).
    """
    import numpy as np

    samples = np.asarray(samples)
    truth = np.asarray(truth)
    levels = np.asarray(levels)
    lo = np.quantile(samples, 0.5 - levels / 2, axis=1)  # (L, W, H)
    hi = np.quantile(samples, 0.5 + levels / 2, axis=1)
    inside = (truth[None] >= lo) & (truth[None] <= hi)
    return inside.mean(axis=(1, 2))


def crps(samples, truth):
    """Continuous ranked probability score per horizon step (sample-based
    estimator ``E|X - y| - 0.5 E|X - X'|``), lower is better."""
    samples = jnp.asarray(samples)  # (S, H)
    truth = jnp.asarray(truth)
    term1 = jnp.mean(jnp.abs(samples - truth[None, :]), axis=0)
    s_sorted = jnp.sort(samples, axis=0)
    n = samples.shape[0]
    # E|X - X'| = 2/n^2 * sum_i (2i - n - 1) x_(i)  (sorted form)
    coef = (2.0 * jnp.arange(1, n + 1) - n - 1.0) / (n * n)
    term2 = 2.0 * jnp.sum(coef[:, None] * s_sorted, axis=0)
    return term1 - 0.5 * term2
