"""End-to-end statistical validation: on well-specified synthetic data
(GBM with known constant vol), the full pipeline's forecasts must be
*calibrated* — realized sample percentiles approximately uniform — which is
the reference paper's own quality protocol (calibration curves vs the
diagonal, SURVEY.md §4/§6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.calibration import calibration, sample_percentiles
from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

NTRAIN, H, WINDOWS = 150, 10, 24
DT = 1.0 / 252
TRUE_VOL = 0.25


@pytest.fixture(scope="module")
def forecasts_and_truth():
    rng = np.random.default_rng(7)
    total = NTRAIN + H
    # independent GBM windows, zero drift, constant vol
    z = rng.standard_normal((WINDOWS, total - 1))
    logp = np.concatenate(
        [np.zeros((WINDOWS, 1)),
         np.cumsum(TRUE_VOL * np.sqrt(DT) * z, axis=1)],
        axis=1,
    )
    prices = (50.0 * np.exp(logp)).astype(np.float32)

    train_x = jnp.arange(NTRAIN - 1, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    cfg = PipelineConfig(gpcv_iters=150, vol_iters=150, data_iters=100,
                         mean_func="ewma", k=50, nsample=400)
    samples, aux = fit_forecast_batch(
        jax.random.key(0), train_x, jnp.asarray(prices[:, :NTRAIN]),
        test_x, cfg,
    )
    truth = np.log(prices[:, NTRAIN:])  # (W, H) realized log prices
    return np.asarray(samples), truth, np.asarray(aux["vol"])


class TestEndToEndCalibration:
    def test_vol_estimates_near_truth(self, forecasts_and_truth):
        _, _, vols = forecasts_and_truth
        med = np.median(vols)
        assert 0.6 * TRUE_VOL < med < 1.6 * TRUE_VOL, med

    def test_percentiles_not_degenerate(self, forecasts_and_truth):
        samples, truth, _ = forecasts_and_truth
        pcts = np.stack([
            np.asarray(sample_percentiles(jnp.asarray(samples[w]),
                                          jnp.asarray(truth[w])))
            for w in range(WINDOWS)
        ])  # (W, H)
        # realized percentiles should spread across (0,1), not pile at the
        # edges (which would mean badly over/under-confident forecasts)
        flat = pcts.reshape(-1)
        assert 0.25 < flat.mean() < 0.75
        assert flat.std() > 0.15
        frac_extreme = np.mean((flat < 0.02) | (flat > 0.98))
        assert frac_extreme < 0.25, frac_extreme

    def test_calibration_curve_near_diagonal(self, forecasts_and_truth):
        samples, truth, _ = forecasts_and_truth
        pcts = np.concatenate([
            np.asarray(sample_percentiles(jnp.asarray(samples[w]),
                                          jnp.asarray(truth[w])))
            for w in range(WINDOWS)
        ])
        levels, observed = calibration(jnp.asarray(pcts))
        # W*H = 240 correlated observations: loose band around the diagonal
        err = np.max(np.abs(np.asarray(observed) - np.asarray(levels)))
        assert err < 0.30, (np.asarray(levels), np.asarray(observed))

    def test_forecast_dispersion_matches_horizon(self, forecasts_and_truth):
        # MC std should grow ~ vol * sqrt(t/2) across the horizon: the
        # CumTrapz endpoint-halving parity artifact halves each step's
        # variance (test_pipeline.py TestRolloutClosedForm pins
        # var_step = 0.5 dt vol^2), so PERFECT vol recovery gives ratio
        # 1.0 against this oracle — not 1/sqrt(2) against the unhalved
        # one, which left almost no low-side margin.
        samples, _, _ = forecasts_and_truth
        stds = samples.std(axis=1).mean(axis=0)  # (H,)
        expected = TRUE_VOL * np.sqrt(0.5 * DT * np.arange(1, H + 1))
        ratio = stds / expected
        assert 0.6 < np.median(ratio) < 1.7, ratio


class TestCoverageFromQuantiles:
    def test_calibrated_gaussian_matches_levels(self):
        """Coverage computed from a quantile fan equals the nominal levels
        when truth is drawn from the fan's own law (the summaries-output
        analog of the calibration-vs-diagonal check)."""
        from scipy.stats import norm

        from volt_tpu.calibration import coverage_from_quantiles

        rng = np.random.default_rng(0)
        b, h, levels = 50, 20, jnp.asarray(
            [0.025, 0.05, 0.25, 0.5, 0.75, 0.95, 0.975])
        mu = rng.standard_normal((b, 1))
        sd = rng.uniform(0.5, 2.0, (b, 1))
        fan = mu[:, None, :] + sd[:, None, :] * norm.ppf(
            np.asarray(levels))[None, :, None]
        fan = jnp.asarray(np.broadcast_to(fan, (b, len(levels), h)),
                          jnp.float32)
        truth = jnp.asarray(mu + sd * rng.standard_normal((b, h)),
                            jnp.float32)
        lv, obs = coverage_from_quantiles(levels, fan, truth)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(lv),
                                   atol=0.05)

    def test_matches_sample_percentile_coverage(self, forecasts_and_truth):
        """On a real pipeline forecast, fan-based coverage agrees with the
        raw-sample percentile computation at the shared levels."""
        from volt_tpu.calibration import (coverage_from_quantiles,
                                          sample_percentiles)

        all_samples, all_truth = forecasts_and_truth[:2]
        samples = jnp.asarray(all_samples[0])  # one window: (S, H)
        truth = jnp.asarray(all_truth[0])
        levels = jnp.asarray([0.1, 0.25, 0.5, 0.75, 0.9])
        fan = jnp.quantile(samples, levels, axis=0)  # (L, H)
        _, obs = coverage_from_quantiles(levels, fan, truth)
        pct = sample_percentiles(samples, truth)  # (H,)
        # fan coverage counts truth <= q_l <=> percentile-of-truth <= l
        want = jnp.mean(
            (pct[None, :] <= levels[:, None]).astype(jnp.float32), axis=1)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(want),
                                   atol=0.15)


class TestQuantileFanCalibrationEndToEnd:
    """Coverage-vs-nominal straight from the production quantiles delivery
    on well-specified GBM with known futures — the in-suite miniature of
    the 500-asset on-chip coverage experiment (PERFORMANCE.md)."""

    def test_observed_coverage_tracks_nominal(self):
        from volt_tpu.calibration import coverage_from_quantiles

        rng = np.random.default_rng(11)
        b, ntrain, h = 16, 150, 10
        z = rng.standard_normal((b, ntrain + h - 1))
        logp = np.concatenate(
            [np.zeros((b, 1)),
             np.cumsum(TRUE_VOL * np.sqrt(DT) * z, axis=1)], axis=1)
        prices = (50.0 * np.exp(logp)).astype(np.float32)
        train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) * DT
        test_x = jnp.arange(h, dtype=jnp.float32) * DT + train_x[-1] + DT
        cfg = PipelineConfig(gpcv_iters=150, vol_iters=150, data_iters=100,
                             mean_func="ewma", k=50, nsample=400,
                             output="quantiles")
        fan, aux = fit_forecast_batch(
            jax.random.key(0), train_x, jnp.asarray(prices[:, :ntrain]),
            test_x, cfg,
        )
        assert np.asarray(aux["ok"]).all()
        truth = np.log(prices[:, ntrain:])
        levels, obs = coverage_from_quantiles(
            cfg.quantile_levels, fan, jnp.asarray(truth)
        )
        obs = np.asarray(obs)
        lv = np.asarray(levels)
        # b*h = 160 cells: statistical bound, not a parity bound.  The
        # pipeline must be in the right calibration regime — monotone
        # coverage, neither collapsed (all ~0/1) nor inverted.
        assert (np.diff(obs) >= -1e-6).all(), obs
        assert np.max(np.abs(obs - lv)) < 0.30, (lv, obs)
        # the central band must actually separate the tails
        assert obs[0] < 0.5 < obs[-1], obs
