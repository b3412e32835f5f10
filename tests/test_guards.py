"""Guard-rail behavior: auto-dispatch boundaries and contract fallbacks.

Covers the round-2 advisor findings: the spectral path's int32 bound,
``_is_equispaced`` degenerate/wobbly grids, and ``sample_vol_paths`` on
non-future query grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.ops.brownian import min_kernel_spectrum, spectral_n_ok
from volt_tpu.train import _is_equispaced, train_vol_model


class TestSpectralNBound:
    def test_bound_values(self):
        assert spectral_n_ok(1000)
        assert spectral_n_ok(16000)
        # max intermediate is (2n-1) n: exact through n=32768
        assert spectral_n_ok(30000)
        assert spectral_n_ok(32768)
        assert not spectral_n_ok(32769)
        assert not spectral_n_ok(40000)

    def test_spectrum_raises_past_bound(self):
        with pytest.raises(ValueError, match="int32"):
            min_kernel_spectrum(40000)

    def test_small_n_still_exact(self):
        n = 7
        mu, u, w = min_kernel_spectrum(n)
        m = np.minimum(np.arange(1, n + 1)[:, None],
                       np.arange(1, n + 1)[None, :])
        rebuilt = (np.asarray(u, np.float64) * np.asarray(mu, np.float64)
                   ) @ np.asarray(u, np.float64).T
        np.testing.assert_allclose(rebuilt, m, atol=1e-4)


class TestIsEquispaced:
    def test_degenerate_grids_route_to_kalman(self):
        # n < 3: the spectral cache's dx gather is ill-defined at n=1
        # (clamped out-of-bounds gather yields dx=0 — advisor finding).
        assert not _is_equispaced(jnp.asarray([0.5]))
        assert not _is_equispaced(jnp.asarray([0.5, 1.0]))

    def test_uniform_float32_grid_accepted_at_large_n(self):
        # float32 rounding in arange(n)*dt diffs grows with |x|; the
        # eps-scaled tolerance must keep accepting the conceptually
        # uniform grid at any n (n=16k is a shipped pipeline shape).
        x = jnp.arange(16000, dtype=jnp.float32) * (1.0 / 252)
        assert _is_equispaced(x)

    def test_one_percent_wobble_rejected(self):
        rng = np.random.default_rng(0)
        dt = 1.0 / 252
        d = dt * (1.0 + 0.01 * rng.uniform(-1, 1, size=499))
        x = jnp.asarray(np.concatenate([[0.0], np.cumsum(d)]), jnp.float32)
        assert not _is_equispaced(x)

    def test_wobbly_grid_trains_via_kalman(self):
        # End-to-end: the auto-select path must pick the Kalman MLL for a
        # wobbly grid and still produce a usable fit.
        rng = np.random.default_rng(1)
        dt = 1.0 / 252
        d = dt * (1.0 + 0.008 * rng.uniform(-1, 1, size=39))
        x = jnp.asarray(np.cumsum(np.concatenate([[dt], d])), jnp.float32)
        vol = jnp.asarray(0.2 + 0.02 * rng.standard_normal(40) ** 2,
                          jnp.float32)
        state = train_vol_model(x, vol, train_iters=20)
        assert bool(jnp.all(jnp.isfinite(state.params["kernel"]["raw_vol"])))

    def test_explicit_override(self):
        x = jnp.arange(32, dtype=jnp.float32) * 0.1
        vol = 0.2 * jnp.ones(32)
        s1 = train_vol_model(x, vol, train_iters=10, vol_mll="spectral")
        s2 = train_vol_model(x, vol, train_iters=10, vol_mll="kalman")
        # same optimum target: both paths train to nearby parameters
        np.testing.assert_allclose(
            np.asarray(s1.params["kernel"]["raw_vol"]),
            np.asarray(s2.params["kernel"]["raw_vol"]), atol=1e-4)
        with pytest.raises(ValueError, match="vol_mll"):
            train_vol_model(x, vol, train_iters=1, vol_mll="bogus")


class TestPipelineMinLength:
    def test_short_series_clear_error(self):
        from volt_tpu.parallel import PipelineConfig, fit_forecast

        x = jnp.asarray([1.0 / 252, 2.0 / 252], jnp.float32)
        cfg = PipelineConfig(gpcv_iters=2, vol_iters=2, data_iters=2, k=2,
                             nsample=2)
        with pytest.raises(ValueError, match="11 train points"):
            fit_forecast(jax.random.key(0), x,
                         jnp.asarray([10.0, 10.1, 10.05]), x + 0.01, cfg)

    def test_n12_runs(self):
        from volt_tpu.parallel import PipelineConfig, fit_forecast

        x = jnp.arange(12, dtype=jnp.float32) * (1.0 / 252)
        prices = jnp.asarray(
            100.0 + np.cumsum(
                0.1 * np.random.default_rng(0).standard_normal(13)
            ), jnp.float32)
        cfg = PipelineConfig(gpcv_iters=3, vol_iters=3, data_iters=3, k=4,
                             nsample=4)
        s, _ = fit_forecast(jax.random.key(0), x, prices,
                            x[-1] + x[:3] + 1.0 / 252, cfg)
        assert s.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(s)))


class TestSampleVolPathsContract:
    def test_non_future_grid_falls_back_dense(self, std_fitted):
        from volt_tpu.rollouts import sample_vol_paths

        train_x, _, _, _, vol_state, _ = std_fitted
        # interpolating / overlapping query: the filtered-state closed
        # form would take sqrt of negative increments -> NaN (advisor
        # finding); the dense posterior handles it.
        mid = jnp.asarray(np.linspace(float(train_x[3]),
                                      float(train_x[-1]), 5), jnp.float32)
        paths = sample_vol_paths(jax.random.key(0), vol_state, mid, 7)
        assert paths.shape == (7, 5)
        assert bool(jnp.all(jnp.isfinite(paths)))
        assert bool(jnp.all(paths > 0))

    def test_future_grid_uses_fast_path(self, std_fitted):
        from volt_tpu.rollouts import sample_vol_paths

        train_x, _, test_x, _, vol_state, _ = std_fitted
        paths = sample_vol_paths(jax.random.key(0), vol_state, test_x, 7)
        ref = jnp.exp(vol_state.sample_forecast(jax.random.key(0), test_x,
                                                (7,)))
        np.testing.assert_allclose(np.asarray(paths), np.asarray(ref))

    def test_jitted_overlapping_grid_nan_poisons(self, std_fitted):
        """USER-jitted call with a contract-violating grid: the host-side
        probe cannot run on tracers, so the fast path is taken — but its
        runtime guard (``ops.brownian.future_grid_ok``) must NaN-poison
        the whole output (loud failure) instead of sampling a silently
        wrong distribution (the round-3 verdict's tracer hole)."""
        from volt_tpu.rollouts import sample_vol_paths

        train_x, _, test_x, _, vol_state, _ = std_fitted

        f = jax.jit(
            lambda tx: sample_vol_paths(jax.random.key(0), vol_state, tx, 5)
        )
        mid = jnp.asarray(np.linspace(float(train_x[3]),
                                      float(train_x[-1]), 4), jnp.float32)
        assert bool(jnp.all(jnp.isnan(f(mid))))
        # non-monotonic but future-starting grid: also poisoned in full
        dt = float(train_x[1] - train_x[0])
        nonmono = train_x[-1] + dt * jnp.asarray([1.0, 3.0, 2.0, 4.0],
                                                 jnp.float32)
        assert bool(jnp.all(jnp.isnan(f(nonmono))))
        # the same jitted program on a valid grid stays finite and equals
        # the eager fast path
        out = f(test_x[:4])
        ref = sample_vol_paths(jax.random.key(0), vol_state, test_x[:4], 5)
        assert bool(jnp.all(jnp.isfinite(out)))
        # jit-vs-eager float noise only (measured ~1e-7 rel)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-7)

    def test_jitted_assume_future_false_takes_dense(self, std_fitted):
        """``assume_future=False`` forces the dense posterior sampler even
        under tracing — the jit-safe route for overlapping queries."""
        from volt_tpu.rollouts import sample_vol_paths

        train_x, _, _, _, vol_state, _ = std_fitted
        mid = jnp.asarray(np.linspace(float(train_x[3]),
                                      float(train_x[-1]), 4), jnp.float32)
        f = jax.jit(
            lambda tx: sample_vol_paths(jax.random.key(0), vol_state, tx, 5,
                                        assume_future=False)
        )
        out = f(mid)
        assert bool(jnp.all(jnp.isfinite(out))) and bool(jnp.all(out > 0))
        # identical draw to the eager call (which host-detects the
        # violation and falls back to the same dense sampler)
        ref = sample_vol_paths(jax.random.key(0), vol_state, mid, 5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_jitted_posterior_forecast_guard(self, std_fitted):
        """The closed-form quantile-path surface (``posterior_forecast``)
        carries the same runtime guard."""
        train_x, _, test_x, _, vol_state, _ = std_fitted

        f = jax.jit(lambda tx: vol_state.module.posterior_forecast(
            vol_state.params, vol_state.train_x, vol_state.train_y, tx))
        mid = jnp.asarray(np.linspace(float(train_x[3]),
                                      float(train_x[-1]), 4), jnp.float32)
        mean, cov = f(mid)
        assert bool(jnp.all(jnp.isnan(mean)))
        assert bool(jnp.all(jnp.isnan(cov)))
        mean_ok, cov_ok = f(test_x[:4])
        assert bool(jnp.all(jnp.isfinite(mean_ok)))
        assert bool(jnp.all(jnp.isfinite(cov_ok)))

    def test_jitted_multitask_matheron_guard(self):
        """The multitask Matheron sampler's rank-one cross block assumes
        ``min(x_n, x*_m) = x_n``; on an overlapping grid it used to
        return FINITE but wrong samples under jit (the one genuinely
        silent case) — now all-NaN via the shared guard."""
        from volt_tpu.models.multitask import MultitaskBMGP

        n, num_tasks = 24, 3
        dt = 1.0 / 252
        train_x = (jnp.arange(n, dtype=jnp.float32) + 1) * dt
        mt = MultitaskBMGP(num_tasks=num_tasks)
        state = mt.fit_state(mt.init(),
                             train_x, jnp.log(jnp.full((n, num_tasks), 0.2)))

        f = jax.jit(lambda tx: state.sample_forecast(jax.random.key(0), tx,
                                                     (4,)))
        overlap = train_x[10:14]
        assert bool(jnp.all(jnp.isnan(f(overlap))))
        fut = train_x[-1] + dt * (jnp.arange(4, dtype=jnp.float32) + 1)
        assert bool(jnp.all(jnp.isfinite(f(fut))))
