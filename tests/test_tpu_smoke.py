"""Opt-in real-TPU smoke lane (round-2 verdict item 5).

The main suite forces the CPU backend, so the TPU-only dispatch branches
(Pallas volt-covariance in ``VolatilityKernel.__call__``, Pallas banded
EWMA for k >= 128) execute in-suite only in interpret mode — a
Mosaic-level regression would pass CI and surface first in ``bench.py``.
This lane runs those branches on the actual chip:

    VOLT_TPU_TESTS=1 python -m pytest -m tpu tests/ -q

(~2 min; run before recording a bench number).  ``tests/conftest.py``
skips its CPU forcing when ``VOLT_TPU_TESTS`` is set; every test here
skips unless the default backend really is TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs the real TPU backend "
                              "(VOLT_TPU_TESTS=1, axon tunnel)"),
]


def _fetch(x):
    # axon: block_until_ready does not synchronize; device_get is the
    # only reliable barrier (CLAUDE.md).
    return jax.device_get(x)


class TestPallasDispatchOnChip:
    def test_volt_covariance_matches_xla(self):
        from volt_tpu.kernels import VolatilityKernel
        from volt_tpu.ops.volint import min_index_covariance, vol_integral

        n = 256
        x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        vol = 0.2 + 0.05 * jnp.sin(jnp.arange(n, dtype=jnp.float32))
        kern = VolatilityKernel()
        got = _fetch(kern({}, x, vol))        # TPU -> Pallas branch
        want = _fetch(min_index_covariance(vol_integral(x, vol)))
        np.testing.assert_array_equal(got, want)  # bit-identical contract

    def test_volt_covariance_batched_and_grad(self):
        from volt_tpu.kernels import VolatilityKernel
        from volt_tpu.ops.volint import min_index_covariance, vol_integral

        n, b = 128, 4
        x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        vol = 0.2 + 0.01 * jax.random.normal(jax.random.key(0), (b, n))
        kern = VolatilityKernel()
        cov = _fetch(kern({}, x, vol))
        assert cov.shape == (b, n, n)
        # per-batch-row BlockSpec (round 3): every batch row must stay
        # bit-identical to the XLA twin, not merely finite
        want = _fetch(min_index_covariance(vol_integral(x, vol)))
        np.testing.assert_array_equal(cov, want)
        g = _fetch(jax.grad(lambda v: jnp.sum(kern({}, x, v)))(vol))
        assert np.isfinite(g).all() and (np.abs(g) > 0).any()

    def test_ewma_pallas_branch_matches_conv(self):
        from volt_tpu.ops.ewma import _ewma_conv, ewma

        y = 100.0 + jnp.cumsum(
            jax.random.normal(jax.random.key(1), (8, 999)), axis=-1
        )
        k = 400  # >= _PALLAS_MIN_K -> Pallas banded matmul on TPU
        got = _fetch(ewma(y, k))
        want = _fetch(_ewma_conv(y, k))
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestPipelineOnChip:
    def test_fit_forecast_batch_small(self):
        from volt_tpu.data import sabr_paths
        from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

        n, h = 200, 10
        f, _ = sabr_paths(steps=n + 1, seed=3, n_paths=4)
        train_x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        test_x = train_x[-1] + (1.0 / 252) * jnp.arange(
            1, h + 1, dtype=jnp.float32
        )
        cfg = PipelineConfig(gpcv_iters=30, vol_iters=30, data_iters=30,
                             k=100, nsample=64)
        samples, aux = fit_forecast_batch(
            jax.random.key(0), train_x, jnp.asarray(f), test_x, cfg
        )
        samples = _fetch(samples)
        assert samples.shape == (4, 64, h)
        assert np.isfinite(samples).all()
        assert _fetch(aux["ok"]).all()

        qcfg = PipelineConfig(gpcv_iters=30, vol_iters=30, data_iters=30,
                              k=100, nsample=64, output="quantiles")
        fan, _ = fit_forecast_batch(
            jax.random.key(0), train_x, jnp.asarray(f), test_x, qcfg
        )
        fan = _fetch(fan)
        assert fan.shape == (4, len(qcfg.quantile_levels), h)
        assert np.isfinite(fan).all()
        # fan rows are ordered quantiles
        assert (np.diff(fan, axis=1) >= -1e-5).all()

    def test_multitask_vol_fit_on_chip(self):
        from volt_tpu.models.multitask import MultitaskBMGP
        from volt_tpu.train import _adam_scan

        t, n = 16, 200
        mt = MultitaskBMGP(num_tasks=t, rank=1)
        x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        y = jnp.log(0.2) + 0.1 * jax.random.normal(jax.random.key(2),
                                                   (n, t))

        @jax.jit
        def fit(p):
            cache = mt.spectral_cache(x, y)
            return _adam_scan(lambda q: -mt.mll_spectral(q, cache, n, t),
                              p, 20, 0.01)

        params, losses = fit(mt.init())
        losses = _fetch(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_fbm_pipeline_on_chip(self):
        # the increment-domain FBM factorization (ops/fbm.py) lowered on
        # the real chip: small end-to-end fit, every lane ok.
        from volt_tpu.data import sabr_paths
        from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

        n, h = 150, 8
        f, _ = sabr_paths(steps=n + 1, seed=5, n_paths=4)
        train_x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        test_x = train_x[-1] + (1.0 / 252) * jnp.arange(
            1, h + 1, dtype=jnp.float32
        )
        cfg = PipelineConfig(gpcv_iters=30, vol_iters=30, data_iters=30,
                             k=50, nsample=32, kernel="fbm")
        samples, aux = fit_forecast_batch(
            jax.random.key(0), train_x, jnp.asarray(f), test_x, cfg
        )
        samples = _fetch(samples)
        assert samples.shape == (4, 32, h)
        assert np.isfinite(samples).all()
        assert _fetch(aux["ok"]).all()


class TestSpectralFFTOnChip:
    def test_fft_projection_matches_matmul_on_chip(self):
        """XLA:TPU's FFT (odd length 2n+1) vs the materialized-basis
        matmul, on the real chip — the round-5 O(n log n) projection
        must hold its CPU-pinned accuracy through the TPU FFT lowering."""
        from volt_tpu.ops.brownian import min_kernel_project

        n = 6000  # > _PROJECT_FFT_MIN_N: auto takes the FFT branch
        y = 0.3 * jax.random.normal(jax.random.key(7), (n,))
        a = _fetch(jax.jit(
            lambda v: min_kernel_project(v, method="matmul"))(y))
        b = _fetch(jax.jit(
            lambda v: min_kernel_project(v, method="fft"))(y))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=5e-5 * max(scale, 1.0))

    def test_vol_fit_beyond_basis_bound_on_chip(self):
        """Spectral vol-GP fit at n = 40000 (impossible before round 5:
        the materialized basis would need 6.4 GB and overflows its int32
        angle reduction) runs on-chip with O(n) memory."""
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.train import _adam_scan

        n = 40000
        x = jnp.arange(1, n + 1, dtype=jnp.float32) * (1.0 / 252)
        y = jnp.log(0.2) + 0.1 * jax.random.normal(jax.random.key(3), (n,))
        bm = BMGP()

        @jax.jit
        def fit(p):
            cache = bm.spectral_cache(x, y)
            return _adam_scan(lambda q: -bm.mll_spectral(q, cache),
                              p, 20, 0.05)

        params, losses = fit(bm.init())
        losses = _fetch(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
