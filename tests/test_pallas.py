"""Pallas kernels vs their XLA reference implementations (interpret mode
on the CPU test backend; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.ops.pallas import gh_expected_log_prob, volt_covariance
from volt_tpu.ops.quadrature import expected_value
from volt_tpu.ops.volint import min_index_covariance, vol_integral


class TestVoltCovariancePallas:
    @pytest.mark.parametrize("n", [256, 100, 399])
    def test_matches_xla(self, rng, n):
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        vol = (0.1 + 0.2 * rng.random(n)).astype(np.float32)
        got = volt_covariance(jnp.asarray(x), jnp.asarray(vol))
        expected = min_index_covariance(
            vol_integral(jnp.asarray(x), jnp.asarray(vol))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)

    def test_batched(self, rng):
        n, b = 128, 3
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        vols = (0.1 + 0.2 * rng.random((b, n))).astype(np.float32)
        got = volt_covariance(jnp.asarray(x), jnp.asarray(vols))
        assert got.shape == (b, n, n)
        expected = min_index_covariance(
            vol_integral(jnp.asarray(x), jnp.asarray(vols))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


class TestGHExpectedLogProbPallas:
    def test_matches_quadrature(self, rng):
        n = 300
        y = (0.02 * rng.standard_normal(n)).astype(np.float32)
        mu = (-1.5 + 0.3 * rng.standard_normal(n)).astype(np.float32)
        s2 = (0.05 + 0.1 * rng.random(n)).astype(np.float32)

        got = gh_expected_log_prob(jnp.asarray(y), jnp.asarray(mu),
                                   jnp.asarray(s2))

        def logp(f):
            scale = jnp.clip(jnp.exp(f), min=1e-3)
            return (-0.5 * (jnp.asarray(y) / scale) ** 2 - jnp.log(scale)
                    - 0.5 * np.log(2 * np.pi))

        expected = expected_value(logp, jnp.asarray(mu), jnp.asarray(s2))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_matches_likelihood_module(self, rng):
        from volt_tpu.likelihoods import VolatilityGaussianLikelihood

        lh = VolatilityGaussianLikelihood(param="exp")
        n = 64
        y = (0.02 * rng.standard_normal(n)).astype(np.float32)
        mu = np.full(n, -1.5, np.float32)
        s2 = np.full(n, 0.1, np.float32)
        got = gh_expected_log_prob(jnp.asarray(y), jnp.asarray(mu),
                                   jnp.asarray(s2))
        expected = lh.expected_log_prob({}, jnp.asarray(y), jnp.asarray(mu),
                                        jnp.asarray(s2))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestEwmaPallas:
    @pytest.mark.parametrize("k", [5, 64, 300])
    def test_matches_xla(self, rng, k):
        from volt_tpu.ops.pallas import ewma_pallas
        from volt_tpu.ops.ewma import ewma

        y = (rng.standard_normal(433) + 5.0).astype(np.float32)
        got = ewma_pallas(jnp.asarray(y), k)
        expected = ewma(jnp.asarray(y), k)
        assert got.shape == (434,)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    def test_batched(self, rng):
        from volt_tpu.ops.pallas import ewma_pallas
        from volt_tpu.ops.ewma import ewma

        y = rng.standard_normal((5, 200)).astype(np.float32)
        got = ewma_pallas(jnp.asarray(y), 20)
        np.testing.assert_allclose(got, ewma(jnp.asarray(y), 20),
                                   rtol=1e-5, atol=1e-6)
