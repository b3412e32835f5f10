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


class TestGHBackwardKernel:
    """The fused analytic backward kernel vs autodiff of the XLA quadrature
    (the dispatch itself is TPU-only; here both run on CPU/interpret)."""

    def _data(self, rng, shape):
        y = (0.05 * rng.standard_normal(shape)).astype(np.float32)
        mu = (-1.5 + 0.3 * rng.standard_normal(shape)).astype(np.float32)
        s2 = (0.05 + 0.1 * rng.random(shape)).astype(np.float32)
        return jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s2)

    def _xla(self, y, mu, s2):
        def logp(f):
            scale = jnp.clip(jnp.exp(jnp.clip(f, max=80.0)), min=1e-3)
            return (-0.5 * (y / scale) ** 2 - jnp.log(scale)
                    - 0.5 * np.log(2 * np.pi))

        return expected_value(logp, mu, s2)

    def test_grads_match_xla_autodiff(self, rng):
        y, mu, s2 = self._data(rng, (2, 90))
        gp = jax.grad(lambda *a: jnp.sum(gh_expected_log_prob(*a)),
                      argnums=(0, 1, 2))(y, mu, s2)
        gx = jax.grad(lambda *a: jnp.sum(self._xla(*a)),
                      argnums=(0, 1, 2))(y, mu, s2)
        for name, a, b in zip(("dy", "dmu", "ds2"), gp, gx):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    def test_grads_under_vmap(self, rng):
        """The per-asset pipeline shape: vmapped scalar-loss gradients."""
        y, mu, s2 = self._data(rng, (4, 70))
        lp = jax.vmap(lambda a, b, c: jnp.sum(gh_expected_log_prob(a, b, c)))
        lx = jax.vmap(lambda a, b, c: jnp.sum(self._xla(a, b, c)))
        gp = jax.grad(lambda m: jnp.sum(lp(y, m, s2)))(mu)
        gx = jax.grad(lambda m: jnp.sum(lx(y, m, s2)))(mu)
        np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)

    def test_overflow_region_finite(self, rng):
        """Huge variance pushes tail nodes past exp overflow: the capped
        kernel must stay finite in value and gradient."""
        y, mu, _ = self._data(rng, (30,))
        s2 = jnp.full((30,), 200.0, jnp.float32)
        val = gh_expected_log_prob(y, mu, s2)
        assert bool(jnp.isfinite(val).all())
        g = jax.grad(lambda m: jnp.sum(gh_expected_log_prob(y, m, s2)))(mu)
        assert bool(jnp.isfinite(g).all())


class TestDispatchWrappers:
    """The custom-vjp wrappers the production paths dispatch to on TPU
    (on the CPU test backend the kernels run in interpret mode)."""

    def test_volt_covariance_grad_matches_xla(self, rng):
        from volt_tpu.ops.pallas import volt_covariance_grad

        n = 130
        x = jnp.asarray((np.arange(n, dtype=np.float32) + 1) / 252)
        vol = jnp.asarray((0.1 + 0.2 * rng.random((2, n))).astype(np.float32))
        np.testing.assert_allclose(
            volt_covariance_grad(x, vol),
            min_index_covariance(vol_integral(x, vol)),
            rtol=1e-5, atol=1e-7,
        )
        gp = jax.grad(lambda v: jnp.sum(jnp.cos(volt_covariance_grad(x, v))))(vol)
        gx = jax.grad(lambda v: jnp.sum(jnp.cos(
            min_index_covariance(vol_integral(x, v)))))(vol)
        np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-6)

    def test_ewma_mxu_grad_matches_conv(self, rng):
        from volt_tpu.ops.ewma import _ewma_conv, _ewma_mxu

        y = jnp.asarray((4 + 0.1 * rng.standard_normal((3, 220))).astype(
            np.float32))
        np.testing.assert_allclose(_ewma_mxu(y, 150), _ewma_conv(y, 150),
                                   rtol=2e-5, atol=2e-5)
        gp = jax.grad(lambda v: jnp.sum(jnp.sin(_ewma_mxu(v, 150))))(y)
        gx = jax.grad(lambda v: jnp.sum(jnp.sin(_ewma_conv(v, 150))))(y)
        np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-4)


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
