"""Kernel parity tests against literal float64 restatements of the
reference formulas (file:line cites in each test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu import kernels as K


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestBMKernel:
    def test_matches_min_formula(self, rng):
        # K = vol * min(s, t), vol = 0.2 default  [BMKernel.py:38-42]
        x = np.sort(rng.random(20)).astype(np.float32)
        kern = K.BMKernel()
        params = kern.init()
        got = kern(params, jnp.asarray(x))
        expected = 0.2 * np.minimum(x[:, None], x[None, :])
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_vol_setter_roundtrip(self):
        kern = K.BMKernel(vol=0.07)
        assert float(kern.vol(kern.init())[0]) == pytest.approx(0.07, rel=1e-4)

    def test_batched(self, rng):
        x = np.sort(rng.random(10)).astype(np.float32)
        kern = K.BMKernel(batch_shape=(3,))
        # perturb per-batch vols through the initialized dict so the test
        # tracks any future param-schema change
        params = kern.init()
        params["raw_vol"] = jnp.asarray([[-1.0], [0.0], [1.0]], jnp.float32)
        got = kern(params, jnp.asarray(x))
        assert got.shape == (3, 10, 10)
        for b, raw in enumerate([-1.0, 0.0, 1.0]):
            vol = _sigmoid(raw)
            np.testing.assert_allclose(
                got[b], vol * np.minimum(x[:, None], x[None, :]), rtol=1e-4
            )

    def test_diag(self, rng):
        x = np.sort(rng.random(12)).astype(np.float32)
        kern = K.BMKernel()
        params = kern.init()
        d = kern(params, jnp.asarray(x), diag=True)
        full = kern(params, jnp.asarray(x))
        np.testing.assert_allclose(d, jnp.diagonal(full), rtol=1e-5)

    def test_cross_covariance(self, rng):
        x1 = np.sort(rng.random(8)).astype(np.float32)
        x2 = np.sort(rng.random(5)).astype(np.float32)
        kern = K.BMKernel()
        got = kern(kern.init(), jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(
            got, 0.2 * np.minimum(x1[:, None], x2[None, :]), rtol=1e-4
        )


class TestFBMKernel:
    def test_matches_closed_form(self, rng):
        # K = (|s|^2H + |t|^2H - |s-t|^2H)/2, H = vol  [FBMKernel.py:38-59]
        x = np.sort(rng.random(15)).astype(np.float32)
        kern = K.FBMKernel(vol=0.4)
        got = kern(kern.init(), jnp.asarray(x))
        h2 = 2 * 0.4
        s, t = x[:, None], x[None, :]
        expected = 0.5 * (
            np.abs(s) ** h2 + np.abs(t) ** h2 - np.abs(s - t) ** h2
        )
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)

    def test_diag_matches_full_without_materializing(self, rng):
        x = np.sort(rng.random(12)).astype(np.float32)
        kern = K.FBMKernel(vol=0.35)
        params = kern.init()
        d = kern(params, jnp.asarray(x), diag=True)
        full = kern(params, jnp.asarray(x))
        np.testing.assert_allclose(d, jnp.diagonal(full), rtol=1e-5,
                                   atol=1e-7)
        # self-covariance diag collapses to |x|^{2H}
        np.testing.assert_allclose(
            d, np.abs(x) ** (2 * 0.35), rtol=1e-3, atol=1e-6
        )

    def test_markov_closed_forms_guarded(self):
        """The BMGP Kalman/Markov forecast surfaces are silently wrong
        (not failing) under FBM; they must raise."""
        from volt_tpu.models.bmgp import BMGP

        gp = BMGP(kernel="fbm")
        params = gp.init()
        x = jnp.arange(1, 31, dtype=jnp.float32) / 252
        y = jnp.zeros((30,), jnp.float32)
        tx = x[-1] + jnp.arange(1, 4, dtype=jnp.float32) / 252
        with pytest.raises(ValueError, match="BM kernel"):
            gp.sample_forecast(jax.random.key(0), params, x, y, tx)
        with pytest.raises(ValueError, match="BM kernel"):
            gp.posterior_forecast(params, x, y, tx)


class TestOUKernel:
    def test_matches_closed_form(self, rng):
        # exp(-|s-t| / lengthscale / 2)  [OUKernel.py:5-23]
        x = rng.random(10).astype(np.float32)
        kern = K.OUKernel(lengthscale=0.37)
        got = kern(kern.init(), jnp.asarray(x))
        d = np.abs(x[:, None] - x[None, :]) / 0.37
        np.testing.assert_allclose(got, np.exp(-d / 2), rtol=1e-4)


class TestVolatilityKernel:
    def _reference(self, x, vol):
        """Literal VolKernel.py:18-42 (joint-grid min-index gather)."""
        x = np.asarray(x, np.float64)
        vol = np.asarray(vol, np.float64)
        dx = x[1] - x[0]
        w = dx * np.ones_like(x)
        w[0] *= 0.5
        w[-1] *= 0.5
        vi = np.cumsum(w * vol * vol)
        idx = np.minimum(np.arange(len(x))[:, None], np.arange(len(x))[None, :])
        return vi[idx]

    def test_matches_reference(self, rng):
        n = 50
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        vol = (0.1 + 0.3 * rng.random(n)).astype(np.float32)
        kern = K.VolatilityKernel()
        got = kern({}, jnp.asarray(x), jnp.asarray(vol))
        np.testing.assert_allclose(got, self._reference(x, vol), rtol=1e-4)

    def test_batched_vol_paths(self, rng):
        n, b = 30, 4
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        vols = (0.1 + 0.3 * rng.random((b, n))).astype(np.float32)
        kern = K.VolatilityKernel()
        got = kern({}, jnp.asarray(x), jnp.asarray(vols))
        assert got.shape == (b, n, n)
        for i in range(b):
            np.testing.assert_allclose(
                got[i], self._reference(x, vols[i]), rtol=1e-4
            )

    def test_diag_is_integral(self, rng):
        n = 20
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        vol = (0.2 * np.ones(n)).astype(np.float32)
        kern = K.VolatilityKernel()
        d = kern({}, jnp.asarray(x), jnp.asarray(vol), diag=True)
        full = kern({}, jnp.asarray(x), jnp.asarray(vol))
        np.testing.assert_allclose(d, jnp.diagonal(full), rtol=1e-6)


class TestStationaryBaselines:
    def test_rbf(self, rng):
        x = rng.random(12).astype(np.float32)
        kern = K.RBFKernel(lengthscale=0.5)
        got = kern(kern.init(), jnp.asarray(x))
        d2 = (x[:, None] - x[None, :]) ** 2
        np.testing.assert_allclose(got, np.exp(-d2 / (2 * 0.25)), rtol=1e-4)

    @pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
    def test_matern_psd_and_unit_diag(self, rng, nu):
        x = rng.random(16).astype(np.float32)
        kern = K.MaternKernel(nu=nu, lengthscale=0.3)
        got = np.asarray(kern(kern.init(), jnp.asarray(x)))
        np.testing.assert_allclose(np.diag(got), 1.0, rtol=1e-5)
        evals = np.linalg.eigvalsh(got.astype(np.float64))
        assert evals.min() > -1e-5

    def test_matern_05_is_exponential(self, rng):
        x = rng.random(10).astype(np.float32)
        kern = K.MaternKernel(nu=0.5, lengthscale=0.4)
        got = kern(kern.init(), jnp.asarray(x))
        d = np.abs(x[:, None] - x[None, :]) / 0.4
        np.testing.assert_allclose(got, np.exp(-d), rtol=1e-4)

    def test_scale_kernel(self, rng):
        x = rng.random(8).astype(np.float32)
        base = K.RBFKernel(lengthscale=0.5)
        kern = K.ScaleKernel(base, outputscale=2.5)
        params = kern.init()
        got = kern(params, jnp.asarray(x))
        expected = 2.5 * np.asarray(base(params["base"], jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_spectral_mixture_formula(self, rng):
        x = rng.random(9).astype(np.float32)
        kern = K.SpectralMixtureKernel(num_mixtures=3)
        params = kern.init()
        got = np.asarray(kern(params, jnp.asarray(x)))
        w = np.asarray(kern.constraint.forward(params["raw_weights"]))
        mu = np.asarray(kern.constraint.forward(params["raw_means"]))
        s = np.asarray(kern.constraint.forward(params["raw_scales"]))
        tau = x[:, None] - x[None, :]
        expected = sum(
            w[q]
            * np.exp(-2 * np.pi**2 * tau**2 * s[q] ** 2)
            * np.cos(2 * np.pi * tau * mu[q])
            for q in range(3)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_spectral_mixture_init_from_data(self, rng):
        x = np.sort(rng.random(40)).astype(np.float32)
        y = rng.standard_normal(40).astype(np.float32)
        kern = K.SpectralMixtureKernel(num_mixtures=4)
        params = kern.initialize_from_data(kern.init(), jnp.asarray(x), jnp.asarray(y))
        got = np.asarray(kern(params, jnp.asarray(x)))
        assert np.isfinite(got).all()

    def test_index_kernel(self, rng):
        kern = K.IndexKernel(num_tasks=4, rank=2)
        params = kern.init()
        b = np.asarray(kern.covar_matrix(params))
        f = np.asarray(params["covar_factor"])
        v = np.log(1 + np.exp(np.asarray(params["raw_var"])))
        np.testing.assert_allclose(b, f @ f.T + np.diag(v), rtol=1e-4)
        assert np.linalg.eigvalsh(b.astype(np.float64)).min() > 0
