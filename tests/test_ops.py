"""Unit tests for the numerics core (volt_tpu.ops).

Closed-form oracles are computed in float64 numpy (the reference's GPyTorch
backbone is not available on this image; its formulas are small enough to
restate exactly — each test cites the behavior being pinned).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.stats

from volt_tpu import ops


# ---------------------------------------------------------------------------
# Constraints
# ---------------------------------------------------------------------------


class TestConstraints:
    def test_interval_roundtrip(self):
        c = ops.Interval(0.0, 1.0)
        v = jnp.array([0.05, 0.2, 0.5, 0.95])
        np.testing.assert_allclose(c.forward(c.inverse(v)), v, rtol=1e-4)

    def test_interval_matches_sigmoid_form(self):
        # value = lower + (upper - lower) * sigmoid(raw)  [BMKernel.py:10]
        c = ops.Interval(-3.0, 3.0)
        raw = jnp.array([-2.0, 0.0, 1.5])
        expected = -3.0 + 6.0 / (1.0 + np.exp(-np.asarray(raw)))
        np.testing.assert_allclose(c.forward(raw), expected, rtol=1e-6)

    def test_interval_zero_raw_is_midpoint(self):
        # raw_vol init = zeros => vol = 0.5 before the setter runs
        assert float(ops.Interval(0.0, 1.0).forward(0.0)) == pytest.approx(0.5)

    def test_positive_roundtrip(self):
        c = ops.Positive()
        v = jnp.array([1e-3, 0.5, 10.0])
        np.testing.assert_allclose(c.forward(c.inverse(v)), v, rtol=1e-4)

    def test_greater_than_noise_parity_trap(self):
        # raw_noise = 1e-5 gives noise ~= softplus(1e-5) + 1e-4 ~= 0.6932,
        # NOT 1e-5 (documented parity trap, train_utils.py:107).
        c = ops.GreaterThan(1e-4)
        noise = float(c.forward(1e-5))
        assert noise == pytest.approx(np.log(2.0) + 1e-4, rel=1e-4)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------


def _rand_psd(rng, n, batch=()):
    a = rng.standard_normal((*batch, n, n))
    return (a @ np.swapaxes(a, -1, -2) + n * np.eye(n)).astype(np.float32)


class TestPsdSafeCholesky:
    def test_matches_numpy_when_pd(self, rng):
        a = _rand_psd(rng, 16)
        chol = ops.psd_safe_cholesky(jnp.asarray(a))
        np.testing.assert_allclose(chol, np.linalg.cholesky(a), rtol=2e-4, atol=2e-4)

    def test_batched(self, rng):
        a = _rand_psd(rng, 8, batch=(3, 2))
        chol = ops.psd_safe_cholesky(jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(chol) @ np.swapaxes(np.asarray(chol), -1, -2),
            a,
            rtol=1e-3,
            atol=1e-3,
        )

    def test_escalates_jitter_on_rank_deficiency(self, rng):
        # Rank-1 PSD matrix: bare Cholesky fails; ladder must recover.
        v = rng.standard_normal(12).astype(np.float32)
        a = jnp.asarray(np.outer(v, v))
        chol = ops.psd_safe_cholesky(a, jitter=1e-4)
        assert bool(jnp.all(jnp.isfinite(chol)))
        recon = chol @ chol.T
        np.testing.assert_allclose(recon, np.asarray(a), atol=2e-2)

    def test_jit_and_grad_safe(self, rng):
        a = jnp.asarray(_rand_psd(rng, 6))

        @jax.jit
        def f(m):
            return jnp.sum(ops.psd_safe_cholesky(m))

        g = jax.grad(f)(a)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_grad_matches_native_cholesky(self, rng):
        # When no jitter is needed the custom VJP must agree with jax's
        # built-in Cholesky gradient.
        a = jnp.asarray(_rand_psd(rng, 7))
        w = jnp.asarray(rng.standard_normal((7, 7)).astype(np.float32))

        g_custom = jax.grad(lambda m: jnp.sum(ops.psd_safe_cholesky(m) * w))(a)
        g_native = jax.grad(lambda m: jnp.sum(jnp.linalg.cholesky(m) * w))(a)
        # Equivalent formulas evaluated in a different order: f32 roundoff
        # through the triangular solves is the only difference.
        np.testing.assert_allclose(g_custom, g_native, rtol=2e-2, atol=2e-3)

    def test_cholesky_solve(self, rng):
        a = _rand_psd(rng, 10)
        b = rng.standard_normal((10, 3)).astype(np.float32)
        chol = ops.psd_safe_cholesky(jnp.asarray(a))
        x = ops.cholesky_solve(chol, jnp.asarray(b))
        np.testing.assert_allclose(
            x, np.linalg.solve(a, b), rtol=1e-3, atol=1e-3
        )


# ---------------------------------------------------------------------------
# MVN algebra
# ---------------------------------------------------------------------------


class TestMvn:
    def test_log_prob_matches_scipy(self, rng):
        n = 20
        cov = _rand_psd(rng, n).astype(np.float64)
        mean = rng.standard_normal(n)
        y = rng.standard_normal(n)
        expected = scipy.stats.multivariate_normal.logpdf(y, mean, cov)
        got = ops.mvn_log_prob(
            jnp.asarray(y, jnp.float32),
            jnp.asarray(mean, jnp.float32),
            jnp.asarray(cov, jnp.float32),
        )
        assert float(got) == pytest.approx(expected, rel=1e-4)

    def test_kl_matches_closed_form(self, rng):
        n = 8
        cq = _rand_psd(rng, n).astype(np.float64)
        cp = _rand_psd(rng, n).astype(np.float64)
        mq = rng.standard_normal(n)
        mp = rng.standard_normal(n)
        lq, lp = np.linalg.cholesky(cq), np.linalg.cholesky(cp)
        cp_inv = np.linalg.inv(cp)
        expected = 0.5 * (
            np.trace(cp_inv @ cq)
            + (mp - mq) @ cp_inv @ (mp - mq)
            - n
            + np.linalg.slogdet(cp)[1]
            - np.linalg.slogdet(cq)[1]
        )
        got = ops.mvn_kl(
            jnp.asarray(mq, jnp.float32),
            jnp.asarray(lq, jnp.float32),
            jnp.asarray(mp, jnp.float32),
            jnp.asarray(lp, jnp.float32),
        )
        assert float(got) == pytest.approx(expected, rel=1e-4)

    def test_conditional_matches_dense_formula(self, rng):
        n, m = 15, 4
        full = _rand_psd(rng, n + m).astype(np.float64)
        k_tr = full[:n, :n]
        k_tr_te = full[:n, n:]
        k_te = full[n:, n:]
        resid = rng.standard_normal(n)
        mean_exp = k_tr_te.T @ np.linalg.solve(k_tr, resid)
        cov_exp = k_te - k_tr_te.T @ np.linalg.solve(k_tr, k_tr_te)
        mean_got, cov_got = ops.conditional(
            jnp.asarray(k_tr, jnp.float32),
            jnp.asarray(k_tr_te, jnp.float32),
            jnp.asarray(k_te, jnp.float32),
            jnp.asarray(resid, jnp.float32),
        )
        np.testing.assert_allclose(mean_got, mean_exp, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(cov_got, cov_exp, rtol=1e-3, atol=1e-3)

    def test_sample_moments(self, rng):
        cov = np.array([[2.0, 0.8], [0.8, 1.0]], np.float32)
        mean = jnp.array([1.0, -2.0])
        s = ops.sample_mvn(jax.random.key(0), mean, jnp.asarray(cov), (200_000,))
        np.testing.assert_allclose(jnp.mean(s, 0), mean, atol=2e-2)
        np.testing.assert_allclose(np.cov(np.asarray(s).T), cov, atol=3e-2)


# ---------------------------------------------------------------------------
# Gauss–Hermite quadrature
# ---------------------------------------------------------------------------


class TestQuadrature:
    def test_polynomial_exact(self):
        # E[f^2] for f ~ N(mu, s2) = mu^2 + s2, exact under GH quadrature.
        mu, s2 = jnp.array([0.3, -1.2]), jnp.array([0.5, 2.0])
        got = ops.expected_value(lambda f: f**2, mu, s2)
        np.testing.assert_allclose(got, mu**2 + s2, rtol=1e-5)

    def test_gaussian_expected_log_prob(self):
        # E_f[log N(y; 0, exp(2f))] has closed form for f ~ N(mu, s2):
        # -0.5 log(2 pi) - mu - 0.5 y^2 E[exp(-2f)]
        #   with E[exp(-2f)] = exp(-2 mu + 2 s2).
        mu, s2, y = 0.1, 0.3, 0.7
        got = ops.expected_value(
            lambda f: -0.5 * np.log(2 * np.pi) - f - 0.5 * y**2 * jnp.exp(-2 * f),
            jnp.float32(mu),
            jnp.float32(s2),
        )
        expected = (
            -0.5 * np.log(2 * np.pi) - mu - 0.5 * y**2 * np.exp(-2 * mu + 2 * s2)
        )
        assert float(got) == pytest.approx(expected, rel=1e-4)

    def test_node_count_default_is_75(self):
        locs, w = ops.gauss_hermite_nodes()
        assert locs.shape == (75,) and w.shape == (75,)
        assert float(jnp.sum(w)) == pytest.approx(1.0, rel=1e-5)


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


from reference_oracles import ewma_reference as _ewma_reference


class TestEwma:
    @pytest.mark.parametrize("k", [3, 20, 100])
    def test_matches_reference_conv(self, rng, k):
        y = rng.standard_normal(250).astype(np.float32) + 5.0
        got = ops.ewma(jnp.asarray(y), k)
        expected = _ewma_reference(y, k)
        assert got.shape == (251,)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_first_output_is_padding_value(self, rng):
        y = rng.standard_normal(50).astype(np.float32)
        got = ops.ewma(jnp.asarray(y), 10)
        assert float(got[0]) == pytest.approx(float(y[0]), rel=1e-5)

    def test_batched(self, rng):
        y = rng.standard_normal((4, 60)).astype(np.float32)
        got = ops.ewma(jnp.asarray(y), 12)
        assert got.shape == (4, 61)
        for b in range(4):
            np.testing.assert_allclose(
                got[b], _ewma_reference(y[b], 12), rtol=1e-4, atol=1e-5
            )

    @pytest.mark.parametrize("k", [5, 64, 300])
    def test_window_state_matches_filter_tail(self, rng, k):
        # The scan-state value equals the full filter's last output, and
        # stays equal as new points are appended.
        y = rng.standard_normal(220).astype(np.float32)
        w = ops.ewma_weights(k)
        buf = ops.window_init(jnp.asarray(y[:200]), k)
        for t in range(200, 220):
            full = ops.ewma(jnp.asarray(y[:t]), k)
            assert float(ops.window_value(buf, w)) == pytest.approx(
                float(full[-1]), abs=1e-5
            )
            buf = ops.window_append(buf, jnp.asarray(y[t]))

    def test_window_shorter_series_than_k(self, rng):
        # ntrain-1 = 399 < k = 400 occurs in the stock config; padding rules.
        y = rng.standard_normal(7).astype(np.float32)
        k = 12
        w = ops.ewma_weights(k)
        buf = ops.window_init(jnp.asarray(y), k)
        assert float(ops.window_value(buf, w)) == pytest.approx(
            float(_ewma_reference(y, k)[-1]), abs=1e-5
        )


# ---------------------------------------------------------------------------
# Volatility integral / min-index covariance
# ---------------------------------------------------------------------------


def _cumtrapz_reference(y, x):
    """Literal restatement of reference kernels/VolKernel.py:4-10."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    dx = x[1] - x[0]
    w = dx * np.ones_like(x)
    w[0] *= 0.5
    w[-1] *= 0.5
    return np.cumsum(w * y)


class TestVolIntegral:
    def test_matches_reference_cumtrapz(self, rng):
        n = 64
        x = np.arange(1, n + 1, dtype=np.float32) / 252
        vol = (0.1 + 0.05 * rng.random(n)).astype(np.float32)
        got = ops.vol_integral(jnp.asarray(x), jnp.asarray(vol))
        expected = _cumtrapz_reference(vol.astype(np.float64) ** 2, x)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_min_index_covariance(self, rng):
        integral = jnp.asarray(np.sort(rng.random(10)).astype(np.float32))
        k = ops.min_index_covariance(integral)
        expected = np.asarray(integral)[
            np.minimum(np.arange(10)[:, None], np.arange(10)[None, :])
        ]
        np.testing.assert_allclose(k, expected, rtol=1e-6)

    def test_brownian_cholesky_reconstructs(self, rng):
        integral = jnp.asarray(
            np.cumsum(0.01 + rng.random(32)).astype(np.float32)
        )
        chol = ops.brownian_cholesky(integral)
        k = ops.min_index_covariance(integral)
        np.testing.assert_allclose(chol @ chol.T, k, rtol=1e-4, atol=1e-5)

    def test_brownian_cholesky_matches_dense_cholesky(self, rng):
        integral = jnp.asarray(
            np.cumsum(0.05 + rng.random(16)).astype(np.float32)
        )
        analytic = ops.brownian_cholesky(integral)
        dense = np.linalg.cholesky(np.asarray(ops.min_index_covariance(integral)))
        np.testing.assert_allclose(analytic, dense, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# FBM increment-domain factorization (ops/fbm.py)
# ---------------------------------------------------------------------------


from reference_oracles import fbm_gram


def _fbm_gram(x, two_h):
    return fbm_gram(x, two_h=two_h)


class TestFbmCholesky:
    @pytest.mark.parametrize("h", [0.1, 0.3, 0.5, 0.7, 0.9])
    def test_reconstructs_gram(self, h):
        n = 120
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        chol = ops.fbm_cholesky(x, jnp.asarray(2.0 * h, jnp.float32))
        k = _fbm_gram(x, 2.0 * h)
        got = np.asarray(chol, np.float64)
        np.testing.assert_allclose(got @ got.T, k, atol=2e-5)
        # lower-triangular with the exact prior diagonal
        np.testing.assert_allclose(got, np.tril(got))

    def test_noise_cholesky_reconstructs(self):
        n = 80
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        noise = 0.013
        chol = ops.fbm_noise_cholesky(
            x, jnp.asarray(1.4, jnp.float32), jnp.asarray(noise, jnp.float32)
        )
        k = _fbm_gram(x, 1.4) + noise * np.eye(n)
        got = np.asarray(chol, np.float64)
        np.testing.assert_allclose(got @ got.T, k, atol=2e-5)

    def test_robust_where_value_domain_fails(self):
        # H = 0.9, n = 400: cond(K) ~ 1.5e8 — the float32 value-domain
        # Cholesky (and gpytorch's ladder on the reference) fails outright;
        # the increment-domain factor is exact and finite.
        n = 400
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        k32 = jnp.asarray(_fbm_gram(x, 1.8), jnp.float32)
        naive = jnp.linalg.cholesky(k32)
        assert not bool(jnp.all(jnp.isfinite(naive)))
        chol = ops.fbm_cholesky(x, jnp.asarray(1.8, jnp.float32))
        assert bool(jnp.all(jnp.isfinite(chol)))
        got = np.asarray(chol, np.float64)
        k = _fbm_gram(x, 1.8)
        assert np.max(np.abs(got @ got.T - k)) / np.max(np.abs(k)) < 1e-4

    def test_batched_two_h(self):
        n = 32
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        two_h = jnp.asarray([[0.6], [1.2]], jnp.float32)  # (B, 1) kernel vol
        chol = ops.fbm_cholesky(x, two_h)
        assert chol.shape == (2, n, n)
        for b, th in enumerate([0.6, 1.2]):
            got = np.asarray(chol[b], np.float64)
            np.testing.assert_allclose(got @ got.T, _fbm_gram(x, th),
                                       atol=2e-5)

    def test_gradient_wrt_hurst_finite(self):
        # d/dH |dt|^{2H} involves 0^{2H} log 0 terms on the diagonal; the
        # factorization must stay differentiable for the Hurst fit.
        n = 64
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0

        def f(th):
            chol = ops.fbm_cholesky(x, th)
            return jnp.sum(jnp.log(jnp.diagonal(chol))) + jnp.sum(chol[-1])

        g = jax.grad(f)(jnp.asarray(1.0, jnp.float32))
        assert bool(jnp.isfinite(g))


class TestMvnKlUnconstrainedRoot:
    def test_negative_root_diagonal_keeps_value_finite(self, rng):
        # gpytorch's CholeskyVariationalDistribution leaves the root's
        # diagonal unconstrained, and Adam drives it negative mid-fit;
        # Sigma = L L^T is unchanged, so the KL value must stay finite
        # (log|diag|).  Without the abs, every FBM GPCV fit's loss
        # trajectory NaN'd transiently and the pipeline's per-asset
        # `ok` flag condemned healthy lanes.
        n = 6
        chol_q = jnp.asarray(np.tril(rng.standard_normal((n, n))
                                     + 2.0 * np.eye(n)), jnp.float32)
        chol_q_neg = chol_q.at[2, 2].multiply(-1.0).at[5, 5].multiply(-1.0)
        chol_p = jnp.asarray(np.linalg.cholesky(_rand_psd(rng, n)),
                             jnp.float32)
        mq = jnp.asarray(rng.standard_normal(n), jnp.float32)
        mp = jnp.asarray(rng.standard_normal(n), jnp.float32)
        kl_neg = ops.mvn_kl(mq, chol_q_neg, mp, chol_p)
        assert bool(jnp.isfinite(kl_neg))
        q_cov = np.asarray(chol_q_neg, np.float64)
        q_cov = q_cov @ q_cov.T
        p_chol = np.asarray(chol_p, np.float64)
        p_cov = p_chol @ p_chol.T
        diff = np.asarray(mp, np.float64) - np.asarray(mq, np.float64)
        expected = 0.5 * (
            np.trace(np.linalg.solve(p_cov, q_cov))
            + diff @ np.linalg.solve(p_cov, diff)
            - n
            + np.linalg.slogdet(p_cov)[1]
            - np.linalg.slogdet(q_cov)[1]
        )
        np.testing.assert_allclose(float(kl_neg), expected, rtol=1e-4)

    def test_gradient_matches_log_abs(self, rng):
        n = 5
        base = np.tril(rng.standard_normal((n, n)) + 2.0 * np.eye(n))
        base[3, 3] *= -1.0
        chol_p = jnp.asarray(np.linalg.cholesky(_rand_psd(rng, n)),
                             jnp.float32)
        mq = jnp.asarray(rng.standard_normal(n), jnp.float32)
        mp = jnp.asarray(rng.standard_normal(n), jnp.float32)

        g = jax.grad(
            lambda c: ops.mvn_kl(mq, c, mp, chol_p)
        )(jnp.asarray(base, jnp.float32))
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_irregular_grid_exact(self, rng):
        # the increment-domain identity holds on ANY increasing positive
        # grid (train_vol_model accepts irregular calendars for FBM)
        x = jnp.asarray(np.cumsum(0.001 + 0.01 * rng.random(90))
                        .astype(np.float32))
        for th in (0.5, 1.3):
            chol = ops.fbm_cholesky(x, jnp.asarray(th, jnp.float32))
            got = np.asarray(chol, np.float64)
            np.testing.assert_allclose(got @ got.T,
                                       _fbm_gram(np.asarray(x), th),
                                       atol=2e-5)
