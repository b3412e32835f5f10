"""Likelihood and GP-layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from volt_tpu import likelihoods as L
from volt_tpu import gp
from volt_tpu.gp.variational import (
    VariationalState,
    laplace_initialize,
    running_std_latent_init,
)
from volt_tpu.ops import mvn_kl, psd_safe_cholesky


class TestGaussianLikelihood:
    def test_noise_transform(self):
        lh = L.GaussianLikelihood()
        params = lh.init(raw_noise_init=0.0)
        assert float(lh.noise(params)[0]) == pytest.approx(
            np.log(2.0) + 1e-4, rel=1e-4
        )

    def test_init_with_noise(self):
        lh = L.GaussianLikelihood()
        params = lh.init_with_noise(1e-3)
        assert float(lh.noise(params)[0]) == pytest.approx(1e-3, rel=1e-3)

    def test_marginal_covariance(self, rng):
        lh = L.GaussianLikelihood()
        params = lh.init_with_noise(0.5)
        cov = jnp.eye(4)
        got = lh.marginal_covariance(params, cov)
        np.testing.assert_allclose(got, 1.5 * np.eye(4), rtol=1e-4)


class TestVolatilityLikelihood:
    def test_exp_scale(self):
        lh = L.VolatilityGaussianLikelihood(param="exp")
        f = jnp.asarray([-10.0, 0.0, 1.0])
        s = np.asarray(lh.scale({}, f))
        assert s[0] == pytest.approx(1e-3)  # clamp
        assert s[1] == pytest.approx(1.0, rel=1e-5)
        assert s[2] == pytest.approx(np.e, rel=1e-5)

    def test_cv_scale_formula(self, rng):
        lh = L.VolatilityGaussianLikelihood(K=5, param="cv")
        params = lh.init(key=jax.random.key(3))
        f = jnp.asarray(rng.standard_normal(11).astype(np.float32))
        a = np.asarray(lh.trans_a(params))
        b = np.asarray(lh.trans_b(params))
        c = np.asarray(lh.trans_c(params))
        fn = np.asarray(f)
        expected = (
            np.log1p(np.exp(b[None, :] * fn[:, None] + c[None, :])) * a[None, :]
        ).sum(-1)
        np.testing.assert_allclose(
            lh.scale(params, f), np.clip(expected, 1e-3, None), rtol=1e-4
        )

    def test_expected_log_prob_vs_mc(self, rng):
        lh = L.VolatilityGaussianLikelihood(param="exp")
        y = jnp.asarray([0.05, -0.3])
        mean = jnp.asarray([-1.0, -2.0])
        var = jnp.asarray([0.3, 0.1])
        got = lh.expected_log_prob({}, y, mean, var)
        # Monte-Carlo oracle
        fs = (
            rng.standard_normal((400_000, 2)) * np.sqrt(np.asarray(var))
            + np.asarray(mean)
        )
        scale = np.clip(np.exp(fs), 1e-3, None)
        lp = scipy.stats.norm.logpdf(np.asarray(y), 0.0, scale)
        np.testing.assert_allclose(got, lp.mean(0), atol=5e-3)

    def test_analytic_ell_matches_gh75(self, rng):
        # The closed-form exp-param ELL (lognormal moments) must agree
        # with the reference's 75-node quadrature (train_utils.py:52) to
        # float resolution away from the clamp regions — values AND
        # gradients, across a realistic (mean, var) grid.
        lh = L.VolatilityGaussianLikelihood(param="exp")
        n = 64
        y = jnp.asarray(0.5 * rng.standard_normal(n).astype(np.float32))
        # realistic GPCV territory (log-vol of scaled returns): the f32
        # quadrature's own summation noise grows as e^{-2 mean + 2 var},
        # so extreme corners compare quadrature noise, not the math.
        mean = jnp.asarray(
            (-3.2 + 2.5 * rng.random(n)).astype(np.float32)
        )
        var = jnp.asarray((0.01 + 0.35 * rng.random(n)).astype(np.float32))

        a = lh.expected_log_prob({}, y, mean, var)  # analytic default
        q = lh.expected_log_prob({}, y, mean, var, method="quadrature")
        # the residual is the QUADRATURE's float32 summation noise (GH-75
        # in float64 matches the closed form to 1e-12)
        np.testing.assert_allclose(a, q, rtol=5e-4, atol=2e-6)

        def tot(fn):
            def f(m, v):
                return jnp.sum(fn(m, v))
            return jax.grad(f, argnums=(0, 1))(mean, var)

        ga = tot(lambda m, v: lh.expected_log_prob({}, y, m, v))
        gq = tot(lambda m, v: lh.expected_log_prob({}, y, m, v,
                                                   method="quadrature"))
        for x1, x2, name in zip(ga, gq, ("dmean", "dvar")):
            np.testing.assert_allclose(x1, x2, rtol=2e-3, atol=5e-5,
                                       err_msg=name)

        # overflow guard: huge variance stays finite in value and grad
        big = lh.expected_log_prob({}, y, mean, jnp.full((n,), 60.0))
        assert np.isfinite(np.asarray(big)).all()
        g_big = jax.grad(
            lambda v: jnp.sum(lh.expected_log_prob({}, y, mean, v))
        )(jnp.full((n,), 60.0))
        assert np.isfinite(np.asarray(g_big)).all()

        with pytest.raises(ValueError, match="analytic"):
            L.VolatilityGaussianLikelihood(param="cv").expected_log_prob(
                {}, y, mean, var, method="analytic"
            )


class TestExactGP:
    def test_exact_mll_matches_scipy(self, rng):
        n = 30
        a = rng.standard_normal((n, n))
        cov = (a @ a.T / n + np.eye(n)).astype(np.float64)
        y = rng.standard_normal(n)
        mean = rng.standard_normal(n)
        noise = 0.3
        expected = scipy.stats.multivariate_normal.logpdf(
            y, mean, cov + noise * np.eye(n)
        ) / n
        got = gp.exact_mll(
            jnp.asarray(y, jnp.float32),
            jnp.asarray(mean, jnp.float32),
            jnp.asarray(cov, jnp.float32),
            noise,
        )
        assert float(got) == pytest.approx(expected, rel=1e-4)

    def test_fixed_cov_path_matches_chol_path(self, rng):
        n = 25
        a = rng.standard_normal((n, n))
        cov = jnp.asarray((a @ a.T / n + np.eye(n)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        mean = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cache = gp.make_fixed_cov_cache(cov)
        for noise in [1e-3, 0.1, 1.0]:
            direct = float(gp.exact_mll(y, mean, cov, noise))
            fast = float(gp.exact_mll_fixed_cov(y, mean, cache, noise))
            assert fast == pytest.approx(direct, rel=1e-4), noise

    def test_fixed_cov_gradients_match(self, rng):
        n = 20
        a = rng.standard_normal((n, n))
        cov = jnp.asarray((a @ a.T / n + np.eye(n)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cache = gp.make_fixed_cov_cache(cov)

        def loss_direct(c, raw):
            return -gp.exact_mll(y, jnp.full((n,), c), cov, jnp.exp(raw))

        def loss_fast(c, raw):
            return -gp.exact_mll_fixed_cov(
                y, jnp.full((n,), c), cache, jnp.exp(raw)
            )

        g1 = jax.grad(loss_direct, argnums=(0, 1))(0.3, -2.0)
        g2 = jax.grad(loss_fast, argnums=(0, 1))(0.3, -2.0)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)

    def test_posterior_interpolates_low_noise(self, rng):
        # With tiny noise the posterior mean at train points ~ residuals.
        n = 15
        x = np.sort(rng.random(n)).astype(np.float32)
        cov = np.minimum(x[:, None], x[None, :]).astype(np.float32) + 1e-4 * np.eye(n, dtype=np.float32)
        resid = rng.standard_normal(n).astype(np.float32) * 0.1
        mean, pcov = gp.posterior(
            jnp.asarray(cov), jnp.asarray(cov), jnp.asarray(cov),
            jnp.asarray(resid), 1e-6,
        )
        np.testing.assert_allclose(mean, resid, atol=1e-3)
        assert float(jnp.max(jnp.abs(pcov))) < 1e-2


class TestVariational:
    def test_running_std_matches_loop(self, rng):
        y = rng.standard_normal(40).astype(np.float32)
        f, rs = running_std_latent_init(jnp.asarray(y))
        # literal loop restatement [single_task_variational_gp.py:213-216]
        expected = np.array(
            [np.std(y[:i], ddof=1) if i >= 2 else np.nan for i in range(40)]
        )
        expected[:10] = expected[10]
        np.testing.assert_allclose(rs[10:], expected[10:], rtol=1e-3)
        np.testing.assert_allclose(
            f, np.log(np.clip(expected, 1e-4, None)), rtol=1e-3
        )

    def test_laplace_init_produces_valid_state(self, rng):
        n = 60
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        y = (0.02 * rng.standard_normal(n)).astype(np.float32)
        kuu = jnp.asarray(
            0.2 * np.minimum(x[:, None], x[None, :]).astype(np.float32)
        )
        state, mean_const = laplace_initialize(kuu, jnp.asarray(y))
        assert state.variational_mean.shape == (n,)
        assert state.chol_variational_covar.shape == (n, n)
        assert bool(jnp.all(jnp.isfinite(state.variational_mean)))
        assert bool(jnp.all(jnp.isfinite(state.chol_variational_covar)))
        assert np.isfinite(float(mean_const))
        # S/100 = L (L^T H^-1 L + I)^-1 L^T is PSD with positive diagonal
        diag = np.diagonal(np.asarray(state.chol_variational_covar))
        assert (diag > 0).all()

    def test_laplace_init_matches_reference_clamp_order(self, rng):
        """The reference clamps the exp inverse Hessian AFTER
        ``diag_embed`` (``single_task_variational_gp.py:221-225``), so
        the matrix inside ``L^T H^{-1} L`` is the dense
        ``diag(clamp(.)) + 1e-4 (11^T - I)``.  Pin ``S`` (root-product,
        root-choice invariant) against a float64 restatement and check
        the diag-only option measurably diverges."""
        n = 24
        x = (np.arange(n, dtype=np.float32) + 1) / 252
        y = (0.02 * rng.standard_normal(n)).astype(np.float32)
        kuu = jnp.asarray(
            0.2 * np.minimum(x[:, None], x[None, :]).astype(np.float32)
        )
        state, _ = laplace_initialize(kuu, jnp.asarray(y))
        root = np.asarray(state.chol_variational_covar, np.float64)
        s = root @ root.T  # = 100 * S

        from volt_tpu.gp.variational import running_std_latent_init

        f, _ = running_std_latent_init(jnp.asarray(y))
        f64 = np.asarray(f, np.float64)
        y64 = np.asarray(y, np.float64)
        diag = np.clip(0.5 * y64**-2.0 * np.exp(2.0 * f64), 1e-4, 1000.0)
        m = np.full((n, n), 1e-4)
        np.fill_diagonal(m, diag)
        ell = np.linalg.cholesky(np.asarray(kuu, np.float64))
        inner = ell.T @ m @ ell + np.eye(n)
        s_ref = ell @ np.linalg.inv(inner) @ ell.T * 100.0
        rel = np.max(np.abs(s - s_ref) / (np.abs(s_ref) + 1e-12))
        assert rel < 1e-5, rel

        state_d, _ = laplace_initialize(kuu, jnp.asarray(y),
                                        exp_hessian="diag")
        root_d = np.asarray(state_d.chol_variational_covar, np.float64)
        s_d = root_d @ root_d.T
        rel_d = np.max(np.abs(s - s_d) / (np.abs(s_d) + 1e-12))
        assert rel_d > 1e-4, rel_d

    def test_elbo_matches_manual(self, rng):
        n = 12
        a = rng.standard_normal((n, n))
        kuu = jnp.asarray((a @ a.T / n + np.eye(n)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        vm = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cv = jnp.asarray(
            np.tril(rng.standard_normal((n, n)) * 0.1 + np.eye(n)).astype(
                np.float32
            )
        )
        prior_mean = jnp.zeros(n)

        def ell(yy, mean, var):
            # Gaussian likelihood closed-form expected log prob, noise 1
            return -0.5 * (
                np.log(2 * np.pi) + (yy - mean) ** 2 + var
            )

        state = VariationalState(vm, cv)
        got = gp.elbo_at_inducing(state, prior_mean, kuu, y, ell)
        kl = mvn_kl(vm, jnp.tril(cv), prior_mean, psd_safe_cholesky(kuu))
        marg_var = jnp.sum(jnp.tril(cv) ** 2, -1)
        expected = jnp.mean(ell(y, vm, marg_var)) - kl / n
        assert float(got) == pytest.approx(float(expected), rel=1e-5)

    def test_variational_predict_at_inducing_recovers_q(self, rng):
        # At x == inducing points with prior mean 0, the unwhitened
        # predictive reduces to q itself.
        n = 10
        x = np.sort(rng.random(n)).astype(np.float32)
        kuu = jnp.asarray(
            (np.minimum(x[:, None], x[None, :]) + 1e-3 * np.eye(n)).astype(
                np.float32
            )
        )
        vm = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cv = jnp.asarray(
            np.tril(0.1 * rng.standard_normal((n, n)) + np.eye(n)).astype(
                np.float32
            )
        )
        state = VariationalState(vm, cv)
        zeros = jnp.zeros(n)
        mean, cov = gp.variational_predict(
            state, zeros, kuu, kuu, zeros, kxx=kuu
        )
        s = np.tril(np.asarray(cv))
        np.testing.assert_allclose(mean, vm, rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(cov, s @ s.T, rtol=5e-2, atol=5e-3)


class TestWhitenedStrategy:
    """Whitened and unwhitened strategies describe the same variational
    family: under m' = L^{-1}(m - mu), S' = L^{-1} S L^{-T} the ELBOs and
    predictives coincide."""

    def _setup(self, rng, n=12):
        x = np.sort(rng.random(n)).astype(np.float32)
        kuu = jnp.asarray(
            (np.minimum(x[:, None], x[None, :]) + 0.05 * np.eye(n)).astype(
                np.float32
            )
        )
        prior = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
        m = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cq = jnp.asarray(
            np.tril(0.1 * rng.standard_normal((n, n)) + np.eye(n) * 0.4
                    ).astype(np.float32)
        )
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        return x, kuu, prior, m, cq, y

    def test_elbo_equivalence(self, rng):
        from volt_tpu.gp.variational import elbo_at_inducing_whitened

        x, kuu, prior, m, cq, y = self._setup(rng)
        lk = np.linalg.cholesky(np.asarray(kuu, np.float64))

        def ell(yy, mean, var):
            return -0.5 * (np.log(2 * np.pi) + (yy - mean) ** 2 + var)

        un = gp.elbo_at_inducing(VariationalState(m, cq), prior, kuu, y, ell)
        # reparameterize into whitened coordinates
        m_w = jnp.asarray(
            np.linalg.solve(lk, np.asarray(m - prior, np.float64)),
            jnp.float32,
        )
        cq_w = jnp.asarray(
            np.linalg.solve(lk, np.asarray(jnp.tril(cq), np.float64)),
            jnp.float32,
        )
        wh = elbo_at_inducing_whitened(
            VariationalState(m_w, jnp.tril(cq_w)), prior, kuu, y, ell
        )
        assert float(wh) == pytest.approx(float(un), rel=2e-3)

    def test_predict_equivalence(self, rng):
        from volt_tpu.gp.variational import variational_predict_whitened

        x, kuu, prior, m, cq, y = self._setup(rng)
        n = x.shape[0]
        tx = jnp.asarray(
            np.sort(rng.random(5) + 1.0).astype(np.float32)
        )
        kux = jnp.asarray(
            np.minimum(np.asarray(x)[:, None], np.asarray(tx)[None, :])
        ).astype(jnp.float32)
        kxx = jnp.asarray(
            (np.minimum(np.asarray(tx)[:, None], np.asarray(tx)[None, :])
             + 0.05 * np.eye(5)).astype(np.float32)
        )
        prior_x = jnp.zeros(5)
        lk = np.linalg.cholesky(np.asarray(kuu, np.float64))
        mean_u, cov_u = gp.variational_predict(
            VariationalState(m, cq), prior, kuu, kux, prior_x, kxx=kxx
        )
        m_w = jnp.asarray(np.linalg.solve(lk, np.asarray(m - prior,
                                                         np.float64)),
                          jnp.float32)
        cq_w = jnp.asarray(
            np.linalg.solve(lk, np.asarray(jnp.tril(cq), np.float64)),
            jnp.float32,
        )
        mean_w, cov_w = variational_predict_whitened(
            VariationalState(m_w, cq_w), kuu, kux, prior_x, kxx=kxx
        )
        np.testing.assert_allclose(mean_w, mean_u, rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(cov_w, cov_u, rtol=2e-2, atol=2e-3)
