"""Analytic Brownian-kernel algebra vs dense factorizations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.models.bmgp import BMGP
from volt_tpu.models.gpcv import GPCVModel
from volt_tpu.ops import mvn_kl, psd_safe_cholesky
from volt_tpu.ops.brownian import (
    bm_kl_against_prior,
    bm_logdet,
    bm_solve_lower,
    bm_solve_upper,
)
from volt_tpu.gp.variational import VariationalState, elbo_at_inducing


@pytest.fixture()
def grid(rng):
    n = 40
    return jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)


class TestBrownianOps:
    def test_solve_lower_matches_dense(self, rng, grid):
        n = grid.shape[0]
        m = np.minimum(np.asarray(grid)[:, None], np.asarray(grid)[None, :])
        chol = np.linalg.cholesky(m.astype(np.float64))
        b = rng.standard_normal(n).astype(np.float32)
        got = bm_solve_lower(grid, jnp.asarray(b))
        expected = np.linalg.solve(chol, b)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_solve_upper_matches_dense(self, rng, grid):
        n = grid.shape[0]
        m = np.minimum(np.asarray(grid)[:, None], np.asarray(grid)[None, :])
        chol = np.linalg.cholesky(m.astype(np.float64))
        b = rng.standard_normal(n).astype(np.float32)
        got = bm_solve_upper(grid, jnp.asarray(b))
        expected = np.linalg.solve(chol.T, b)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_logdet(self, grid):
        m = np.minimum(np.asarray(grid)[:, None], np.asarray(grid)[None, :])
        expected = np.linalg.slogdet(m.astype(np.float64))[1]
        assert float(bm_logdet(grid)) == pytest.approx(expected, rel=1e-4)

    def test_kl_matches_dense(self, rng, grid):
        n = grid.shape[0]
        vol = jnp.asarray([0.23])
        mq = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        mp = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
        cq = jnp.asarray(
            np.tril(0.05 * rng.standard_normal((n, n)) + np.eye(n) * 0.3
                    ).astype(np.float32)
        )
        kuu = 0.23 * jnp.minimum(grid[:, None], grid[None, :])
        expected = mvn_kl(mq, cq, mp, psd_safe_cholesky(kuu))
        got = bm_kl_against_prior(grid, vol, mq, cq, mp)
        assert float(got) == pytest.approx(float(expected), rel=1e-3)


class TestFastTrainingPaths:
    def test_gpcv_elbo_bm_matches_dense(self, rng, grid):
        n = grid.shape[0]
        y = jnp.asarray((0.02 * rng.standard_normal(n)).astype(np.float32))
        module = GPCVModel()
        params = module.init(grid, y)
        fast = float(module.elbo(params, grid, y))
        # dense oracle through the generic path
        kuu = module.kernel(params["kernel"], grid)
        state = VariationalState(params["variational_mean"],
                                 params["chol_variational_covar"])
        prior = module.mean(params["mean"], grid)

        def ell(yy, mean, var):
            return module.likelihood.expected_log_prob({}, yy, mean, var)

        dense = float(elbo_at_inducing(state, prior, kuu, y, ell))
        assert fast == pytest.approx(dense, rel=1e-3)

    def test_gpcv_elbo_grads_match(self, rng, grid):
        n = grid.shape[0]
        y = jnp.asarray((0.02 * rng.standard_normal(n)).astype(np.float32))
        module = GPCVModel()
        params = module.init(grid, y)

        def dense_loss(p):
            kuu = module.kernel(p["kernel"], grid)
            state = VariationalState(p["variational_mean"],
                                     p["chol_variational_covar"])
            prior = module.mean(p["mean"], grid)

            def ell(yy, mean, var):
                return module.likelihood.expected_log_prob({}, yy, mean, var)

            return -elbo_at_inducing(state, prior, kuu, y, ell)

        g_fast = jax.grad(lambda p: -module.elbo(p, grid, y))(params)
        g_dense = jax.grad(dense_loss)(params)
        np.testing.assert_allclose(
            g_fast["kernel"]["raw_vol"], g_dense["kernel"]["raw_vol"],
            rtol=2e-2, atol=1e-4,
        )
        np.testing.assert_allclose(
            g_fast["variational_mean"], g_dense["variational_mean"],
            rtol=2e-2, atol=2e-3,
        )

    def test_bmgp_mll_fast_matches_dense(self, rng, grid):
        n = grid.shape[0]
        y = jnp.asarray(np.log(0.2 + 0.05 * rng.random(n)).astype(np.float32))
        module = BMGP()
        params = module.init()
        cache = module.grid_cache(grid)
        fast = float(module.mll_fast(params, grid, y, cache))
        dense = float(module.mll(params, grid, y))
        assert fast == pytest.approx(dense, rel=1e-4)

    def test_bmgp_mll_fast_grads_match(self, rng, grid):
        n = grid.shape[0]
        y = jnp.asarray(np.log(0.2 + 0.05 * rng.random(n)).astype(np.float32))
        module = BMGP()
        params = module.init()
        cache = module.grid_cache(grid)
        g_fast = jax.grad(
            lambda p: -module.mll_fast(p, grid, y, cache)
        )(params)
        g_dense = jax.grad(lambda p: -module.mll(p, grid, y))(params)
        for path in (("kernel", "raw_vol"), ("likelihood", "raw_noise")):
            a = g_fast[path[0]][path[1]]
            b = g_dense[path[0]][path[1]]
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


class TestBMGPKalman:
    def test_mll_kalman_matches_dense(self, rng, grid):
        y = jnp.asarray(np.log(0.2 + 0.05 * rng.random(40)).astype(np.float32))
        module = BMGP()
        params = module.init()
        kf = float(module.mll_kalman(params, grid, y))
        dense = float(module.mll(params, grid, y))
        assert kf == pytest.approx(dense, rel=1e-4)

    def test_mll_kalman_grads_match(self, rng, grid):
        y = jnp.asarray(np.log(0.2 + 0.05 * rng.random(40)).astype(np.float32))
        module = BMGP()
        params = module.init()
        gk = jax.grad(lambda p: -module.mll_kalman(p, grid, y))(params)
        gd = jax.grad(lambda p: -module.mll(p, grid, y))(params)
        for path in (("kernel", "raw_vol"), ("likelihood", "raw_noise")):
            np.testing.assert_allclose(gk[path[0]][path[1]],
                                       gd[path[0]][path[1]],
                                       rtol=5e-3, atol=1e-5)

    def test_mll_kalman_zero_first_gridpoint(self, rng):
        # stock grids start at x0 = 0; the filter must handle delta0 = 0.
        n = 30
        x = jnp.arange(n, dtype=jnp.float32) / 252
        y = jnp.asarray(np.log(0.2 + 0.05 * rng.random(n)).astype(np.float32))
        module = BMGP()
        params = module.init()
        kf = float(module.mll_kalman(params, x, y))
        dense = float(module.mll(params, x, y))
        assert np.isfinite(kf)
        assert kf == pytest.approx(dense, rel=1e-3)


class TestSpectralVolMLL:
    """Closed-form min(x) eigensystem vs the Kalman scan and dense MLL."""

    @pytest.mark.parametrize("n,x0", [(50, 0.0), (50, 1.0 / 252),
                                      (400, 0.0), (400, 1.0 / 252)])
    def test_matches_kalman_and_dense(self, rng, n, x0):
        from volt_tpu.models.bmgp import BMGP

        dt = 1.0 / 252
        x = jnp.asarray((x0 + np.arange(n) * dt).astype(np.float32))
        y = jnp.asarray(
            (np.log(0.2) + 0.1 * rng.standard_normal(n)).astype(np.float32)
        )
        bm = BMGP()
        params = jax.tree.map(lambda a: a + 0.3, bm.init())
        m_s = float(bm.mll_spectral(params, bm.spectral_cache(x, y)))
        m_k = float(bm.mll_kalman(params, x, y))
        m_d = float(bm.mll(params, x, y))
        assert m_s == pytest.approx(m_k, rel=2e-5)
        assert m_s == pytest.approx(m_d, rel=2e-4)
        g_s = jax.grad(
            lambda p: bm.mll_spectral(p, bm.spectral_cache(x, y))
        )(params)
        g_k = jax.grad(lambda p: bm.mll_kalman(p, x, y))(params)
        for path in (("kernel", "raw_vol"), ("likelihood", "raw_noise")):
            a = float(g_s[path[0]][path[1]][0])
            b = float(g_k[path[0]][path[1]][0])
            assert a == pytest.approx(b, rel=2e-3, abs=1e-5), path

    def test_pipeline_rejects_irregular_grid(self):
        from volt_tpu.parallel import PipelineConfig, fit_forecast_batch

        rng = np.random.default_rng(0)
        x = jnp.asarray(np.cumsum(0.001 + 0.004 * rng.random(40))
                        .astype(np.float32))
        ys = jnp.asarray(
            (50.0 + rng.random((2, 41))).astype(np.float32)
        )
        tx = x[-1] + jnp.arange(1, 4, dtype=jnp.float32) / 252
        cfg = PipelineConfig(gpcv_iters=5, vol_iters=5, data_iters=5,
                             k=10, nsample=4)
        with pytest.raises(ValueError, match="vol_mll"):
            fit_forecast_batch(jax.random.key(0), x, ys, tx, cfg)
        # the kalman path accepts any grid
        s, _ = fit_forecast_batch(jax.random.key(0), x, ys, tx,
                                  PipelineConfig(gpcv_iters=5, vol_iters=5,
                                                 data_iters=5, k=10,
                                                 nsample=4,
                                                 vol_mll="kalman"))
        assert np.isfinite(np.asarray(s)).all()

    def test_train_vol_model_auto_selects(self, rng):
        # equispaced and irregular grids both produce a usable fit via
        # train_vol_model's host-side dispatch
        from volt_tpu.train import train_vol_model

        n = 60
        vol = jnp.asarray((0.2 + 0.05 * rng.random(n)).astype(np.float32))
        for x in (
            jnp.arange(n, dtype=jnp.float32) / 252,
            jnp.asarray(np.cumsum(0.002 + 0.004 * rng.random(n))
                        .astype(np.float32)),
        ):
            st = train_vol_model(x, vol, train_iters=30)
            mean, cov = st.posterior(x[-1:] + 1.0 / 252)
            assert np.isfinite(float(mean[0])) and float(cov[0, 0]) > 0


class TestForecastClosedForm:
    """The filtered-state forecast posterior vs the dense joint posterior."""

    @pytest.mark.parametrize("x0", [0.0, 1.0 / 252])
    def test_posterior_forecast_matches_dense(self, rng, x0):
        from volt_tpu.models.bmgp import BMGP

        n, h = 60, 8
        dt = 1.0 / 252
        x = jnp.asarray((x0 + np.arange(n) * dt).astype(np.float32))
        tx = x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)
        y = jnp.asarray(
            (np.log(0.2) + 0.1 * rng.standard_normal(n)).astype(np.float32)
        )
        bm = BMGP()
        params = jax.tree.map(lambda a: a + 0.3, bm.init())
        m_fast, c_fast = bm.posterior_forecast(params, x, y, tx)
        m_dense, c_dense = bm.posterior(params, x, y, tx)
        np.testing.assert_allclose(m_fast, m_dense, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(c_fast, c_dense, rtol=2e-3, atol=1e-6)

    def test_sample_forecast_moments(self, rng):
        # Sampler moments must match the closed-form posterior.
        from volt_tpu.models.bmgp import BMGP

        n, h, s = 50, 5, 30_000
        dt = 1.0 / 252
        x = jnp.asarray(((np.arange(n) + 1.0) * dt).astype(np.float32))
        tx = x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)
        y = jnp.asarray(
            (np.log(0.25) + 0.05 * rng.standard_normal(n)).astype(np.float32)
        )
        bm = BMGP()
        params = bm.init()
        draws = np.asarray(
            bm.sample_forecast(jax.random.key(0), params, x, y, tx, (s,))
        )
        mean, cov = bm.posterior_forecast(params, x, y, tx)
        np.testing.assert_allclose(draws.mean(0), np.asarray(mean),
                                   atol=4 * float(jnp.sqrt(cov[-1, -1])) /
                                   np.sqrt(s))
        emp_cov = np.cov(draws.T)
        np.testing.assert_allclose(emp_cov, np.asarray(cov), rtol=0.06,
                                   atol=2e-6)
