"""Correlated multi-asset Volt: multitask training + joint rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.data import sabr_paths
from volt_tpu.rollouts import rollouts_multitask
from volt_tpu.train import learn_gpcv, train_volt_multitask

N, H, T = 70, 6, 3
DT = 1.0 / 252


@pytest.fixture(scope="module")
def fitted_mt():
    f, _ = sabr_paths(steps=N + 1, seed=9, n_paths=T)
    train_x = jnp.arange(N, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    vols = jnp.stack([
        learn_gpcv(train_x, jnp.asarray(f[t]), train_iters=40)
        for t in range(T)
    ])
    volt_state, mt_state = train_volt_multitask(
        train_x, jnp.asarray(f[:, 1:]), vols, train_iters=30, vol_iters=40,
        k=15, mean_func="ewma",
    )
    return f, train_x, test_x, volt_state, mt_state


class TestMultitaskVolt:
    def test_state_shapes(self, fitted_mt):
        f, train_x, test_x, volt_state, mt_state = fitted_mt
        assert volt_state.train_y.shape == (T, N)
        assert mt_state.train_y.shape == (N, T)

    def test_vol_mll_matches_dense_oracle(self, fitted_mt):
        # The Kronecker-structured MLL of the *fitted* state, pinned to a
        # dense float64 scipy logpdf over the materialized NT x NT
        # covariance built from the module's own kernel matrices.
        import scipy.stats

        _, train_x, _, _, mt_state = fitted_mt
        module, params = mt_state.module, mt_state.params
        mll = module.mll(params, train_x, mt_state.train_y)

        kd = np.asarray(module.data_kernel(params["data_kernel"], train_x),
                        np.float64)
        kt = np.asarray(module.task_covar(params), np.float64)
        noise = float(module.likelihood.noise(params["likelihood"])[..., 0])
        mean = np.asarray(module.mean(params, train_x), np.float64)
        y = np.asarray(mt_state.train_y, np.float64)
        dense = np.kron(kd, kt) + noise * np.eye(N * T)
        expected = scipy.stats.multivariate_normal.logpdf(
            y.reshape(-1), mean.reshape(-1), dense
        ) / (N * T)
        assert float(mll) == pytest.approx(expected, rel=1e-4)

    def test_joint_rollouts(self, fitted_mt):
        f, train_x, test_x, volt_state, mt_state = fitted_mt
        samples = rollouts_multitask(
            jax.random.key(0), volt_state, mt_state, jnp.asarray(f),
            test_x, nsample=24, theta=0.05,
        )
        assert samples.shape == (T, 24, H)
        assert np.isfinite(np.asarray(samples)).all()
        # each asset's forecast continues from its own last price
        for t in range(T):
            first = np.asarray(samples[t, :, 0]).mean()
            assert abs(first - np.log(f[t, -1])) < 0.2

    def test_vol_forecasts_correlated(self, fitted_mt):
        # A strongly-coupled task covariance must produce strongly
        # correlated cross-asset vol forecasts; a decoupled one must not.
        _, train_x, test_x, _, mt_state = fitted_mt

        def corr_with_task_covar(covar_factor, raw_var):
            params = {
                **mt_state.params,
                "task_kernel": {
                    "covar_factor": jnp.asarray(covar_factor, jnp.float32),
                    "raw_var": jnp.asarray(raw_var, jnp.float32),
                },
            }
            state = mt_state.replace(params=params)
            draws = state.sample(jax.random.key(1), test_x, (4000,))
            a = np.asarray(draws[..., -1, 0])
            b = np.asarray(draws[..., -1, 1])
            return np.corrcoef(a, b)[0, 1]

        # B = 4*ones + softplus(-6)*I: cross-task correlation ~ 0.999
        coupled = corr_with_task_covar(2.0 * np.ones((T, 1)),
                                       -6.0 * np.ones(T))
        assert coupled > 0.9, coupled
        # B ~ diag: samples decorrelate (the coupling is causal, not an
        # artifact of shared randomness)
        decoupled = corr_with_task_covar(np.zeros((T, 1)), np.zeros(T))
        assert abs(decoupled) < 0.2, decoupled
        # and the fitted state itself stays finite
        draws = mt_state.sample(jax.random.key(1), test_x, (400,))
        assert np.isfinite(np.asarray(draws)).all()


class TestMultitaskWindDriver:
    def test_run_multitask_wind(self, tmp_path):
        from volt_tpu.experiments import run_multitask_wind

        rng = np.random.default_rng(0)
        data = [np.abs(rng.standard_normal(80)).astype(np.float32) + 0.5
                for _ in range(3)]
        names = {0: "a", 1: "b", 2: "c"}
        out = run_multitask_wind(names, data, ntrain=60, forecast_horizon=5,
                                 nsample=8, gpcv_iters=10, vol_iters=15,
                                 k=20, out_path=str(tmp_path / "mt.p"))
        assert out["x_paths"].shape == (3, 8, 5)
        assert np.isfinite(out["x_paths"]).all()
        assert out["names_list"] == ["a", "b", "c"]
        import pickle
        loaded = pickle.load(open(tmp_path / "mt.p", "rb"))
        assert loaded["x_paths"].shape == (3, 8, 5)

    def test_station_filters(self):
        """Dead stations (all -99 sentinel) and, under conus_only,
        stations west of -128 longitude must be dropped BEFORE the joint
        fit — the dead-station test runs after the -99 -> 0 replacement
        (an all-missing station has mean -99 != 0 on raw data and would
        otherwise slip through as a constant series coupled into every
        station's Kronecker fit)."""
        from volt_tpu.experiments import run_multitask_wind

        rng = np.random.default_rng(1)
        good = [np.abs(rng.standard_normal(80)).astype(np.float32) + 0.5
                for _ in range(2)]
        dead = np.full(80, -99.0, np.float32)
        alaska = np.abs(rng.standard_normal(80)).astype(np.float32) + 0.5
        data = [good[0], dead, good[1], alaska]
        names = {0: "ok1", 1: "dead", 2: "ok2", 3: "AK"}
        lonlat = [(-100.0, 40.0), (-101.0, 41.0), (-102.0, 42.0),
                  (-150.0, 61.0)]
        out = run_multitask_wind(
            names, data, ntrain=60, forecast_horizon=4, nsample=4,
            gpcv_iters=5, vol_iters=5, k=20, lonlat=lonlat,
            conus_only=True,
        )
        assert out["names_list"] == ["ok1", "ok2"]
        assert out["x_paths"].shape == (2, 4, 4)
        assert np.isfinite(out["x_paths"]).all()


class TestMultitaskGPCV:
    def test_learn_gpcv_multitask(self):
        from volt_tpu.train import learn_gpcv_multitask
        from volt_tpu.data import sabr_paths

        f, v = sabr_paths(steps=61, seed=3, n_paths=3)
        dt = 1.0 / 252
        train_x = jnp.arange(60, dtype=jnp.float32) * dt
        scales = learn_gpcv_multitask(train_x, jnp.asarray(f),
                                      train_iters=40)
        assert scales.shape == (3, 60)
        assert np.isfinite(np.asarray(scales)).all()
        assert (np.asarray(scales) > 0).all()


class TestCorrvolUniverse:
    def test_shared_gust_factor_is_vol_only(self):
        """The multitask-evaluation universe's defining property
        (tools/eval_multitask.py): cross-station structure lives in
        volatility ONLY — smoothed squared log-returns are strongly
        correlated across stations (one shared log-OU gust factor)
        while the raw returns stay uncorrelated (independent price
        innovations)."""
        from volt_tpu.data import corrvol_windows

        rng = np.random.default_rng(0)
        p = corrvol_windows(rng, 4, 6, 600, 0)
        assert p.shape == (4, 6, 600) and p.dtype == np.float32
        r = np.diff(np.log(p), axis=-1)  # (W, T, n-1)

        def mean_pairwise_corr(a):  # a (T, n)
            c = np.corrcoef(a)
            iu = np.triu_indices_from(c, k=1)
            return float(c[iu].mean())

        k = 51  # smooth z^2 noise out of the vol proxy
        smooth = np.stack([
            np.convolve(np.log(r[wi, ti] ** 2 + 1e-12), np.ones(k) / k,
                        mode="valid")
            for wi in range(4) for ti in range(6)
        ]).reshape(4, 6, -1)
        vol_corr = np.mean([mean_pairwise_corr(smooth[wi])
                            for wi in range(4)])
        ret_corr = np.mean([mean_pairwise_corr(r[wi]) for wi in range(4)])
        assert vol_corr > 0.4, vol_corr
        assert abs(ret_corr) < 0.15, ret_corr
