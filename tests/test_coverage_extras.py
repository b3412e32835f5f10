"""Coverage for secondary paths: FBM pipeline, sample/mean prediction,
CSV price loading, calibration curves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.data import sabr_paths


N, H = 80, 5
DT = 1.0 / 252


@pytest.fixture(scope="module")
def series():
    f, _ = sabr_paths(steps=N + 1, seed=21)
    train_x = jnp.arange(N, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    return train_x, jnp.asarray(f), test_x


class TestFBMPipeline:
    def test_fbm_end_to_end(self, series):
        from volt_tpu.train import learn_gpcv, train_vol_model, \
            train_volt_magpie
        from volt_tpu.rollouts import rollouts

        train_x, prices, test_x = series
        vol = learn_gpcv(train_x, prices, train_iters=20, kernel="fbm")
        assert bool(jnp.all(vol > 0))
        vol_state = train_vol_model(train_x, vol, train_iters=20,
                                    kernel="fbm")
        model = train_volt_magpie(train_x, prices[1:], vol_state, vol,
                                  train_iters=10, k=20)
        s = rollouts(jax.random.key(0), model, train_x, prices, test_x,
                     nsample=8)
        assert s.shape == (8, H)
        assert bool(jnp.all(jnp.isfinite(s)))


class TestPredictionVariants:
    @pytest.fixture(scope="class")
    def model(self, series):
        from volt_tpu.train import learn_gpcv, train_vol_model, \
            train_data_model

        train_x, prices, _ = series
        vol = learn_gpcv(train_x, prices, train_iters=20)
        vol_state = train_vol_model(train_x, vol, train_iters=20)
        return train_data_model(train_x, prices[1:], vol_state, vol,
                                train_iters=10)

    def test_sample_prediction(self, model, series):
        from volt_tpu.rollouts import sample_prediction

        _, _, test_x = series
        pred, vol = sample_prediction(jax.random.key(0), model, test_x,
                                      n_sample=6, return_vol=True)
        assert pred.shape == (6, H)
        assert vol.shape == (H,)
        assert bool(jnp.all(vol > 0))

    def test_mean_prediction(self, model, series):
        from volt_tpu.rollouts import mean_prediction

        _, _, test_x = series
        pred = mean_prediction(jax.random.key(0), model, test_x, n_sample=4)
        assert pred.shape == (4, H)

    def test_update_vol_path(self, model):
        updated = model.update_vol_path(0.5 * jnp.exp(model.log_vol_path))
        np.testing.assert_allclose(
            np.asarray(updated.log_vol_path),
            np.asarray(model.log_vol_path) + np.log(0.5),
            rtol=1e-5,
        )

    def test_vol_mll(self, model):
        assert np.isfinite(float(model.vol_mll()))


class TestCsvLoading:
    def test_load_prices_from_csv(self, tmp_path):
        import pandas as pd
        from volt_tpu.experiments.forecast_generator import load_prices

        df = pd.DataFrame({
            "Date": pd.date_range("2021-01-01", periods=50).astype(str),
            "Close": np.linspace(90, 110, 50),
        })
        df.to_csv(tmp_path / "FOO.csv", index=False)
        prices, dates = load_prices("FOO", 30, csv_dir=str(tmp_path))
        assert prices.shape == (30,)
        assert len(dates) == 30
        assert prices[-1] == pytest.approx(110.0, rel=1e-5)


class TestCalibrationCurve:
    def test_multi_window_aggregation(self, rng):
        from volt_tpu.calibration import calibration_curve

        samples = [jnp.asarray(rng.standard_normal((500, 4)).astype(np.float32))
                   for _ in range(5)]
        truths = [jnp.asarray(rng.standard_normal(4).astype(np.float32))
                  for _ in range(5)]
        levels, frac = calibration_curve(samples, truths)
        assert levels.shape == frac.shape
        assert bool(jnp.all((frac >= 0) & (frac <= 1)))


class TestCvParameterization:
    def test_cv_gpcv_trains(self, series):
        # The copula-process ("cv") likelihood: its a/b/c parameters ride
        # in the same ELBO and train alongside the variational state.
        from volt_tpu.models.gpcv import GPCVModel
        from volt_tpu.train import scaled_returns, _fit_gpcv

        train_x, prices, _ = series
        yy = scaled_returns(train_x, prices)
        module = GPCVModel(param="cv")
        params = module.init(train_x, yy, key=jax.random.key(0))
        params2, losses = _fit_gpcv(module, params, train_x, yy, 40, 0.01)
        assert float(losses[-1]) < float(losses[0])
        # likelihood params actually moved
        moved = jnp.max(jnp.abs(params2["likelihood"]["raw_a"]
                                - params["likelihood"]["raw_a"]))
        assert float(moved) > 0
        scale = module.predicted_scale(params2, train_x)
        assert bool(jnp.all(scale > 0))


class TestReferenceAliasSurface:
    def test_every_reference_name_resolves(self):
        # MIGRATION.md contract: each name the reference exports
        # (voltron/__init__.py:1-12, voltron/models/__init__.py:1-6)
        # resolves in volt_tpu under the same spelling.
        import volt_tpu
        from volt_tpu import models

        for name in ["BMKernel", "VolatilityKernel", "BMGP", "VoltronGP",
                     "MultitaskBMGP", "LearnGPCV", "TrainVolModel",
                     "TrainDataModel", "TrainVoltMagpieModel",
                     "TrainBasicModel", "Rollouts", "GeneratePrediction",
                     "Pricer", "ECDF", "Volt"]:
            assert hasattr(volt_tpu, name), name
        for name in ["BMGP", "MultitaskBMGP", "VoltronGP",
                     "MultitaskVariationalGP", "SingleTaskVariationalGP",
                     "MaternGP", "SMGP", "VoltMagpie", "LSTM"]:
            assert hasattr(models, name), name
        assert models.VoltronGP is models.VoltGP
        assert volt_tpu.LearnGPCV is volt_tpu.learn_gpcv
        assert volt_tpu.GeneratePrediction is volt_tpu.generate_prediction


class TestFBMIncrementDomainParity:
    """The FBM paths factorize in increment domain (ops/fbm.py); these pin
    that the *products* — MLL and posterior — are unchanged vs the dense
    float64 value-domain oracles they replaced."""

    def _grid_model(self, h=0.7, n=60):
        from volt_tpu.models.bmgp import BMGP

        module = BMGP(kernel="fbm")
        params = module.init()
        params["kernel"]["raw_vol"] = jnp.asarray(
            [float(np.log(h / (1 - h)))], jnp.float32
        )  # Interval(0,1) sigmoid -> vol = h
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        rng = np.random.default_rng(7)
        y = jnp.asarray(
            np.cumsum(0.02 * rng.standard_normal(n)).astype(np.float32)
        )
        return module, params, x, y

    def test_mll_matches_dense_oracle(self):
        module, params, x, y = self._grid_model()
        got = float(module.mll(params, x, y))
        # float64 dense oracle: log N(y; mean, K + s I) / n
        h = float(module.kernel.vol(params["kernel"])[0])
        from reference_oracles import fbm_gram

        xs = np.asarray(x, np.float64)
        k = fbm_gram(xs, two_h=2 * h)
        noise = float(module.likelihood.noise(params["likelihood"])[0])
        mean = -0.5 * h**2 * xs
        import scipy.stats

        expected = scipy.stats.multivariate_normal.logpdf(
            np.asarray(y, np.float64), mean, k + noise * np.eye(len(xs))
        ) / len(xs)
        np.testing.assert_allclose(got, expected, rtol=2e-4)

    def test_posterior_matches_dense_oracle(self):
        module, params, x, y = self._grid_model(h=0.55, n=50)
        test_x = x[-1] + jnp.arange(1, 6, dtype=jnp.float32) / 252.0
        mean, cov = module.posterior(params, x, y, test_x)
        h = float(module.kernel.vol(params["kernel"])[0])
        xs = np.asarray(x, np.float64)
        ts = np.asarray(test_x, np.float64)
        xa = np.concatenate([xs, ts])

        from reference_oracles import fbm_gram

        def gram(a, b):
            return fbm_gram(a, b, two_h=2 * h)

        noise = float(module.likelihood.noise(params["likelihood"])[0])
        k_tr = gram(xs, xs) + noise * np.eye(len(xs))
        k_cr = gram(xs, ts)
        resid = np.asarray(y, np.float64) + 0.5 * h**2 * xs
        sol = np.linalg.solve(k_tr, np.column_stack([resid[:, None], k_cr]))
        m_exp = k_cr.T @ sol[:, 0] - 0.5 * h**2 * ts
        c_exp = gram(ts, ts) - k_cr.T @ sol[:, 1:]
        np.testing.assert_allclose(np.asarray(mean), m_exp, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cov), c_exp, atol=2e-4)

    def test_gpcv_elbo_finite_at_adversarial_hurst(self):
        # H -> 0.9 at n in the hundreds is where the value-domain float32
        # factorization NaN'd whole lanes mid-fit (BENCH_SCALING.md round-3
        # FBM table); the increment-domain ELBO must stay finite AND keep a
        # finite gradient through the Hurst parameter.
        from volt_tpu.models.gpcv import GPCVModel

        n = 399
        x = jnp.arange(1, n + 1, dtype=jnp.float32) / 252.0
        rng = np.random.default_rng(3)
        y = jnp.asarray((0.02 * rng.standard_normal(n)).astype(np.float32))
        module = GPCVModel(kernel="fbm")
        params = module.init(x, y)
        params["kernel"]["raw_vol"] = jnp.asarray(
            [float(np.log(0.9 / 0.1))], jnp.float32
        )
        val, grads = jax.value_and_grad(
            lambda p: module.elbo(p, x, y)
        )(params)
        assert bool(jnp.isfinite(val))
        leaves = jax.tree.leaves(jax.tree.map(
            lambda g: jnp.all(jnp.isfinite(g)), grads
        ))
        assert all(bool(v) for v in leaves)
