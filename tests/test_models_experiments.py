"""LSTM baseline, high-level Volt API, calibration, and experiment-driver
smoke/parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.calibration import calibration, crps, sample_percentiles
from volt_tpu.data import sabr_paths
from volt_tpu.models.lstm import make_windows, train_lstm
from volt_tpu.models.volt_api import Volt


class TestLSTM:
    def test_make_windows_padding(self):
        y = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        w, t = make_windows(y, 3)
        assert w.shape == (3, 3)
        np.testing.assert_allclose(w[0], [1.0, 1.0, 1.0])  # left-padded
        np.testing.assert_allclose(w[2], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(t, [2.0, 3.0, 4.0])

    def test_train_and_forecast(self):
        f, _ = sabr_paths(steps=200, seed=11)
        log_y = np.log(f)
        state = train_lstm(log_y, seq_len=5, hidden_size=16, num_layers=1,
                           epochs=20, batch_size=32)
        samples = state.forecast(jax.random.key(0), rollout_len=8, nsample=12)
        assert samples.shape == (12, 8)
        assert np.isfinite(np.asarray(samples)).all()
        # forecasts should stay near the series scale
        assert abs(float(samples.mean()) - log_y[-1]) < 1.0


class TestVoltAPI:
    def test_train_and_forecast(self):
        f, _ = sabr_paths(steps=100, seed=2019)
        dt = 1.0 / 252
        train_x = jnp.arange(100, dtype=jnp.float32) * dt
        model = Volt(train_x, jnp.log(jnp.asarray(f)), mean="ewma", k=20)
        model.Train(gpcv_iters=40, vol_mod_iters=40, data_mod_iters=20)
        test_x = jnp.arange(8, dtype=jnp.float32) * dt + train_x[-1] + dt
        samples = model.Forecast(test_x, nsample=16, mean_revert=True,
                                 theta=0.05)
        assert samples.shape == (16, 8)
        assert np.isfinite(np.asarray(samples)).all()

    def test_train_key_is_seed_controlling(self):
        """Train(key=...) must actually reach the randomness-consuming
        stages (the unbatched branch used to drop it for GPCV; the
        batched branch reused one key twice): same key => identical
        forecasts, different key => different forecasts."""
        f, _ = sabr_paths(steps=80, seed=3)
        dt = 1.0 / 252
        train_x = jnp.arange(80, dtype=jnp.float32) * dt
        test_x = jnp.arange(4, dtype=jnp.float32) * dt + train_x[-1] + dt

        def run(train_key, fc_key):
            m = Volt(train_x, jnp.log(jnp.asarray(f)), mean="ewma", k=20)
            m.Train(gpcv_iters=15, vol_mod_iters=15, data_mod_iters=10,
                    key=train_key)
            return np.asarray(m.Forecast(test_x, nsample=8, key=fc_key))

        a = run(jax.random.key(7), jax.random.key(1))
        b = run(jax.random.key(7), jax.random.key(1))
        c = run(jax.random.key(8), jax.random.key(2))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_supplied_vol_path_skips_gpcv(self):
        # reference Volt accepts vol_path (Volt.py:18-19) but Train
        # discards it; here a supplied path is used (fix by design —
        # volt_api.Volt.__init__ docstring).
        f, v = sabr_paths(steps=100, seed=2019)
        dt = 1.0 / 252
        train_x = jnp.arange(100, dtype=jnp.float32) * dt
        model = Volt(train_x, jnp.log(jnp.asarray(f)), mean="ewma", k=20,
                     vol_path=jnp.asarray(v[1:]))
        # gpcv_iters=0 would be invalid for a real fit; the supplied path
        # means the GPCV stage never runs at all
        model.Train(gpcv_iters=0, vol_mod_iters=40, data_mod_iters=20)
        test_x = jnp.arange(8, dtype=jnp.float32) * dt + train_x[-1] + dt
        samples = model.Forecast(test_x, nsample=8)
        assert samples.shape == (8, 8)
        assert np.isfinite(np.asarray(samples)).all()


class TestCalibration:
    def test_percentiles_uniform_for_self_samples(self, rng):
        samples = rng.standard_normal((4000, 5)).astype(np.float32)
        truth = np.zeros(5, np.float32)
        p = np.asarray(sample_percentiles(jnp.asarray(samples),
                                          jnp.asarray(truth)))
        np.testing.assert_allclose(p, 0.5, atol=0.03)

    def test_calibration_diagonal_for_uniform(self, rng):
        pcts = jnp.asarray(rng.random(20000).astype(np.float32))
        levels, frac = calibration(pcts)
        np.testing.assert_allclose(frac, levels, atol=0.02)

    def test_crps_zero_for_point_mass_on_truth(self):
        samples = jnp.ones((100, 3)) * 2.0
        truth = jnp.asarray([2.0, 2.0, 2.0])
        np.testing.assert_allclose(crps(samples, truth), 0.0, atol=1e-6)

    def test_crps_prefers_correct_forecast(self, rng):
        truth = jnp.zeros(4)
        good = jnp.asarray(rng.standard_normal((2000, 4)).astype(np.float32))
        bad = good + 3.0
        assert float(crps(good, truth).mean()) < float(crps(bad, truth).mean())


class TestExperimentDrivers:
    def test_generate_stock_predictions_batched(self, tmp_path):
        from volt_tpu.experiments import generate_stock_predictions

        f, _ = sabr_paths(steps=160, seed=1, F0=100.0)
        out = generate_stock_predictions(
            "TEST", f, forecast_horizon=5, train_iters=10, nsample=8,
            ntrain=80, mean="ewma", k=20, ntimes=3, save=True,
            outdir=str(tmp_path),
        )
        assert len(out) >= 3
        for s in out.values():
            assert s.shape == (8, 5)
            assert np.isfinite(s).all()
        saved = list((tmp_path / "TEST").glob("*.npy"))
        assert len(saved) == len(out)

    def test_generate_one_day_sweep(self, tmp_path):
        from volt_tpu.experiments import generate_one_day_predictions

        f, _ = sabr_paths(steps=81, seed=2, F0=50.0)
        out = generate_one_day_predictions(
            "TEST", f, "2022-01-01", forecast_horizon=4, train_iters=10,
            nsample=4, ntrain=81, outdir=str(tmp_path), ks=(25, 50),
        )
        assert len(out) == 6  # 3 means x 2 k values
        for s in out.values():
            assert s.shape == (4, 4)
        # the default grid is the reference's (GenerateMultiMeanPreds.py:183-190)
        import inspect
        sig = inspect.signature(generate_one_day_predictions)
        assert sig.parameters["ks"].default == (25, 50, 100, 200, 300, 400)

    def test_generate_basic_predictions(self, tmp_path):
        from volt_tpu.experiments import generate_basic_predictions

        f, _ = sabr_paths(steps=140, seed=3, F0=80.0)
        out = generate_basic_predictions(
            "TEST", f, "matern", mean_name="ewma", k=20, forecast_horizon=4,
            train_iters=10, nsample=6, ntrain=100, ntimes=2,
            outdir=str(tmp_path),
        )
        for s in out.values():
            assert s.shape == (6, 4)
            assert np.isfinite(s).all()

    def test_generate_gpcv_predictions(self, tmp_path):
        from volt_tpu.experiments import generate_gpcv_predictions

        f, _ = sabr_paths(steps=120, seed=4, F0=60.0)
        out = generate_gpcv_predictions(
            "TEST", f, forecast_horizon=4, ntimes=2, train_iters=10,
            nsample=6, ntrain=100, outdir=str(tmp_path),
        )
        for s in out.values():
            assert s.shape == (6, 4)
            assert np.isfinite(s).all()

    def test_wind_volt_window(self):
        from volt_tpu.experiments.gp_generator import wind_volt_window

        rng = np.random.default_rng(0)
        ntrain, h = 80, 4
        y = np.abs(rng.standard_normal(ntrain)).astype(np.float32) + 1.0
        train_x = jnp.arange(ntrain - 1, dtype=jnp.float32) / 365
        test_x = jnp.arange(ntrain, ntrain + h, dtype=jnp.float32) / 365
        s = wind_volt_window(train_x, jnp.asarray(y), test_x, "constant",
                             nsample=8)
        assert s.shape == (8, h)
        assert np.isfinite(np.asarray(s)).all()

    def test_basic_wind_rollouts(self):
        from volt_tpu.experiments import basic_wind_rollouts

        rng = np.random.default_rng(1)
        ntrain, h = 60, 4
        y = np.abs(rng.standard_normal(ntrain)).astype(np.float32) + 1.0
        train_x = jnp.arange(ntrain, dtype=jnp.float32) / 365
        test_x = jnp.arange(ntrain, ntrain + h, dtype=jnp.float32) / 365
        s = basic_wind_rollouts(train_x, jnp.asarray(y), test_x, "rbf",
                                mean_name="constant", train_iters=10,
                                nsample=8)
        assert s.shape == (8, h)
