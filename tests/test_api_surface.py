"""Direct tests for public surfaces only exercised indirectly elsewhere:
reference-parity CLI parser defaults, shipped ticker universes, the
LSTMModel convenience wrapper, the multitask likelihood, the options
pandas date helpers, pipeline shardings, and the small ops helpers the
larger numerics are assembled from.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# ---------------------------------------------------------------------------
# CLI parsers (reference flag parity: ForecastGenerator.py:46-112,
# LSTMGenerator.py:70-133, weather/GPGenerator.py:124-177)
# ---------------------------------------------------------------------------


class TestParserDefaults:
    def test_forecast_generator_defaults(self):
        from volt_tpu.experiments.forecast_generator import build_parser

        a = build_parser().parse_args([])
        assert (a.ntrain, a.ntimes, a.forecast_horizon) == (400, 25, 100)
        assert (a.kernel, a.mean) == ("volt", "ewma")
        assert (a.nsample, a.train_iters, a.k) == (1000, 300, 100)
        assert a.ticker_fname == "test_tickers"

    def test_lstm_generator_defaults(self):
        # reference LSTMGenerator.py:72-126 defaults: ntimes=25,
        # horizon=20, seq_length=25, ntrain=400, epochs=200
        from volt_tpu.experiments.lstm_generator import build_parser

        a = build_parser().parse_args([])
        assert (a.ntrain, a.ntimes, a.forecast_horizon) == (400, 25, 20)
        assert a.seq_length == 25
        assert a.train_epochs == 200

    def test_gp_generator_defaults(self):
        from volt_tpu.experiments.gp_generator import build_parser

        a = build_parser().parse_args([])
        assert a.stn_idx == 0
        assert a.mean == "constant"
        assert a.forecast_horizon == 100

    def test_parsers_accept_overrides(self):
        from volt_tpu.experiments.forecast_generator import build_parser

        a = build_parser().parse_args(["--kernel", "matern", "--k", "25"])
        assert a.kernel == "matern" and a.k == 25


# ---------------------------------------------------------------------------
# Shipped ticker universes (reference voltron/data/*.txt)
# ---------------------------------------------------------------------------


class TestTickerUniverses:
    # entry counts match the reference files exactly (their last lines
    # are newline-unterminated, so `wc -l` under-reports nasdaq100 and
    # test_tickers by one)
    @pytest.mark.parametrize("fname,count", [
        ("tickers.txt", 505), ("nasdaq100.txt", 108),
        ("test_tickers.txt", 10),
    ])
    def test_universe_sizes(self, fname, count):
        from volt_tpu.data import make_ticker_list

        tickers = make_ticker_list(fname)
        assert len(tickers) == count
        assert all(t == t.strip() and t for t in tickers)

    def test_ticker_file_path_resolves(self):
        import os

        from volt_tpu.data.tickers import ticker_file_path

        assert os.path.exists(ticker_file_path("example_tickers.txt"))


# ---------------------------------------------------------------------------
# LSTMModel convenience wrapper (reference LSTM.py Train/Forecast surface)
# ---------------------------------------------------------------------------


class TestLSTMModel:
    def test_train_then_forecast(self):
        from volt_tpu.models.lstm import LSTMModel

        rng = np.random.default_rng(0)
        y = np.log(50 * np.exp(np.cumsum(0.01 * rng.standard_normal(48))))
        x = np.arange(48, dtype=np.float32)
        m = LSTMModel(x, y, seq_len=5, hidden_size=8, num_layers=1)
        m.Train(epochs=2, key=jax.random.key(0))
        s = m.Forecast(np.arange(4, dtype=np.float32), nsample=3,
                       key=jax.random.key(1))
        assert s.shape == (3, 4) and bool(jnp.isfinite(s).all())

    def test_forecast_before_train_raises(self):
        from volt_tpu.models.lstm import LSTMModel

        m = LSTMModel(np.arange(30.0), np.ones(30, np.float32))
        with pytest.raises(RuntimeError):
            m.Forecast(np.arange(3.0))


# ---------------------------------------------------------------------------
# MultitaskGaussianLikelihood (reference VoltronGP.py:47-48 usage: one
# global noise shared across tasks)
# ---------------------------------------------------------------------------


class TestMultitaskLikelihood:
    def test_shared_noise_on_diagonal(self):
        from volt_tpu.likelihoods import MultitaskGaussianLikelihood

        lik = MultitaskGaussianLikelihood(num_tasks=3)
        assert lik.num_tasks == 3
        params = lik.init_with_noise(1e-3)
        np.testing.assert_allclose(float(lik.noise(params)[..., 0]), 1e-3,
                                   rtol=1e-5)
        cov = jnp.zeros((4, 4))
        marg = lik.marginal_covariance(params, cov)
        np.testing.assert_allclose(np.diag(np.asarray(marg)), 1e-3,
                                   rtol=1e-5)


# ---------------------------------------------------------------------------
# Options pandas date helpers (reference option_utils.py:6-24)
# ---------------------------------------------------------------------------


class TestOptionDateHelpers:
    @pytest.fixture
    def spy(self):
        pd = pytest.importorskip("pandas")
        dates = [f"2021-01-{d:02d}" for d in (4, 5, 6, 7, 8, 11, 12)]
        return pd.DataFrame({
            "Date": dates,
            "Close": np.linspace(100.0, 106.0, len(dates)),
        })

    def test_get_training_data(self, spy):
        from volt_tpu.options import get_training_data

        out = get_training_data(spy, "2021-01-08", 3)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(spy["Close"].iloc[1:4]))

    def test_get_true_value(self, spy):
        from volt_tpu.options import get_true_value

        assert get_true_value(spy, "2021-01-08", 100.0) == pytest.approx(4.0)
        assert get_true_value(spy, "2021-01-04", 105.0) == 0.0

    def test_get_trading_days(self, spy):
        from volt_tpu.options import get_trading_days

        assert get_trading_days(spy, "2021-01-05", "2021-01-11") == 4

    def test_find_last_trading_days(self, spy):
        from volt_tpu.options import find_last_trading_days

        out = find_last_trading_days(spy, ["2021-01-09", "2021-01-12"])
        assert list(out) == ["2021-01-08", "2021-01-11"]


# ---------------------------------------------------------------------------
# shard_batch specs
# ---------------------------------------------------------------------------


class TestShardBatch:
    def test_specs_per_output_mode(self):
        from jax.sharding import PartitionSpec as P

        from volt_tpu.parallel import make_mesh
        from volt_tpu.parallel.pipeline import shard_batch

        mesh = make_mesh((4, 2))
        in_s, out_s = shard_batch(mesh, "samples")
        assert in_s.spec == P("asset")
        assert out_s.spec == P("asset", "path")
        in_q, out_q = shard_batch(mesh, "quantiles")
        assert out_q.spec == P("asset")


# ---------------------------------------------------------------------------
# ops micro-helpers (closed-form checks)
# ---------------------------------------------------------------------------


class TestOpsMicro:
    def test_inv_softplus_roundtrip(self):
        from volt_tpu.ops.constraints import inv_softplus, softplus

        y = jnp.asarray([1e-3, 0.1, 1.0, 20.0])
        np.testing.assert_allclose(np.asarray(softplus(inv_softplus(y))), y,
                                   rtol=1e-6)

    def test_add_jitter(self):
        from volt_tpu.ops.chol import add_jitter

        a = jnp.zeros((2, 3, 3))
        out = np.asarray(add_jitter(a, 0.5))
        np.testing.assert_allclose(out, 0.5 * np.eye(3)[None].repeat(2, 0))

    def test_triangular_solves(self):
        from volt_tpu.ops.chol import (solve_lower_triangular,
                                       solve_upper_triangular)

        rng = np.random.default_rng(1)
        l_mat = np.tril(rng.standard_normal((5, 5))) + 5 * np.eye(5)
        b = rng.standard_normal((5, 2))
        np.testing.assert_allclose(
            np.asarray(solve_lower_triangular(jnp.asarray(l_mat),
                                              jnp.asarray(b))),
            np.linalg.solve(l_mat, b), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(solve_upper_triangular(jnp.asarray(l_mat),
                                              jnp.asarray(b))),
            np.linalg.solve(l_mat.T, b), rtol=1e-5)

    def test_tril_inverse_quad(self):
        from volt_tpu.ops.chol import tril_inverse_quad

        rng = np.random.default_rng(2)
        l_mat = np.tril(rng.standard_normal((4, 4))) + 4 * np.eye(4)
        b = rng.standard_normal(4)
        k = l_mat @ l_mat.T
        np.testing.assert_allclose(
            float(tril_inverse_quad(jnp.asarray(l_mat), jnp.asarray(b))),
            float(b @ np.linalg.solve(k, b)), rtol=1e-5)

    def test_bm_increments(self):
        from volt_tpu.ops.brownian import bm_increments

        np.testing.assert_allclose(
            np.asarray(bm_increments(jnp.asarray([1.0, 3.0, 6.0]))),
            [1.0, 2.0, 3.0])

    def test_cumtrapz_weights_endpoint_halving(self):
        # reference CumTrapz (VolKernel.py:4-10): uniform dx, both
        # endpoints halved
        from volt_tpu.ops import cumtrapz_weights

        w = np.asarray(cumtrapz_weights(jnp.asarray([0.0, 1.0, 2.0, 3.0])))
        np.testing.assert_allclose(w, [0.5, 1.0, 1.0, 0.5])

    def test_mvn_log_prob_chol(self):
        from volt_tpu.ops.mvn import mvn_log_prob_chol

        scipy_stats = pytest.importorskip("scipy.stats")
        rng = np.random.default_rng(3)
        a = rng.standard_normal((3, 3))
        cov = a @ a.T + 3 * np.eye(3)
        y = rng.standard_normal(3)
        mean = rng.standard_normal(3)
        got = float(mvn_log_prob_chol(jnp.asarray(y), jnp.asarray(mean),
                                      jnp.asarray(np.linalg.cholesky(cov))))
        want = float(scipy_stats.multivariate_normal(mean, cov).logpdf(y))
        assert math.isclose(got, want, rel_tol=1e-5)

    def test_affine_scan(self):
        from volt_tpu.ops.bidiag import affine_scan

        alpha = jnp.asarray([0.5, 2.0, -1.0, 0.25])
        beta = jnp.asarray([1.0, -1.0, 3.0, 0.5])
        z = np.zeros(4)
        prev = 0.0
        for i in range(4):
            prev = float(alpha[i]) * prev + float(beta[i])
            z[i] = prev
        np.testing.assert_allclose(np.asarray(affine_scan(alpha, beta)), z,
                                   rtol=1e-6)
