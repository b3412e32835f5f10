"""Baseline (non-vol) rollout parity and option-pricing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu import options
from volt_tpu.data import sabr_paths
from volt_tpu.means import EWMAMean
from volt_tpu.rollouts import nonvol_rollouts, nonvol_rollouts_dense
from volt_tpu.train import train_basic_model


# Shared grid shape with test_rollout_parity_full: the dense per-step
# oracle compiles one program family per (S, n+t) shape, so matching
# N/H/nsample across files lets the op cache absorb the whole loop.
N, H = 72, 10
DT = 1.0 / 252


@pytest.fixture(scope="module")
def basic_model():
    f, _ = sabr_paths(steps=N + 1, seed=3)
    train_x = jnp.arange(N, dtype=jnp.float32) * DT
    train_y = jnp.asarray(f[1:])
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    model = train_basic_model(train_x, train_y, train_iters=60,
                              model_type="matern")
    return model, test_x


class TestNonvolRollouts:
    def test_shapes_and_finiteness(self, basic_model):
        model, test_x = basic_model
        s = nonvol_rollouts(jax.random.key(0), model, None, None, test_x,
                            nsample=32)
        assert s.shape == (32, H)
        assert bool(jnp.all(jnp.isfinite(s)))

    def test_matches_dense_per_path(self, basic_model):
        # Common random numbers: same per-step normals in both paths, so
        # matching conditional laws imply per-path agreement (see
        # test_rollout_parity_full.py for the Magpie-mean variants).
        model, test_x = basic_model
        nsample = 64
        key = jax.random.key(1)
        fast = np.asarray(
            nonvol_rollouts(key, model, None, None, test_x,
                            nsample=nsample)
        )
        zs = jax.random.normal(key, (H, nsample), jnp.float32).T
        dense = np.asarray(
            nonvol_rollouts_dense(key, model, test_x, nsample=nsample,
                                  zs=zs)
        )
        np.testing.assert_allclose(fast, dense, atol=2e-3)
        assert fast.std(0)[-1] > 0

    def test_ewma_mean_variant(self):
        # BasicWindRollouts pairs baseline kernels with Magpie means.
        from volt_tpu.models.basic import MaternGP

        f, _ = sabr_paths(steps=N + 1, seed=5)
        train_x = jnp.arange(N, dtype=jnp.float32) * DT
        log_y = jnp.log(jnp.asarray(f[1:]))
        test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
        module = MaternGP(EWMAMean(20))
        params = module.init()
        model = module.fit_state(params, train_x, log_y)
        s = nonvol_rollouts(jax.random.key(0), model, None, None, test_x,
                            nsample=16)
        assert s.shape == (16, H)
        assert bool(jnp.all(jnp.isfinite(s)))


class TestOptions:
    def test_ecdf(self):
        pxs = jnp.exp(jnp.asarray(np.linspace(0.0, 1.0, 101)))
        # 50 of 101 log prices lie below 0.5
        got = float(options.ecdf(pxs, float(jnp.exp(0.5))))
        assert got == pytest.approx(50 / 101, abs=1e-6)

    def test_price_call_grid(self, rng):
        paths = rng.lognormal(0.0, 0.2, (5000, 3)).astype(np.float32)
        strikes = jnp.asarray([0.8, 1.0, 1.2], jnp.float32)
        grid = np.asarray(options.price_call_grid(jnp.asarray(paths), strikes))
        assert grid.shape == (3, 3)
        for i, k in enumerate([0.8, 1.0, 1.2]):
            expected = np.maximum(paths - k, 0).mean(0)
            np.testing.assert_allclose(grid[i], expected, rtol=1e-4)
        # monotone in strike
        assert (np.diff(grid, axis=0) <= 1e-6).all()

    def test_put_call_parity(self, rng):
        # On the SAME sampled paths, call - put = mean(S) - K exactly.
        paths = rng.lognormal(0.0, 0.3, (4000, 3)).astype(np.float32)
        strikes = jnp.asarray([0.7, 1.0, 1.4], jnp.float32)
        calls = np.asarray(options.price_call_grid(jnp.asarray(paths),
                                                   strikes))
        puts = np.asarray(options.price_put_grid(jnp.asarray(paths),
                                                 strikes))
        fwd = paths.mean(0)[None, :]  # (1, n_exp)
        np.testing.assert_allclose(calls - puts,
                                   fwd - np.asarray(strikes)[:, None],
                                   rtol=1e-5, atol=1e-5)
        # puts increase with strike
        assert (np.diff(puts, axis=0) >= -1e-6).all()

    def test_pricer_dataframe(self, rng):
        import pandas as pd

        paths = rng.lognormal(4.6, 0.1, (2000, 2)).astype(np.float32)
        edays = [pd.Timestamp("2022-01-21"), pd.Timestamp("2022-02-18")]
        opts = pd.DataFrame({
            "expiration": [edays[0], edays[0], edays[1]],
            "strike": [95.0, 105.0, 100.0],
            "bid": [6.0, 1.5, 4.0],
            "ask": [6.5, 1.8, 4.5],
        })
        df = options.pricer(paths, opts, edays, np.array([101.0, 99.0]),
                            100.0)
        assert list(df.columns) == [
            "Expiry", "Strike", "Bid", "Ask", "Voltron", "Return",
            "ExpClose", "QuoteClose", "Year", "Sample_Percentile",
        ]
        assert len(df) == 3
        # call value decreases with strike within the same expiry
        assert df.iloc[0].Voltron > df.iloc[1].Voltron
        assert 0.0 <= df.iloc[0].Sample_Percentile <= 1.0

    def test_sabr_horizon_semantics(self):
        """``steps`` points discretize [0, T]: length is steps for any T,
        and the per-step noise scale is sqrt(T/steps)."""
        f1, v1 = sabr_paths(steps=64, T=1, seed=0)
        f2, v2 = sabr_paths(steps=64, T=2, seed=0)
        assert f1.shape == f2.shape == (64,)
        # longer horizon at the same step count => larger increments
        assert np.std(np.diff(np.log(f2))) > np.std(np.diff(np.log(f1)))

    def test_pricer_empty_chain_keeps_schema(self, rng):
        """No chain row matching any expiry must yield an empty frame
        with the full column schema, not a Length-mismatch ValueError."""
        import pandas as pd

        paths = rng.lognormal(4.6, 0.1, (100, 2)).astype(np.float32)
        edays = [pd.Timestamp("2022-01-21"), pd.Timestamp("2022-02-18")]
        opts = pd.DataFrame({
            "expiration": [pd.Timestamp("2023-06-16")],  # matches nothing
            "strike": [100.0], "bid": [4.0], "ask": [4.5],
        })
        df = options.pricer(paths, opts, edays, np.array([101.0, 99.0]),
                            100.0)
        assert len(df) == 0
        assert list(df.columns)[:2] == ["Expiry", "Strike"]


class TestOptionPricesVsBlackScholes:
    """Under a constant vol path and constant mean, rollout dynamics are an
    exact driftless lognormal walk with per-step log-variance
    (dx/2) * vol^2 (the reference's CumTrapz endpoint rule halves each
    step's increment — a faithful parity artifact).  MC call values must
    therefore match the Black-76 closed form computed from the walk's
    forward and total variance."""

    def test_mc_matches_closed_form(self):
        import scipy.stats as st
        from volt_tpu.data import sabr_paths
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import ConstantMean
        from volt_tpu.options import price_call_grid
        from volt_tpu.rollouts import _rollout_volt_scan

        n, h, nsample = 100, 20, 60_000
        dt = 1.0 / 252
        vol = 0.4
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        test_x = jnp.arange(h, dtype=jnp.float32) * dt + train_x[-1] + dt
        s0 = 100.0
        log_y = jnp.full((n,), np.log(s0), jnp.float32)

        bm = BMGP()
        vol_state = bm.fit_state(bm.init(), train_x,
                                 jnp.log(vol * jnp.ones(n)))
        volt = VoltGP(mean=ConstantMean())
        params = {"mean": {"constant": jnp.asarray([np.log(s0)])},
                  "likelihood": volt.likelihood.init()}
        model = volt.fit_state(params, train_x, log_y,
                               vol * jnp.ones(n), vol_state)

        pred_vol = vol * jnp.ones((nsample, h))
        zs = jax.random.normal(jax.random.key(0), (nsample, h))
        log_paths = _rollout_volt_scan(model, jnp.float32(0), test_x,
                                       pred_vol, zs, False, jnp.float32(0))
        px = jnp.exp(log_paths)  # (S, H)

        strikes = jnp.asarray([80.0, 100.0, 120.0], jnp.float32)
        mc = np.asarray(price_call_grid(px, strikes))  # (K, H)

        for t_idx in [4, 19]:
            total_var = (t_idx + 1) * 0.5 * dt * vol**2
            fwd = s0 * np.exp(0.5 * total_var)  # E[exp(N(log s0, V))]
            sv = np.sqrt(total_var)
            for k_idx, k in enumerate([80.0, 100.0, 120.0]):
                d1 = (np.log(fwd / k) + 0.5 * total_var) / sv
                d2 = d1 - sv
                bs = fwd * st.norm.cdf(d1) - k * st.norm.cdf(d2)
                got = mc[k_idx, t_idx]
                assert got == pytest.approx(bs, rel=0.05, abs=0.05), (
                    t_idx, k, got, bs
                )


class TestFloat64Mode:
    def test_rollout_runs_at_float64(self):
        # The forecast path derives its scalar dtypes from the model
        # state: a float64 state must produce float64 samples end-to-end.
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.models.volt import VoltGP
        from volt_tpu.means import EWMAMean
        from volt_tpu.rollouts import rollouts

        with jax.enable_x64():
            n, h = 40, 5
            dt = 1.0 / 252
            x = jnp.arange(n, dtype=jnp.float64) * dt
            tx = jnp.arange(h, dtype=jnp.float64) * dt + x[-1] + dt
            rng = np.random.default_rng(0)
            prices = jnp.asarray(
                100.0 * np.exp(np.cumsum(0.01 * rng.standard_normal(n + 1)))
            )
            vol = jnp.asarray(0.2 + 0.02 * rng.random(n))
            bm = BMGP()
            vol_state = bm.fit_state(
                jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                             bm.init()),
                x, jnp.log(vol),
            )
            volt = VoltGP(mean=EWMAMean(10))
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                  volt.init())
            model = volt.fit_state(params, x, jnp.log(prices[1:]), vol,
                                   vol_state)
            s = rollouts(jax.random.key(0), model, x, prices, tx,
                         nsample=8, theta=0.05)
            assert s.dtype == jnp.float64
            assert s.shape == (8, h)
            assert bool(jnp.all(jnp.isfinite(s)))
