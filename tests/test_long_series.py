"""Long-context capability: the reference caps n at ~2000 (exact-GP O(n^3),
``max_cholesky_size`` guard); here the full pipeline runs at n in the tens
of thousands — sparse GPCV is O(n m^2)/step, and the vol/data/rollout
stages never materialize anything quadratic in n for the flagship kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.ops.tridiag import brownian_noise_mll_kalman
from volt_tpu.train import learn_gpcv_sparse


N_LONG = 8_192  # solo runs fine at 16k+; kept moderate for suite wall-time
DT = 1.0 / 252


@pytest.fixture(scope="module")
def long_series():
    rng = np.random.default_rng(0)
    n = N_LONG + 1
    vol = 0.2 * np.exp(0.3 * np.sin(np.linspace(0, 20, n)))
    rets = vol * rng.standard_normal(n) * np.sqrt(DT)
    prices = 100.0 * np.exp(np.cumsum(rets)).astype(np.float32)
    train_x = jnp.arange(N_LONG, dtype=jnp.float32) * DT
    return train_x, jnp.asarray(prices), vol


class TestLongSeries:
    def test_sparse_gpcv(self, long_series):
        train_x, prices, vol_true = long_series
        vol = learn_gpcv_sparse(train_x, prices, num_inducing=96,
                                train_iters=60)
        assert vol.shape == (N_LONG,)
        assert bool(jnp.all(jnp.isfinite(vol))) and bool(jnp.all(vol > 0))
        # real recovery, not just scale (measured: ratio 1.019, rel_err
        # 0.044 at 60 iters on this smooth-vol series)
        ratio = float(jnp.median(vol)) / np.median(vol_true)
        assert 0.85 < ratio < 1.15, ratio
        rel_err = float(np.mean(np.abs(np.asarray(vol) - vol_true[1:])
                                / vol_true[1:]))
        assert rel_err < 0.15, rel_err

    def test_sparse_vs_dense_quality_n2000(self):
        """At n = 2000 (the reference's max_cholesky_size cap, where both
        families run) the full-resolution family must recover the SABR vol
        at least as well as the m = 256 sparse bottleneck — the round-4
        anomaly (full losing 0.297-to-0.220 to sparse at equal iteration
        budgets) was under-convergence of Adam in the tridiag
        parameterization, fixed by natural-gradient VI
        (gp/natural.py; measured in tools/gpcv_convergence.py: the family
        optimum in ~10 iterations, n-independent).  Sparse stays pinned
        within 1.15x of full — the m-sweep and the n = 16k spot row live
        in BENCH_SCALING.md."""
        from volt_tpu.data import sabr_paths
        from volt_tpu.train import learn_gpcv

        n = 2000
        f, v = sabr_paths(steps=n + 1, seed=2019)
        dt = 1.0 / (n + 1)
        train_x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) + dt
        iters = 300

        def rel_err(vol_hat):
            return float(np.mean(np.abs(np.asarray(vol_hat) - v[1:]) / v[1:]))

        dense = rel_err(learn_gpcv(train_x, jnp.asarray(f),
                                   train_iters=iters))
        sparse = rel_err(learn_gpcv_sparse(train_x, jnp.asarray(f),
                                           num_inducing=256,
                                           train_iters=iters))
        # full-resolution NGVI: at/near the family optimum (~0.22)
        assert dense < 0.24, dense
        # the flagship no longer loses to its own 256-point bottleneck
        assert dense <= sparse + 0.005, (dense, sparse)
        assert sparse <= 1.15 * dense, (sparse, dense)
        assert sparse < 0.30, sparse

    def test_full_family_recovery_vs_n(self):
        """FULL-family recovery must not degrade with n at a fixed (small)
        iteration budget — the gate VERDICT r4 asked for.  NGVI's
        convergence is n-independent (tools/gpcv_convergence.py: n=2000
        reaches the optimum in ~10 steps), so 100 iterations must land
        within a whisker of the asymptote at every n."""
        from volt_tpu.data import sabr_paths
        from volt_tpu.train import learn_gpcv

        for n in (500, 2000):
            f, v = sabr_paths(steps=n + 1, seed=2019)
            dt = 1.0 / (n + 1)
            train_x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) + dt
            vol = learn_gpcv(train_x, jnp.asarray(f), train_iters=100)
            err = float(np.mean(np.abs(np.asarray(vol) - v[1:]) / v[1:]))
            assert err < 0.24, (n, err)

    def test_sparse_return_model_state_consistent(self):
        """The sparse state carries the FULL grid plus its inducing grid:
        state.predicted_scale() must reproduce the function's direct
        return on the same (full) grid — regression for the round-3 fix
        where train_x was the m-point inducing grid paired with n-point
        targets, so the state's own methods answered on a different grid
        than the function."""
        rng = np.random.default_rng(5)
        n = 400
        rets = 0.2 * np.sqrt(DT) * rng.standard_normal(n)
        prices = 100.0 * np.exp(np.cumsum(rets)).astype(np.float32)
        train_x = jnp.arange(n - 1, dtype=jnp.float32) * DT  # return grid
        vol, state = learn_gpcv_sparse(train_x, jnp.asarray(prices),
                                       num_inducing=64, train_iters=20,
                                       return_model=True)
        assert state.train_x.shape == (n - 1,)
        assert state.inducing_x.shape[0] <= 64
        again = state.predicted_scale()
        np.testing.assert_allclose(np.asarray(again), np.asarray(vol),
                                   rtol=1e-5, atol=1e-7)

    def test_mll_at_scale(self, long_series):
        # the production data-model MLL (the float32 Kalman scan every
        # training loop drives) at n = 8k: O(n) work, no factorization.
        # The value is pinned against an independent float64 numpy Kalman
        # filter for the same state-space model (x_t = x_{t-1} +
        # N(0, v_t - v_{t-1}), y_t = x_t + N(0, noise)); the associative
        # LDL twin is dense-pinned separately in test_graft_contract.
        train_x, prices, _ = long_series
        rng = np.random.default_rng(1)
        vol = jnp.asarray((0.15 + 0.1 * rng.random(N_LONG)).astype(np.float32))
        from volt_tpu.kernels import VolatilityKernel

        v = VolatilityKernel().integral(train_x, vol)
        r = jnp.asarray(
            (0.05 * rng.standard_normal(N_LONG)).astype(np.float32)
        )
        noise = 0.01
        mll = brownian_noise_mll_kalman(v, jnp.float32(noise), r)

        v64 = np.asarray(v, np.float64)
        r64 = np.asarray(r, np.float64)
        q = np.diff(v64, prepend=0.0)  # state-noise variances
        ll, m, p = 0.0, 0.0, 0.0
        for t in range(N_LONG):
            p = p + q[t]
            s = p + noise
            innov = r64[t] - m
            ll -= 0.5 * (np.log(2 * np.pi * s) + innov * innov / s)
            k = p / s
            m = m + k * innov
            p = (1.0 - k) * p
        # brownian_noise_mll_kalman is per-point normalized (MLL / n)
        assert float(mll) == pytest.approx(ll / N_LONG, rel=1e-4)

        g = jax.grad(
            lambda s: -brownian_noise_mll_kalman(v, s, r)
        )(jnp.float32(noise))
        # pin the noise gradient with float64 central differences
        h = 1e-4
        def f64(s):
            ll, m, p = 0.0, 0.0, 0.0
            for t in range(N_LONG):
                p = p + q[t]
                sv = p + s
                innov = r64[t] - m
                ll -= 0.5 * (np.log(2 * np.pi * sv) + innov * innov / sv)
                k = p / sv
                m = m + k * innov
                p = (1.0 - k) * p
            return ll
        fd = -(f64(noise + h) - f64(noise - h)) / (2 * h) / N_LONG
        assert float(g) == pytest.approx(fd, rel=1e-2)

    def test_long_rollout(self, long_series):
        # Markov rollout over a 250-step horizon from the 8192-point history.
        train_x, prices, _ = long_series
        from volt_tpu.models.bmgp import BMGP
        from volt_tpu.models.volt import VoltGP, make_mean
        from volt_tpu.rollouts import rollouts

        rng = np.random.default_rng(2)
        vol = jnp.asarray((0.15 + 0.1 * rng.random(N_LONG)).astype(np.float32))
        bm = BMGP()
        vol_state = bm.fit_state(bm.init(), train_x, jnp.log(vol))
        volt = VoltGP(mean=make_mean("ewma", k=200))
        model = volt.fit_state(volt.init(), train_x,
                               jnp.log(prices[1:]), vol, vol_state)
        h = 250
        test_x = jnp.arange(h, dtype=jnp.float32) * DT + train_x[-1] + DT
        s = rollouts(jax.random.key(0), model, train_x, prices, test_x,
                     nsample=16)
        assert s.shape == (16, h)
        assert bool(jnp.all(jnp.isfinite(s)))
