"""Guards for the driver contract (__graft_entry__) and tridiagonal
property battery."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        sys.path.insert(0, REPO)
        import __graft_entry__ as g

        fn, args = g.entry()
        mll, samples = jax.jit(fn)(*args)
        assert np.isfinite(float(mll))
        assert samples.shape == (32, 16)
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_dryrun_multichip_8(self, devices):
        sys.path.insert(0, REPO)
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts sharding + finiteness internally

    def test_backend_decision_dead_tunnel_raises_within_deadline(self):
        """The previously unguarded hang case (round-4 verdict item 7): a
        caller-initialized backend whose tunnel died afterwards.  The
        decision core must RAISE after the (deadline-bounded, simulated
        here) probe instead of proceeding into a compile that hangs
        forever; with no backend up it falls back to CPU instead."""
        sys.path.insert(0, REPO)
        import time

        import __graft_entry__ as g

        calls = []

        def dead_probe(timeout_s):
            # simulate a hung backend init contained by the probe's
            # subprocess deadline: the probe returns (= within deadline)
            # with a non-tpu verdict rather than blocking
            calls.append(timeout_s)
            return "timeout"

        t0 = time.perf_counter()
        with pytest.raises(RuntimeError, match="JAX_PLATFORMS=cpu"):
            g._backend_decision(["axon", "cpu"], True, False, dead_probe)
        assert time.perf_counter() - t0 < 5.0  # no in-process hang
        assert calls == [90.0]
        # no backend up yet: dead tunnel downgrades to CPU, never raises
        assert g._backend_decision(["axon", "cpu"], False, False,
                                   dead_probe) == "force-cpu"

    def test_backend_decision_safe_paths_skip_probe(self):
        sys.path.insert(0, REPO)
        import __graft_entry__ as g

        def boom(timeout_s):  # pragma: no cover - must not be called
            raise AssertionError("probe must not run on the safe paths")

        assert g._backend_decision([], False, True, boom) == "force-cpu"
        assert g._backend_decision(["cpu"], True, False, boom) == "ok"
        alive = lambda t: "tpu"
        assert g._backend_decision(["axon", "cpu"], True, False,
                                   alive) == "ok"


class TestTridiagProperties:
    def test_random_battery_vs_dense(self, rng):
        from volt_tpu.ops.tridiag import brownian_noise_mll_kalman

        for trial in range(20):
            n = int(rng.integers(3, 120))
            # log-uniform increments over 6 orders of magnitude
            delta = np.exp(rng.uniform(np.log(1e-7), np.log(1.0), n))
            v = np.cumsum(delta)
            s2 = float(np.exp(rng.uniform(np.log(1e-4), np.log(10.0))))
            r = rng.standard_normal(n) * 0.1
            k = v[np.minimum(np.arange(n)[:, None], np.arange(n)[None, :])]
            dense = scipy.stats.multivariate_normal.logpdf(
                r, np.zeros(n), k + s2 * np.eye(n)
            ) / n
            fast = float(brownian_noise_mll_kalman(
                jnp.asarray(v, jnp.float32), jnp.float32(s2),
                jnp.asarray(r, jnp.float32),
            ))
            assert fast == pytest.approx(dense, rel=2e-3, abs=2e-3), (
                trial, n, s2
            )

    def test_gradient_battery(self, rng):
        from volt_tpu.ops.tridiag import brownian_noise_mll_kalman

        n = 64
        delta = np.exp(rng.uniform(np.log(1e-6), np.log(0.1), n))
        v = jnp.asarray(np.cumsum(delta), jnp.float32)
        r = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
        for s2 in [1e-4, 0.01, 1.0]:
            g = jax.grad(lambda s: -brownian_noise_mll_kalman(v, s, r))(
                jnp.float32(s2)
            )
            # finite-difference check
            eps = s2 * 1e-3
            f1 = float(-brownian_noise_mll_kalman(v, jnp.float32(s2 + eps), r))
            f0 = float(-brownian_noise_mll_kalman(v, jnp.float32(s2 - eps), r))
            fd = (f1 - f0) / (2 * eps)
            assert float(g) == pytest.approx(fd, rel=0.05, abs=1e-3), s2


class TestTridiagAssociativeAPI:
    """The associative-scan LDL/solve (exported API; the training default
    is the Kalman form).  Accuracy envelope: well-conditioned SPD
    tridiagonals and realistic Volt magnitudes."""

    def test_ldl_pivots_and_logdet(self, rng):
        from volt_tpu.ops.tridiag import tridiag_ldl_pivots

        n = 60
        diag = jnp.asarray((2.0 + rng.random(n)).astype(np.float32))
        off = jnp.asarray((0.5 * rng.random(n - 1) - 0.25).astype(np.float32))
        d, ld = tridiag_ldl_pivots(diag, off)
        t = (np.diag(np.asarray(diag)) + np.diag(np.asarray(off), 1)
             + np.diag(np.asarray(off), -1)).astype(np.float64)
        assert float(ld) == pytest.approx(np.linalg.slogdet(t)[1], rel=1e-4)
        # pivots reproduce the sequential LDL recurrence
        d_seq = [float(diag[0])]
        for i in range(1, n):
            d_seq.append(float(diag[i]) - float(off[i - 1]) ** 2 / d_seq[-1])
        np.testing.assert_allclose(np.asarray(d), d_seq, rtol=1e-4)

    def test_solve(self, rng):
        from volt_tpu.ops.tridiag import tridiag_ldl_pivots, tridiag_solve

        n = 50
        diag = jnp.asarray((2.0 + rng.random(n)).astype(np.float32))
        off = jnp.asarray((0.4 * rng.random(n - 1)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        d, _ = tridiag_ldl_pivots(diag, off)
        x = tridiag_solve(d, off, b)
        t = (np.diag(np.asarray(diag)) + np.diag(np.asarray(off), 1)
             + np.diag(np.asarray(off), -1)).astype(np.float64)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(t, np.asarray(b)),
                                   rtol=1e-3, atol=1e-5)

    def test_brownian_mll_realistic_regime(self, rng):
        from volt_tpu.ops.tridiag import brownian_noise_mll

        n = 80
        dx = 1.0 / 252
        vols = 0.1 + 0.3 * rng.random(n)
        w = np.full(n, dx); w[0] *= 0.5; w[-1] *= 0.5
        v = np.cumsum(w * vols**2)
        r = 0.05 * rng.standard_normal(n)
        k = v[np.minimum(np.arange(n)[:, None], np.arange(n)[None, :])]
        for s2 in [1e-3, 0.1, 1.0]:
            dense = scipy.stats.multivariate_normal.logpdf(
                r, np.zeros(n), k + s2 * np.eye(n)
            ) / n
            fast = float(brownian_noise_mll(
                jnp.asarray(v, jnp.float32), jnp.float32(s2),
                jnp.asarray(r, jnp.float32),
            ))
            assert fast == pytest.approx(dense, rel=1e-4), s2
