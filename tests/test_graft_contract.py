"""Guards for the driver contract (__graft_entry__) and tridiagonal
property battery."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        mll, samples = jax.jit(fn)(*args)
        assert np.isfinite(float(mll))
        assert samples.shape == (32, 16)
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_dryrun_multichip_8(self, devices):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts sharding + finiteness internally


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
