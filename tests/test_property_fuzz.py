"""Randomized property tests for the load-bearing numerical primitives.

The fixed-case parity tests pin each op at a handful of named shapes;
this file sweeps *randomized* shapes/parameters (seeded, deterministic)
against literal float64 numpy oracles, so shape-edge regressions (k=1,
n=2, h>k boundaries, odd batch dims, non-equispaced grids) can't hide
between the named cases.  No hypothesis dependency — a fixed master seed
drives every trial, so failures reproduce exactly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MASTER_SEED = 20260819


def _rngs(n_trials):
    root = np.random.default_rng(MASTER_SEED)
    return [np.random.default_rng(s)
            for s in root.integers(0, 2**63 - 1, size=n_trials)]


# ---------------------------------------------------------------------------
# tridiagonal LDL / solve (the Volt-MLL backbone)
# ---------------------------------------------------------------------------


class TestTridiagFuzz:
    def test_ldl_logdet_and_solve_vs_dense(self):
        from volt_tpu.ops.tridiag import tridiag_ldl_pivots, tridiag_solve

        for rng in _rngs(20):
            n = int(rng.integers(2, 220))
            # SPD tridiagonal via L D L^T with random positive D and
            # bounded unit-lower bidiagonal L — conditioning spans ~1e6.
            d = np.exp(rng.uniform(-6, 6, n))
            ell = rng.uniform(-0.9, 0.9, n - 1)
            diag = d.copy()
            diag[1:] += ell**2 * d[:-1]
            off = ell * d[:-1]
            dense = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
            b = rng.standard_normal(n)

            with jax.enable_x64():
                piv, logdet = tridiag_ldl_pivots(
                    jnp.asarray(diag, jnp.float64),
                    jnp.asarray(off, jnp.float64),
                )
                x = tridiag_solve(piv, jnp.asarray(off, jnp.float64),
                                  jnp.asarray(b, jnp.float64))

            sign, ld_np = np.linalg.slogdet(dense)
            assert sign > 0
            # conditioning spans ~1e6: numpy's own slogdet error is ~1e-8
            np.testing.assert_allclose(float(logdet), ld_np, rtol=1e-6,
                                       atol=1e-8)
            # forward error scales with cond(T) (up to ~1e9 here) for any
            # solver; the condition-independent property is the backward
            # error: T x must reproduce b to machine precision at the
            # scale of the intermediate products.
            # (the associative-scan solver's stability constant grows
            # mildly with n — allow ~500*eps relative to that scale)
            xs = np.asarray(x)
            scale = float((np.abs(dense) @ np.abs(xs)).max()) + 1.0
            np.testing.assert_allclose(dense @ xs, b, rtol=0,
                                       atol=1e-10 * scale)

    def test_brownian_mll_forms_agree_and_match_dense(self):
        """associative-LDL MLL == Kalman MLL == dense float64 MLL on
        random irregular increments and noise levels."""
        from volt_tpu.ops.tridiag import (
            brownian_noise_mll,
            brownian_noise_mll_kalman,
        )

        for rng in _rngs(15):
            n = int(rng.integers(2, 160))
            incs = np.exp(rng.uniform(-4, 2, n))
            v = np.cumsum(incs)
            s2 = float(np.exp(rng.uniform(-8, 1)))
            r = rng.standard_normal(n)

            k_min = np.minimum.outer(v, v) + s2 * np.eye(n)
            sign, ld = np.linalg.slogdet(k_min)
            quad = r @ np.linalg.solve(k_min, r)
            dense = -0.5 * (quad + ld + n * math.log(2 * math.pi)) / n

            with jax.enable_x64():
                ldl = float(brownian_noise_mll(
                    jnp.asarray(v, jnp.float64), jnp.float64(s2),
                    jnp.asarray(r, jnp.float64)))
                kal = float(brownian_noise_mll_kalman(
                    jnp.asarray(v, jnp.float64), jnp.float64(s2),
                    jnp.asarray(r, jnp.float64)))
            np.testing.assert_allclose(ldl, dense, rtol=1e-8)
            np.testing.assert_allclose(kal, dense, rtol=1e-8)


# ---------------------------------------------------------------------------
# Volt covariance (CumTrapz + min-index) on random irregular grids
# ---------------------------------------------------------------------------


def _cumtrapz_reference(vol, x):
    """Literal float64 restatement of the reference CumTrapz
    (``VolKernel.py:4-10``): *uniform* ``dx = x[1] - x[0]`` (even on an
    irregular grid — a kept parity quirk), all weights ``dx`` with the
    first and last halved, then a running sum of ``w * vol**2``."""
    v2 = vol.astype(np.float64) ** 2
    x = x.astype(np.float64)
    w = np.full(x.shape[-1], x[..., 1] - x[..., 0])
    w[0] *= 0.5
    w[-1] *= 0.5
    return np.cumsum(w * v2, axis=-1)


class TestVoltCovarianceFuzz:
    def test_matches_literal_min_gather_oracle(self):
        from volt_tpu.kernels import VolatilityKernel

        kern = VolatilityKernel()
        for rng in _rngs(15):
            n = int(rng.integers(2, 90))
            batched = bool(rng.integers(0, 2))
            x = np.cumsum(np.exp(rng.uniform(-3, 0, n)))  # irregular grid
            shape = (int(rng.integers(1, 4)), n) if batched else (n,)
            vol = np.exp(rng.uniform(-1.5, 1.0, shape))

            integral = _cumtrapz_reference(vol, x)
            ii = np.minimum.outer(np.arange(n), np.arange(n))
            oracle = integral[..., ii]

            got = np.asarray(kern({}, jnp.asarray(x, jnp.float32),
                                  jnp.asarray(vol, jnp.float32)))
            np.testing.assert_allclose(got, oracle, rtol=2e-5, atol=1e-6)

            got_diag = np.asarray(kern({}, jnp.asarray(x, jnp.float32),
                                       jnp.asarray(vol, jnp.float32),
                                       diag=True))
            np.testing.assert_allclose(
                got_diag, integral, rtol=2e-5, atol=1e-6
            )

    def test_brownian_cholesky_factors_the_covariance(self):
        """chol(K) closed form (the rollout fast path's factor) squares
        back to the min-index covariance on random grids."""
        from volt_tpu.kernels import VolatilityKernel
        from volt_tpu.ops.volint import brownian_cholesky

        kern = VolatilityKernel()
        for rng in _rngs(10):
            n = int(rng.integers(2, 70))
            x = np.cumsum(np.exp(rng.uniform(-3, 0, n)))
            vol = np.exp(rng.uniform(-1.5, 1.0, n))
            with jax.enable_x64():
                integral = kern.integral(
                    jnp.asarray(x, jnp.float64), jnp.asarray(vol, jnp.float64)
                )
                ell = np.asarray(brownian_cholesky(integral))
                k = np.asarray(kern({}, jnp.asarray(x, jnp.float64),
                                    jnp.asarray(vol, jnp.float64)))
            np.testing.assert_allclose(ell @ ell.T, k, rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# EWMA filter: random (batch, n, k) incl. k=1 and k >= n edges
# ---------------------------------------------------------------------------


class TestEwmaFuzz:
    def test_matches_reference_filter(self):
        from reference_oracles import ewma_reference

        from volt_tpu.ops.ewma import ewma

        for rng in _rngs(15):
            n = int(rng.integers(2, 120))
            k = int(rng.choice([1, 2, int(rng.integers(2, 2 * n + 2))]))
            shape = (int(rng.integers(1, 5)), n) if rng.integers(2) else (n,)
            y = rng.standard_normal(shape)

            got = np.asarray(ewma(jnp.asarray(y, jnp.float32), k))
            want = (np.apply_along_axis(ewma_reference, -1, y, k)
                    if y.ndim > 1 else ewma_reference(y, k))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# closed-form min-matrix spectrum at random n
# ---------------------------------------------------------------------------


class TestSpectrumFuzz:
    def test_reconstructs_min_matrix(self):
        from volt_tpu.ops.brownian import min_kernel_spectrum

        sizes = np.random.default_rng(MASTER_SEED).integers(2, 300, size=8)
        for n in map(int, sizes):
            with jax.enable_x64():
                mu, u, w = min_kernel_spectrum(n, dtype=jnp.float64)
                mu, u, w = map(np.asarray, (mu, u, w))
            m = np.minimum.outer(np.arange(1, n + 1), np.arange(1, n + 1))
            np.testing.assert_allclose(
                (u * mu) @ u.T, m.astype(np.float64), atol=1e-8 * n
            )
            np.testing.assert_allclose(u.T @ u, np.eye(n), atol=1e-10 * n)
            np.testing.assert_allclose(w, u.sum(axis=0), atol=1e-12 * n)


# ---------------------------------------------------------------------------
# FBM increment-domain factorization at random Hurst exponents
# ---------------------------------------------------------------------------


class TestFbmFuzz:
    def test_increment_cholesky_squares_to_gram(self):
        from reference_oracles import fbm_gram

        from volt_tpu.ops.fbm import fbm_cholesky

        for rng in _rngs(8):
            n = int(rng.integers(2, 60))
            two_h = float(rng.uniform(0.2, 1.8))  # H in (0.1, 0.9)
            x = np.cumsum(np.exp(rng.uniform(-2.0, 0.0, n)))
            with jax.enable_x64():
                ell = np.asarray(fbm_cholesky(jnp.asarray(x, jnp.float64),
                                              jnp.float64(two_h)))
            k = fbm_gram(x, two_h=two_h)
            np.testing.assert_allclose(
                ell @ ell.T, k, rtol=1e-6, atol=1e-8 * np.abs(k).max()
            )


# ---------------------------------------------------------------------------
# Markov forecast guard: traced predicate == host predicate on random grids
# ---------------------------------------------------------------------------


class TestGuardFuzz:
    def test_future_grid_ok_matches_host_probe(self):
        from volt_tpu.ops.brownian import future_grid_ok

        jitted = jax.jit(future_grid_ok)
        for rng in _rngs(20):
            n = int(rng.integers(1, 20))
            h = int(rng.integers(1, 10))
            train = np.sort(rng.standard_normal(n))
            kind = rng.integers(0, 3)
            if kind == 0:  # valid strictly-future grid
                test = train[-1] + np.cumsum(np.exp(
                    rng.uniform(-3, 0, h)))
            elif kind == 1:  # overlapping/interpolating
                test = np.sort(rng.uniform(train[0] - 1.0, train[-1], h))
            else:  # future but non-increasing (h >= 2) or valid (h == 1)
                test = train[-1] + 1.0 + rng.standard_normal(h) * 0.1
                if h >= 2:
                    test[h // 2] = test.max() + 1.0
                    test = test[::-1].copy()
            host_ok = bool(
                np.all(np.diff(test) > 0) and test[0] > train[-1]
            )
            got = bool(jitted(jnp.asarray(test, jnp.float32),
                              jnp.asarray(train, jnp.float32)))
            assert got == host_ok, (kind, train, test)

    def test_nan_poison_bit_exact_when_ok(self):
        from volt_tpu.ops.brownian import nan_poison

        for rng in _rngs(5):
            x = rng.standard_normal((4, 7)).astype(np.float32)
            x[0, 0] = np.inf
            x[1, 1] = 1e-30  # tiny but normal (XLA:CPU flushes subnormals)
            ok_t = jax.jit(nan_poison)(jnp.asarray(x), jnp.asarray(True))
            ok_f = jax.jit(nan_poison)(jnp.asarray(x), jnp.asarray(False))
            assert (np.asarray(ok_t) == x).all()  # bit-exact incl. inf
            assert np.isnan(np.asarray(ok_f)).all()
