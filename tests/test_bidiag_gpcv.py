"""Tridiagonal-precision variational family: bidiag ops + GPCV equivalence.

The ``q='tridiag'`` GPCV parameterization (``ops/bidiag.py``,
``models/gpcv.py``) must be *algebraically equivalent* to the reference's
dense family wherever both can represent the same Gaussian, and must reach
the same ELBO optimum (the optimal Gaussian posterior for the BM prior has
tridiagonal precision).  Dense oracles pin every op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.models.gpcv import GPCVModel
from volt_tpu.ops.bidiag import (
    bidiag_chol_from_tridiag,
    bidiag_solve_lower,
    bidiag_solve_upper,
    min_precision,
    takahashi_band,
    tridiag_q_kl_bm_prior,
)
from volt_tpu.train import _adam_scan, scaled_returns


@pytest.fixture(scope="module")
def spd_tridiag():
    rng = np.random.default_rng(0)
    n = 24
    diag = rng.uniform(2.0, 4.0, n).astype(np.float32)
    off = rng.uniform(-0.5, 0.5, n - 1).astype(np.float32)
    dense = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    return jnp.asarray(diag), jnp.asarray(off), dense


class TestBidiagOps:
    def test_chol(self, spd_tridiag):
        diag, off, dense = spd_tridiag
        d, e = bidiag_chol_from_tridiag(diag, off)
        L = np.diag(np.asarray(d)) + np.diag(np.asarray(e), -1)
        np.testing.assert_allclose(L @ L.T, dense, rtol=1e-5, atol=1e-6)

    def test_solves(self, spd_tridiag):
        diag, off, dense = spd_tridiag
        d, e = bidiag_chol_from_tridiag(diag, off)
        L = np.diag(np.asarray(d)) + np.diag(np.asarray(e), -1)
        b = np.random.default_rng(1).standard_normal(
            diag.shape[-1]
        ).astype(np.float32)
        np.testing.assert_allclose(
            bidiag_solve_lower(d, e, jnp.asarray(b)),
            np.linalg.solve(L, b), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            bidiag_solve_upper(d, e, jnp.asarray(b)),
            np.linalg.solve(L.T, b), rtol=1e-5, atol=1e-6,
        )

    def test_takahashi_band(self, spd_tridiag):
        diag, off, dense = spd_tridiag
        d, e = bidiag_chol_from_tridiag(diag, off)
        sigma = np.linalg.inv(dense)
        var, cov = takahashi_band(d, e)
        np.testing.assert_allclose(var, np.diag(sigma), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cov, np.diag(sigma, -1), rtol=1e-5,
                                   atol=1e-6)

    def test_batched(self, spd_tridiag):
        diag, off, _ = spd_tridiag
        diag_b = jnp.stack([diag, diag * 1.5])
        off_b = jnp.stack([off, off * 0.5])
        d, e = bidiag_chol_from_tridiag(diag_b, off_b)
        var, cov = takahashi_band(d, e)
        d0, e0 = bidiag_chol_from_tridiag(diag * 1.5, off * 0.5)
        var0, _ = takahashi_band(d0, e0)
        np.testing.assert_allclose(var[1], var0, rtol=1e-6)

    def test_kl_vs_dense(self):
        from volt_tpu.ops.mvn import mvn_kl

        rng = np.random.default_rng(2)
        n = 20
        x = (np.arange(n, dtype=np.float32)) / 252.0  # x_0 = 0 jitter path
        vol = np.float32(0.3)
        jitter = 1e-6
        diag = rng.uniform(3.0, 6.0, n).astype(np.float32)
        off = rng.uniform(-0.8, 0.8, n - 1).astype(np.float32)
        d, e = bidiag_chol_from_tridiag(jnp.asarray(diag), jnp.asarray(off))
        L = np.diag(np.asarray(d)) + np.diag(np.asarray(e), -1)
        sigma_q = np.linalg.inv(L @ L.T)
        mq = (0.1 * rng.standard_normal(n)).astype(np.float32)
        mp = np.full(n, -1.5, np.float32)
        dx = np.maximum(np.diff(x, prepend=0.0), jitter / vol)
        K = vol * np.minimum.outer(np.cumsum(dx), np.cumsum(dx))
        kl_dense = mvn_kl(
            jnp.asarray(mq),
            jnp.asarray(np.linalg.cholesky(sigma_q), jnp.float32),
            jnp.asarray(mp),
            jnp.asarray(np.linalg.cholesky(K), jnp.float32),
        )
        kl_fast = tridiag_q_kl_bm_prior(
            jnp.asarray(x), jnp.asarray([vol]), jnp.asarray(mq), d, e,
            jnp.asarray(mp), jitter=jitter,
        )
        np.testing.assert_allclose(kl_fast, kl_dense, rtol=1e-4)

    def test_min_precision_inverts_min_kernel(self):
        n = 16
        x = (1.0 + np.arange(n, dtype=np.float32)) / 252.0
        diag, off, dx = min_precision(jnp.asarray(x))
        A = (np.diag(np.asarray(diag)) + np.diag(np.asarray(off), 1)
             + np.diag(np.asarray(off), -1))
        M = np.minimum.outer(x, x)
        np.testing.assert_allclose(A @ M, np.eye(n), atol=5e-4)


def _sim_prices(n, seed=3):
    rng = np.random.default_rng(seed)
    ret = 0.01 * rng.standard_normal(n)
    return np.exp(np.cumsum(ret) + 4.0).astype(np.float32)


class TestGPCVTridiag:
    @pytest.fixture(scope="class")
    def data(self):
        n = 60
        dt = 1.0 / 252
        train_x = jnp.arange(n, dtype=jnp.float32) * dt
        prices = jnp.asarray(_sim_prices(n + 1))
        yy = scaled_returns(train_x, prices)
        return train_x, yy

    def test_elbo_matches_full_for_same_gaussian(self, data):
        """A tridiag state and the dense state encoding the SAME q must give
        the SAME ELBO (formula consistency across families)."""
        train_x, yy = data
        full = GPCVModel(q="full")
        tri = GPCVModel(q="tridiag")
        p_tri = tri.init(train_x, yy)
        d, e = np.exp(np.asarray(p_tri["q_log_d"])), np.asarray(p_tri["q_e"])
        L = np.diag(d) + np.diag(e, -1)
        sigma = np.linalg.inv(L @ L.T)
        p_full = full.init(train_x, yy)
        p_full = {
            **p_full,
            "variational_mean": p_tri["variational_mean"],
            "chol_variational_covar": jnp.asarray(
                np.linalg.cholesky(sigma), jnp.float32
            ),
        }
        e_full = float(full.elbo(p_full, train_x, yy))
        e_tri = float(tri.elbo(p_tri, train_x, yy))
        assert abs(e_full - e_tri) < 5e-3 * max(1.0, abs(e_full))

    def test_marginals_match_dense(self, data):
        train_x, yy = data
        tri = GPCVModel(q="tridiag")
        p = tri.init(train_x, yy)
        d = np.exp(np.asarray(p["q_log_d"]))
        e = np.asarray(p["q_e"])
        L = np.diag(d) + np.diag(e, -1)
        sigma = np.linalg.inv(L @ L.T)
        mean, var = tri.latent_marginals(p, train_x)
        np.testing.assert_allclose(var, np.diag(sigma), rtol=1e-4)
        np.testing.assert_allclose(mean, p["variational_mean"], rtol=1e-6)

    def test_predictive_matches_full_family(self, data):
        """At new points both families (encoding the same q) must agree."""
        train_x, yy = data
        n = train_x.shape[-1]
        dt = float(train_x[1] - train_x[0])
        test_x = train_x[-1] + dt * (1.0 + jnp.arange(5, dtype=jnp.float32))
        full = GPCVModel(q="full")
        tri = GPCVModel(q="tridiag")
        p_tri = tri.init(train_x, yy)
        d, e = np.exp(np.asarray(p_tri["q_log_d"])), np.asarray(p_tri["q_e"])
        L = np.diag(d) + np.diag(e, -1)
        sigma = np.linalg.inv(L @ L.T)
        p_full = {
            **full.init(train_x, yy),
            "variational_mean": p_tri["variational_mean"],
            "chol_variational_covar": jnp.asarray(
                np.linalg.cholesky(sigma), jnp.float32
            ),
        }
        m_f, v_f = full.latent_marginals(p_full, train_x, test_x)
        m_t, v_t = tri.latent_marginals(p_tri, train_x, test_x)
        np.testing.assert_allclose(m_t, m_f, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(v_t, v_f, rtol=2e-3, atol=1e-5)

    def test_reaches_full_rank_optimum(self, data):
        """Both families trained to convergence reach the same ELBO (the
        optimum has tridiagonal precision) and the same vol path."""
        train_x, yy = data
        results = {}
        for q in ("full", "tridiag"):
            mod = GPCVModel(q=q)
            params = mod.init(train_x, yy)
            params, losses = jax.jit(
                lambda p, m=mod: _adam_scan(
                    lambda pp: -m.elbo(pp, train_x, yy), p, 600, 0.01
                )
            )(params)
            scale = mod.predicted_scale(params, train_x)
            results[q] = (float(losses[-1]), np.asarray(scale))
        loss_f, scale_f = results["full"]
        loss_t, scale_t = results["tridiag"]
        assert abs(loss_f - loss_t) < 0.02 * max(1.0, abs(loss_f)), (
            f"final ELBOs diverge: full={loss_f}, tridiag={loss_t}"
        )
        np.testing.assert_allclose(scale_t, scale_f, rtol=0.08, atol=5e-4)

    def test_pipeline_end_to_end(self, data):
        from volt_tpu.parallel import PipelineConfig, fit_forecast

        train_x, _ = data
        n = train_x.shape[-1]
        prices = jnp.asarray(_sim_prices(n + 1))
        dt = float(train_x[1] - train_x[0])
        test_x = train_x[-1] + dt * (1.0 + jnp.arange(4, dtype=jnp.float32))
        cfg = PipelineConfig(gpcv_iters=30, vol_iters=20, data_iters=10,
                             k=20, nsample=8, gpcv_q="tridiag")
        samples, aux = fit_forecast(jax.random.key(0), train_x, prices,
                                    test_x, cfg)
        assert samples.shape == (8, 4)
        assert bool(jnp.all(jnp.isfinite(samples)))
        assert bool(jnp.all(aux["vol"] > 0))
