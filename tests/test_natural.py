"""Natural-gradient VI for the tridiag GPCV family (gp/natural.py).

The round-4 verdict's top item: the full-resolution family lost to a
64-point sparse fit at n=2000 because plain Adam under-converges in the
tridiag parameterization as n grows (conditioning of the BM prior
precision spreads ~n).  NGVI's closed-form natural updates converge in
tens of iterations independent of n; these tests pin the optimizer's
correctness and its dominance over the Adam loop at equal budgets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.gp.natural import ngvi_tridiag_fit, tridiag_matvec
from volt_tpu.models.gpcv import GPCVModel
from volt_tpu.train import _fit_gpcv, learn_gpcv, scaled_returns

DT = 1.0 / 252.0


def _sabr(n, seed=2019):
    from volt_tpu.data import sabr_paths

    f, v = sabr_paths(steps=n + 1, seed=seed)
    dt = 1.0 / (n + 1)
    train_x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) + dt
    return train_x, jnp.asarray(f), v[1:]


class TestTridiagMatvec:
    def test_matches_dense(self):
        rng = np.random.default_rng(0)
        n = 17
        diag = jnp.asarray(rng.standard_normal(n), jnp.float32)
        off = jnp.asarray(rng.standard_normal(n - 1), jnp.float32)
        v = jnp.asarray(rng.standard_normal(n), jnp.float32)
        t = np.diag(np.asarray(diag))
        t += np.diag(np.asarray(off), 1) + np.diag(np.asarray(off), -1)
        np.testing.assert_allclose(np.asarray(tridiag_matvec(diag, off, v)),
                                   t @ np.asarray(v), rtol=1e-5, atol=1e-5)


class TestNgvi:
    def test_beats_adam_elbo_at_equal_iters(self):
        """50 NGVI iterations reach an ELBO at least as good as 500 Adam
        iterations from the same init (measured: NGVI@10 already matches
        Adam@4000 at n=2000; this is the cheap in-suite version)."""
        train_x, f, _ = _sabr(300)
        yy = scaled_returns(train_x, f)
        module = GPCVModel(kernel="bm", q="tridiag")
        params0 = module.init(train_x, yy)
        p_ngvi, _ = _fit_gpcv(module, params0, train_x, yy, 50, 0.01,
                              "ngvi")
        p_adam, _ = _fit_gpcv(module, params0, train_x, yy, 500, 0.01,
                              "adam")
        elbo_ngvi = float(module.elbo(p_ngvi, train_x, yy))
        elbo_adam = float(module.elbo(p_adam, train_x, yy))
        assert elbo_ngvi >= elbo_adam - 0.01, (elbo_ngvi, elbo_adam)

    def test_param_structure_and_hyper_learning(self):
        """The fitted pytree keeps the Adam path's exact leaf structure
        (warm_start / GPCVState compatibility) and the hyperparameter
        block actually trains (kernel vol moves off its init)."""
        train_x, f, _ = _sabr(150)
        yy = scaled_returns(train_x, f)
        module = GPCVModel(kernel="bm", q="tridiag")
        params0 = module.init(train_x, yy)
        params, losses = ngvi_tridiag_fit(module, params0, train_x, yy, 40)
        assert set(params.keys()) == set(params0.keys())
        for k in params0:
            assert jax.tree.map(jnp.shape, params[k]) == jax.tree.map(
                jnp.shape, params0[k]
            ), k
        assert losses.shape == (40,)
        assert float(losses[-1]) < float(losses[0])
        assert not np.allclose(np.asarray(params["kernel"]["raw_vol"]),
                               np.asarray(params0["kernel"]["raw_vol"]))

    def test_cv_likelihood_ngvi(self):
        """NGVI with the cv (softplus-mixture) likelihood: the curvature
        floor keeps the precision SPD and the mixture parameters train in
        the hyper block; recovery stays sane."""
        train_x, f, v_true = _sabr(300)
        vol = learn_gpcv(train_x, f, train_iters=80, param="cv",
                         key=jax.random.key(3))
        err = float(np.mean(np.abs(np.asarray(vol) - v_true) / v_true))
        assert np.all(np.isfinite(np.asarray(vol)))
        assert err < 0.5, err

    def test_ngvi_requires_tridiag(self):
        with pytest.raises(ValueError, match="tridiag"):
            learn_gpcv(jnp.arange(20.0) * DT + DT,
                       jnp.ones(21, jnp.float32), train_iters=2,
                       q="full", opt="ngvi")
        module = GPCVModel(kernel="bm", q="full")
        with pytest.raises(ValueError, match="tridiag"):
            ngvi_tridiag_fit(module, {}, None, None, 1)

    def test_pipeline_ngvi_branch(self):
        """The batched pipeline's opt-in NGVI branch (the long-series
        recipe: gpcv_opt="ngvi" with a small gpcv_iters — BENCH_SCALING
        round 5; the throughput default stays the reference-protocol
        Adam).  End-to-end finite, ok lanes up, and close to the Adam
        config's forecast fan at matched draws."""
        import dataclasses

        from volt_tpu.parallel import PipelineConfig, fit_forecast

        rng = np.random.default_rng(11)
        n = 80
        rets = 0.2 * np.sqrt(DT) * rng.standard_normal(n)
        prices = 100.0 * np.exp(np.cumsum(rets)).astype(np.float32)
        x = jnp.arange(n - 1, dtype=jnp.float32) * DT + DT
        tx = x[-1] + DT * jnp.arange(1, 6)
        adam_cfg = PipelineConfig(gpcv_iters=150, vol_iters=30,
                                  data_iters=30, nsample=128, k=10,
                                  output="quantiles")
        assert adam_cfg.gpcv_opt == "adam"  # the throughput default
        ngvi_cfg = dataclasses.replace(adam_cfg, gpcv_opt="ngvi",
                                       gpcv_iters=30)
        out_a, aux_a = fit_forecast(jax.random.key(0), x,
                                    jnp.asarray(prices), tx, adam_cfg)
        out_n, aux_n = fit_forecast(jax.random.key(0), x,
                                    jnp.asarray(prices), tx, ngvi_cfg)
        assert bool(aux_n["ok"]) and bool(aux_a["ok"])
        assert np.isfinite(np.asarray(out_n)).all()
        # both configs infer the same (constant-ish) vol regime: the
        # median forecast fans agree to a few percent of price level
        np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_a),
                                   rtol=0.08)

    def test_batched_under_vmap(self):
        """The pipeline vmaps the fit over assets — the NGVI scan must be
        vmap-clean and keep per-asset lanes independent."""
        rng = np.random.default_rng(7)
        n = 80
        rets = 0.2 * np.sqrt(DT) * rng.standard_normal((3, n))
        prices = 100.0 * np.exp(np.cumsum(rets, axis=-1)).astype(np.float32)
        train_x = jnp.arange(n - 1, dtype=jnp.float32) * DT + DT
        module = GPCVModel(kernel="bm", q="tridiag")

        def fit_one(py):
            yy = scaled_returns(train_x, py)
            params0 = module.init(train_x, yy)
            params, losses = ngvi_tridiag_fit(module, params0, train_x, yy,
                                              15)
            return losses[-1]

        batched = jax.vmap(fit_one)(jnp.asarray(prices))
        single = jnp.stack([fit_one(jnp.asarray(p)) for p in prices])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                                   rtol=2e-4, atol=2e-4)
