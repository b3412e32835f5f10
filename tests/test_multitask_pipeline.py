"""The productized Kronecker multitask pipeline (parallel/pipeline_multitask).

Round-4 verdict item 3: the multitask chain (joint GPCV -> Kronecker vol
GP -> per-task Volt fits -> correlated rollouts) had to be hand-assembled,
refit cold every window, and returned raw samples only.  These tests pin
the product wrapper to single-task pipeline parity: config surface,
quantile delivery, per-task ok lanes, mesh sharding, warm starts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.parallel import (
    MultitaskPipelineConfig,
    fit_forecast_multitask,
    make_mesh,
    warm_start_multitask,
)

DT = 1.0 / 252.0


def _universe(T=4, n=64, seed=0, vol=0.2):
    rng = np.random.default_rng(seed)
    # one shared market factor + idiosyncratic noise: correlated tasks,
    # the regime the rank-1 IndexKernel models
    common = rng.standard_normal(n)
    idio = rng.standard_normal((T, n))
    rets = vol * np.sqrt(DT) * (0.7 * common + 0.7 * idio)
    prices = 100.0 * np.exp(np.cumsum(rets, axis=-1)).astype(np.float32)
    train_x = jnp.arange(n - 1, dtype=jnp.float32) * DT + DT
    return train_x, jnp.asarray(prices)


CFG = MultitaskPipelineConfig(gpcv_iters=25, vol_iters=25, data_iters=25,
                              nsample=40)


class TestColdFit:
    def test_quantiles_delivery(self):
        train_x, prices = _universe()
        h = 6
        test_x = train_x[-1] + DT * jnp.arange(1, h + 1)
        cfg = MultitaskPipelineConfig(gpcv_iters=25, vol_iters=25,
                                      data_iters=25, nsample=40,
                                      output="quantiles")
        out, aux = fit_forecast_multitask(jax.random.key(0), train_x,
                                          prices, test_x, cfg)
        levels = cfg.quantile_levels
        assert out.shape == (4, len(levels), h)
        assert bool(jnp.all(jnp.isfinite(out)))
        assert np.asarray(aux["ok"]).all()
        # the fan is monotone across levels at every (task, step)
        fans = np.asarray(out)
        assert (np.diff(fans, axis=-2) >= -1e-6).all()
        assert aux["forecast_mean"].shape == (4, h)
        assert aux["forecast_std"].shape == (4, h)
        assert aux["vols"].shape == (4, train_x.shape[-1])

    def test_samples_delivery(self):
        train_x, prices = _universe(T=3)
        test_x = train_x[-1] + DT * jnp.arange(1, 5)
        out, aux = fit_forecast_multitask(jax.random.key(1), train_x,
                                          prices, test_x, CFG)
        assert out.shape == (3, CFG.nsample, 4)
        assert bool(jnp.all(jnp.isfinite(out)))
        # log-price paths continue from each task's own last price
        last = np.log(np.asarray(prices)[:, -1])
        first_step = np.asarray(out)[..., 0].mean(axis=-1)
        np.testing.assert_allclose(first_step, last, atol=0.05)

    def test_invalid_output_raises(self):
        train_x, prices = _universe(T=2, n=32)
        test_x = train_x[-1] + DT * jnp.arange(1, 3)
        with pytest.raises(ValueError, match="output"):
            fit_forecast_multitask(
                jax.random.key(0), train_x, prices, test_x,
                MultitaskPipelineConfig(gpcv_iters=1, vol_iters=1,
                                        data_iters=1, nsample=2,
                                        output="bogus"),
            )


class TestWarmStart:
    def test_same_window_refit_improves(self):
        """A warm refit of the same window continues descending the joint
        ELBO — the live-serving contract (reference: every window refits
        cold, GenerateMultiMeanPreds.py:63-137)."""
        train_x, prices = _universe()
        test_x = train_x[-1] + DT * jnp.arange(1, 4)
        out, aux = fit_forecast_multitask(jax.random.key(0), train_x,
                                          prices, test_x, CFG)
        ws = warm_start_multitask(aux)
        out2, aux2 = fit_forecast_multitask(jax.random.key(1), train_x,
                                            prices, test_x, CFG,
                                            init_params=ws)
        assert np.asarray(aux2["ok"]).all()
        assert float(aux2["gpcv_loss"]) <= float(aux["gpcv_loss"]) + 1e-4

    def test_shifted_window(self):
        """shift>0 slides per-datum GPCV leaves with the window; the
        refit stays finite and fast from the carried state."""
        _, prices = _universe(n=66)  # (T, 66): two 65-price windows
        n = 64  # return-grid length of each window
        train_x = jnp.arange(n, dtype=jnp.float32) * DT + DT
        test_x = train_x[-1] + DT * jnp.arange(1, 4)
        _, aux = fit_forecast_multitask(jax.random.key(0), train_x,
                                        prices[:, :n + 1], test_x, CFG)
        ws = warm_start_multitask(aux, shift=1, n=n)
        out2, aux2 = fit_forecast_multitask(jax.random.key(1), train_x,
                                            prices[:, 1:n + 2], test_x, CFG,
                                            init_params=ws)
        assert np.asarray(aux2["ok"]).all()
        assert bool(jnp.all(jnp.isfinite(out2)))

    def test_shift_requires_n(self):
        train_x, prices = _universe(T=2, n=32)
        test_x = train_x[-1] + DT * jnp.arange(1, 3)
        _, aux = fit_forecast_multitask(jax.random.key(0), train_x, prices,
                                        test_x, CFG)
        with pytest.raises(ValueError, match="needs n"):
            warm_start_multitask(aux, shift=2)

    def test_full_family_warm_start_shift(self):
        """The dense (n, n) data-factor root shifts along both axes."""
        train_x, prices = _universe(T=2, n=33)
        test_x = train_x[-1] + DT * jnp.arange(1, 3)
        cfg = MultitaskPipelineConfig(gpcv_iters=10, vol_iters=10,
                                      data_iters=10, nsample=10,
                                      gpcv_q="full")
        _, aux = fit_forecast_multitask(jax.random.key(0), train_x, prices,
                                        test_x, cfg)
        ws = warm_start_multitask(aux, shift=1, n=train_x.shape[-1])
        root = ws["gpcv"]["model"]["variational_covar_root"]
        assert root.shape == (train_x.shape[-1], train_x.shape[-1])
        out2, aux2 = fit_forecast_multitask(jax.random.key(1), train_x,
                                            prices, test_x, cfg,
                                            init_params=ws)
        assert np.asarray(aux2["ok"]).all()


class TestMesh:
    def test_sharded_matches_unsharded(self, devices):
        """The full multitask program under an (asset, path) mesh returns
        the same quantile fans as the unsharded run."""
        train_x, prices = _universe(T=8, n=48)
        test_x = train_x[-1] + DT * jnp.arange(1, 5)
        cfg = MultitaskPipelineConfig(gpcv_iters=10, vol_iters=10,
                                      data_iters=10, nsample=16,
                                      output="quantiles")
        out_ref, aux_ref = fit_forecast_multitask(
            jax.random.key(0), train_x, prices, test_x, cfg
        )
        mesh = make_mesh((4, 2), devices=devices)
        out_sh, aux_sh = fit_forecast_multitask(
            jax.random.key(0), train_x, prices, test_x, cfg, mesh=mesh
        )
        np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-4)
        assert np.asarray(aux_sh["ok"]).all()
