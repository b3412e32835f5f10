"""Checkpointing, profiling, wind parsing, and static-config utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.data.wind import parse_uscrn_rows
from volt_tpu.kernels import BMKernel, MaternKernel
from volt_tpu.means import EWMAMean
from volt_tpu.utils.checkpoint import restore_volt_state, save_volt_state
from volt_tpu.utils.profiling import timed


class TestConfigEq:
    def test_equal_configs_hash_equal(self):
        assert BMKernel(vol=0.2) == BMKernel(vol=0.2)
        assert hash(BMKernel(vol=0.2)) == hash(BMKernel(vol=0.2))
        assert BMKernel(vol=0.2) != BMKernel(vol=0.3)
        assert EWMAMean(20) == EWMAMean(20)
        assert EWMAMean(20) != EWMAMean(21)
        assert BMKernel() != MaternKernel()

    def test_no_retrace_across_instances(self):
        calls = {"n": 0}

        import functools

        @functools.partial(jax.jit, static_argnames=("kern",))
        def f(kern, params, x):
            calls["n"] += 1
            return kern(params, x)

        x = jnp.linspace(0.1, 1.0, 8)
        f(BMKernel(), BMKernel().init(), x)
        f(BMKernel(), BMKernel().init(), x)  # fresh instances, same config
        assert calls["n"] == 1


class TestCheckpoint:
    def test_volt_state_roundtrip(self, tmp_path, std_fitted):
        train_x, train_y, _, vol, vol_state, model = std_fitted
        f = np.asarray(train_y)
        dt = 1.0 / 252

        path = str(tmp_path / "ckpt")
        save_volt_state(path, model)
        restored = restore_volt_state(path, model.module,
                                      vol_state.module)
        np.testing.assert_allclose(restored.train_y, model.train_y)
        np.testing.assert_allclose(restored.log_vol_path,
                                   model.log_vol_path)
        np.testing.assert_allclose(
            restored.params["likelihood"]["raw_noise"],
            model.params["likelihood"]["raw_noise"],
        )
        # the restored state forecasts identically
        from volt_tpu.rollouts import rollouts

        test_x = jnp.arange(4, dtype=jnp.float32) * dt + train_x[-1] + dt
        s1 = rollouts(jax.random.key(0), model, train_x, jnp.asarray(f),
                      test_x, nsample=8)
        s2 = rollouts(jax.random.key(0), restored, train_x, jnp.asarray(f),
                      test_x, nsample=8)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


    def test_multitask_state_roundtrip(self, tmp_path):
        from volt_tpu.models.multitask import (MultitaskBMGP,
                                               MultitaskBMGPState)
        from volt_tpu.utils.checkpoint import restore_pytree, save_pytree

        t, n = 3, 12
        mt = MultitaskBMGP(num_tasks=t, rank=1)
        params = mt.init(key=jax.random.key(2))
        x = jnp.arange(n, dtype=jnp.float32) * 0.01
        y = jnp.log(0.2) + 0.1 * jax.random.normal(jax.random.key(3),
                                                   (n, t))
        state = mt.fit_state(params, x, y)

        path = str(tmp_path / "mt_ckpt")
        tree = {"params": state.params, "train_x": state.train_x,
                "train_y": state.train_y}
        save_pytree(path, tree)
        like = {"params": mt.init(key=jax.random.key(0)),
                "train_x": jnp.zeros_like(x), "train_y": jnp.zeros_like(y)}
        restored_tree = restore_pytree(path, like)
        restored = MultitaskBMGPState(module=mt, **restored_tree)
        s1 = state.sample_forecast(jax.random.key(5), x[-1] + x[:4] + 0.01,
                                   (6,))
        s2 = restored.sample_forecast(jax.random.key(5),
                                      x[-1] + x[:4] + 0.01, (6,))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


class TestProfiling:
    def test_timed(self):
        fn = jax.jit(lambda x: x * 2.0)
        out, secs = timed(fn, jnp.ones(16))
        np.testing.assert_allclose(out, 2.0)
        assert secs >= 0


class TestWindParsing:
    def test_complete_record(self):
        ncols = 25
        rows = []
        for i in range(105_120):
            cols = ["0"] * ncols
            # USCRN subhourly layout: tokens 3/4 are LST_DATE/LST_TIME,
            # 6/7 are LONGITUDE/LATITUDE (notebook iloc[0, 6]/[0, 7])
            cols[3], cols[4] = "20210101", "0005"
            cols[6], cols[7] = "-100.5", "40.1"
            cols[21] = "-99.0" if i % 7 == 0 else "3.5"
            rows.append(" ".join(cols))
        parsed = parse_uscrn_rows(rows)
        assert parsed is not None
        lonlat, wind = parsed
        assert lonlat == (-100.5, 40.1)
        assert wind.shape == (105_120,)
        assert wind[0] == 0.0 and wind[1] == pytest.approx(3.5)

    def test_incomplete_record_filtered(self):
        assert parse_uscrn_rows(["1 2 3"] * 100) is None
