"""Sharded multi-asset pipeline tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volt_tpu.data import sabr_paths
from volt_tpu.parallel import (
    PipelineConfig,
    fit_forecast,
    fit_forecast_batch,
    make_mesh,
)

N, H = 60, 6
DT = 1.0 / 252
CFG = PipelineConfig(gpcv_iters=20, vol_iters=20, data_iters=10, k=20,
                     nsample=16)


@pytest.fixture(scope="module")
def batch_data():
    f, _ = sabr_paths(steps=N + 1, seed=7, n_paths=8)
    train_x = jnp.arange(N, dtype=jnp.float32) * DT
    test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
    return train_x, jnp.asarray(f), test_x


class TestPipeline:
    def test_single_asset(self, batch_data):
        train_x, ys, test_x = batch_data
        samples, aux = fit_forecast(jax.random.key(0), train_x, ys[0],
                                    test_x, CFG)
        assert samples.shape == (16, H)
        assert bool(jnp.all(jnp.isfinite(samples)))
        assert np.isfinite(float(aux["gpcv_loss"]))

    def test_batch_unsharded(self, batch_data):
        train_x, ys, test_x = batch_data
        samples, aux = fit_forecast_batch(jax.random.key(0), train_x, ys,
                                          test_x, CFG)
        assert samples.shape == (8, 16, H)
        assert bool(jnp.all(jnp.isfinite(samples)))
        assert aux["ok"].shape == (8,) and bool(jnp.all(aux["ok"]))

    def test_fbm_kernel_config_resolves(self, batch_data):
        # Regression: the tridiag/spectral BM-only defaults must downgrade
        # for kernel="fbm" instead of raising at trace time.
        train_x, ys, test_x = batch_data
        cfg = PipelineConfig(gpcv_iters=5, vol_iters=5, data_iters=5,
                             k=10, nsample=4, kernel="fbm")
        samples, aux = fit_forecast(jax.random.key(0), train_x, ys[0],
                                    test_x, cfg)
        assert samples.shape == (4, H)
        assert np.isfinite(np.asarray(samples)).all()

    def test_fit_forecast_rejects_irregular_grid(self, batch_data):
        # The single-asset entry point guards spectral grids too, not
        # just the batch wrapper.
        _, ys, test_x = batch_data
        rng = np.random.default_rng(0)
        bad_x = jnp.asarray(np.cumsum(0.001 + 0.004 * rng.random(N))
                            .astype(np.float32))
        with pytest.raises(ValueError, match="vol_mll"):
            fit_forecast(jax.random.key(0), bad_x, ys[0],
                         test_x, CFG)

    def test_per_asset_failure_isolation(self, batch_data):
        # The reference skips failed tickers with try/except
        # (LSTMGenerator.py:35,67-68); here a poisoned asset (non-positive
        # prices => NaN log returns) must flag ok=False on its own lane
        # while every other asset stays finite and usable.
        train_x, ys, test_x = batch_data
        poisoned = ys.at[3].set(jnp.zeros_like(ys[3]))
        samples, aux = fit_forecast_batch(jax.random.key(0), train_x,
                                          poisoned, test_x, CFG)
        ok = np.asarray(aux["ok"])
        assert not ok[3]
        keep = [i for i in range(8) if i != 3]
        assert ok[keep].all()
        assert np.isfinite(np.asarray(samples)[keep]).all()

    def test_batch_sharded_over_mesh(self, batch_data, devices):
        train_x, ys, test_x = batch_data
        mesh = make_mesh((4, 2), devices=devices)
        samples, aux = fit_forecast_batch(jax.random.key(0), train_x, ys,
                                          test_x, CFG, mesh=mesh)
        assert samples.shape == (8, 16, H)
        assert bool(jnp.all(jnp.isfinite(samples)))
        # the asset axis must actually be distributed
        shard_devices = {s.device for s in samples.addressable_shards}
        assert len(shard_devices) == 8

    def test_sharded_matches_unsharded(self, batch_data, devices):
        train_x, ys, test_x = batch_data
        mesh = make_mesh((8, 1), devices=devices)
        s1, _ = fit_forecast_batch(jax.random.key(1), train_x, ys, test_x,
                                   CFG)
        s2, _ = fit_forecast_batch(jax.random.key(1), train_x, ys, test_x,
                                   CFG, mesh=mesh)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-4)


class TestOptionPricingAtScale:
    def test_price_grid_sharded(self, batch_data, devices):
        from volt_tpu.parallel import price_options_batch
        import numpy as np

        train_x, ys, test_x = batch_data
        mesh = None
        strikes = jnp.asarray([80.0, 100.0, 120.0])
        expiries = jnp.asarray([2, 5])
        realized = np.asarray(ys)[:, -1:] * np.ones((1, 2))
        out = price_options_batch(
            jax.random.key(0), train_x, ys, test_x, strikes, expiries,
            CFG, mesh=make_mesh((4, 2), devices=devices),
            realized=realized,
        )
        values = np.asarray(out["values"])
        assert values.shape == (8, 3, 2)
        assert np.isfinite(values).all() and (values >= 0).all()
        # monotone decreasing in strike
        assert (np.diff(values, axis=1) <= 1e-5).all()
        pct = np.asarray(out["percentiles"])
        assert pct.shape == (8, 2)
        assert ((pct >= 0) & (pct <= 1)).all()


class TestMultihostInitialize:
    """Contract of the DCN bring-up helper (``parallel/mesh.py``)."""

    def test_single_process_is_noop(self, monkeypatch):
        from volt_tpu.parallel import mesh as mesh_mod

        for v in mesh_mod._CLUSTER_ENV_VARS:
            monkeypatch.delenv(v, raising=False)
        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **k: called.append((a, k)),
        )
        assert mesh_mod.multihost_initialize() is False
        assert called == []  # never touches the runtime single-process

    def test_explicit_coordinator_initializes(self, monkeypatch):
        from volt_tpu.parallel import mesh as mesh_mod

        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **k: calls.append(k),
        )
        monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
        assert mesh_mod.multihost_initialize(
            coordinator_address="10.0.0.1:1234", num_processes=2,
            process_id=0,
        ) is True
        assert calls[0]["coordinator_address"] == "10.0.0.1:1234"
        # idempotent: second call is a no-op
        assert mesh_mod.multihost_initialize(
            coordinator_address="10.0.0.1:1234") is False
        assert len(calls) == 1

    def test_cluster_env_triggers_and_errors_propagate(self, monkeypatch):
        from volt_tpu.parallel import mesh as mesh_mod

        monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")

        def boom(**k):
            raise RuntimeError("cluster misconfigured")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="misconfigured"):
            mesh_mod.multihost_initialize()

    def test_partial_explicit_args_count(self, monkeypatch):
        # num_processes/process_id alone must reach initialize, not be
        # silently dropped by the explicit-arg detection.
        from volt_tpu.parallel import mesh as mesh_mod

        for v in mesh_mod._CLUSTER_ENV_VARS:
            monkeypatch.delenv(v, raising=False)
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **k: calls.append(k))
        monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
        assert mesh_mod.multihost_initialize(num_processes=4,
                                             process_id=1) is True
        assert calls[0]["num_processes"] == 4
        assert calls[0]["process_id"] == 1

    def test_force_detect_for_metadata_clusters(self, monkeypatch):
        # GCE/GKE TPU pods advertise the cluster via the metadata server
        # (no env vars); detect="force" hands off to JAX's own detectors.
        from volt_tpu.parallel import mesh as mesh_mod

        for v in mesh_mod._CLUSTER_ENV_VARS:
            monkeypatch.delenv(v, raising=False)
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **k: calls.append(k))
        monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
        assert mesh_mod.multihost_initialize(detect="force") is True
        assert len(calls) == 1
        with pytest.raises(ValueError, match="detect"):
            mesh_mod.multihost_initialize(detect="nope")


class TestDeterminism:
    def test_same_key_same_forecasts(self, batch_data):
        train_x, ys, test_x = batch_data
        s1, _ = fit_forecast_batch(jax.random.key(7), train_x, ys, test_x,
                                   CFG)
        s2, _ = fit_forecast_batch(jax.random.key(7), train_x, ys, test_x,
                                   CFG)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_different_keys_differ(self, batch_data):
        train_x, ys, test_x = batch_data
        s1, _ = fit_forecast_batch(jax.random.key(1), train_x, ys, test_x,
                                   CFG)
        s2, _ = fit_forecast_batch(jax.random.key(2), train_x, ys, test_x,
                                   CFG)
        assert float(np.abs(np.asarray(s1) - np.asarray(s2)).max()) > 1e-4
