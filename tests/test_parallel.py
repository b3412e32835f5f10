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
    warm_start,
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

    def test_fbm_batch_sharded_over_mesh(self, batch_data, devices):
        # The non-Markov pipeline (dense q, increment-domain prior
        # factorization — ops/fbm.py) batched AND sharded: all lanes must
        # fit cleanly, not just trace.
        train_x, ys, test_x = batch_data
        cfg = PipelineConfig(gpcv_iters=5, vol_iters=5, data_iters=5,
                             k=10, nsample=4, kernel="fbm")
        mesh = make_mesh((4, 1), devices=devices[:4])
        samples, aux = fit_forecast_batch(jax.random.key(0), train_x, ys,
                                          test_x, cfg, mesh=mesh)
        assert samples.shape == (8, 4, H)
        assert bool(jnp.all(jnp.isfinite(samples)))
        assert bool(jnp.all(aux["ok"]))

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

    def test_failure_isolation_in_quantiles_mode(self, batch_data):
        # same contract as test_per_asset_failure_isolation, but through
        # the round-3 default delivery: the poisoned asset's fan is its
        # own problem, flagged by ok=False; other fans stay finite.
        import dataclasses

        train_x, ys, test_x = batch_data
        poisoned = ys.at[5].set(jnp.zeros_like(ys[5]))
        cfg = dataclasses.replace(CFG, output="quantiles")
        fan, aux = fit_forecast_batch(jax.random.key(0), train_x,
                                      poisoned, test_x, cfg)
        ok = np.asarray(aux["ok"])
        assert not ok[5]
        keep = [i for i in range(8) if i != 5]
        assert ok[keep].all()
        assert np.isfinite(np.asarray(fan)[keep]).all()

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

    def test_quantiles_output_matches_samples(self, batch_data):
        # Same key => identical MC stage; the on-device fan must equal the
        # host-side quantiles of the samples output exactly (the
        # "samples-identical spot check": the reduction changes only WHERE
        # the statistic is computed, not the forecast law).
        train_x, ys, test_x = batch_data
        key = jax.random.key(3)
        samples, _ = fit_forecast_batch(key, train_x, ys, test_x, CFG)
        qcfg = PipelineConfig(**{**CFG.__dict__, "output": "quantiles"})
        fan, aux = fit_forecast_batch(key, train_x, ys, test_x, qcfg)
        levels = jnp.asarray(qcfg.quantile_levels, samples.dtype)
        want = jnp.moveaxis(
            jnp.quantile(samples, levels, axis=-2), 0, 1
        )  # (B, L, H)
        assert fan.shape == (8, len(qcfg.quantile_levels), H)
        np.testing.assert_allclose(np.asarray(fan), np.asarray(want),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(aux["forecast_mean"]),
            np.asarray(jnp.mean(samples, axis=-2)), atol=1e-6)

    def test_quantiles_output_sharded(self, batch_data, devices):
        train_x, ys, test_x = batch_data
        mesh = make_mesh((8, 1), devices=devices)
        qcfg = PipelineConfig(**{**CFG.__dict__, "output": "quantiles"})
        fan, _ = fit_forecast_batch(jax.random.key(3), train_x, ys, test_x,
                                    qcfg, mesh=mesh)
        assert fan.shape == (8, len(qcfg.quantile_levels), H)
        assert bool(jnp.all(jnp.isfinite(fan)))
        assert len({s.device for s in fan.addressable_shards}) == 8

    def test_bad_output_mode_raises(self, batch_data):
        train_x, ys, test_x = batch_data
        cfg = PipelineConfig(**{**CFG.__dict__, "output": "bogus"})
        with pytest.raises(ValueError, match="output"):
            fit_forecast(jax.random.key(0), train_x, ys[0], test_x, cfg)


class TestWarmStart:
    """Online-refit serving path: seed the Adam scans from a previous
    fit's ``aux`` (the reference refits every backtest window from
    scratch, ``GenerateMultiMeanPreds.py:63-137`` — no warm analog)."""

    WARM = PipelineConfig(gpcv_iters=4, vol_iters=4, data_iters=2, k=20,
                          nsample=16)

    def test_same_window_refit_stays_at_optimum(self, batch_data):
        train_x, ys, test_x = batch_data
        _, aux = fit_forecast(jax.random.key(0), train_x, ys[0], test_x,
                              CFG)
        _, aux_w = fit_forecast(jax.random.key(0), train_x, ys[0], test_x,
                                self.WARM, init_params=warm_start(aux))
        assert bool(aux_w["ok"])
        # a few extra steps from the previous optimum barely move the fit
        rel = np.max(np.abs(np.asarray(aux_w["vol"] - aux["vol"]))
                     / np.asarray(aux["vol"]))
        assert rel < 0.10
        # and the warm ELBO starts where the cold fit ended, not at init
        assert float(aux_w["gpcv_losses"][0]) < float(
            aux["gpcv_losses"][0]
        )

    def test_slid_window_matches_cold_refit(self, batch_data):
        # converged budgets: the comparison is "warm + 10x fewer iters
        # tracks a full cold refit", which needs the cold fits near their
        # optima (the module-level 20-iter CFG is a smoke budget)
        cold = PipelineConfig(gpcv_iters=60, vol_iters=60, data_iters=40,
                              k=20, nsample=16)
        warm = PipelineConfig(gpcv_iters=6, vol_iters=6, data_iters=4,
                              k=20, nsample=16)
        train_x, _, test_x = batch_data
        f, _ = sabr_paths(steps=N + 3, seed=7, n_paths=8)
        prices = jnp.asarray(f)
        _, aux0 = fit_forecast_batch(jax.random.key(0), train_x,
                                     prices[:, :N + 1], test_x, cold)
        ip = warm_start(aux0, shift=2, n=N)
        _, aux_w = fit_forecast_batch(jax.random.key(0), train_x,
                                      prices[:, 2:N + 3], test_x,
                                      warm, init_params=ip)
        _, aux_c = fit_forecast_batch(jax.random.key(0), train_x,
                                      prices[:, 2:N + 3], test_x, cold)
        assert np.asarray(aux_w["ok"]).all()
        rel = (np.abs(np.asarray(aux_w["vol"] - aux_c["vol"]))
               / np.asarray(aux_c["vol"]))
        # 10x fewer iterations tracks the full cold refit: ~5% mean
        # deviation, bounded worst point (measured 0.046 / 0.23 — the
        # worst point sits at the new tail, where 6 warm iters can't
        # fully absorb genuinely new data)
        assert rel.mean() < 0.08
        assert rel.max() < 0.30

    def test_warm_start_full_family_shifts_cholesky(self, batch_data):
        train_x, ys, test_x = batch_data
        cfg = PipelineConfig(**{**CFG.__dict__, "gpcv_q": "full"})
        _, aux = fit_forecast(jax.random.key(0), train_x, ys[0], test_x,
                              cfg)
        ip = warm_start(aux, shift=1, n=N)
        chol = np.asarray(ip["gpcv"]["chol_variational_covar"])
        # the stored param is a raw square matrix whose upper triangle is
        # untrained junk (the model trils at use, models/gpcv.py) — the
        # effective factor is its tril, and warm_start shifts exactly that
        prev = np.tril(np.asarray(aux["gpcv_params"]
                                  ["chol_variational_covar"]))
        assert chol.shape == (N, N)
        np.testing.assert_allclose(chol[:-1, :-1], prev[1:, 1:], rtol=0)
        assert np.all(np.diag(chol) != 0)         # still a full-rank root
        assert np.allclose(chol, np.tril(chol))
        warm_cfg = PipelineConfig(**{**self.WARM.__dict__,
                                     "gpcv_q": "full"})
        f, _ = sabr_paths(steps=N + 2, seed=7, n_paths=8)
        _, aux_w = fit_forecast(jax.random.key(0), train_x,
                                jnp.asarray(f)[0, 1:N + 2], test_x,
                                warm_cfg, init_params=ip)
        assert bool(aux_w["ok"])

    def test_shift_requires_n(self, batch_data):
        train_x, ys, test_x = batch_data
        _, aux = fit_forecast(jax.random.key(0), train_x, ys[0], test_x,
                              CFG)
        with pytest.raises(ValueError, match="needs n"):
            warm_start(aux, shift=1)

    def test_warm_batch_sharded(self, batch_data, devices):
        train_x, ys, test_x = batch_data
        mesh = make_mesh((8, 1))
        _, aux = fit_forecast_batch(jax.random.key(0), train_x, ys, test_x,
                                    CFG, mesh=mesh)
        samples, aux_w = fit_forecast_batch(
            jax.random.key(1), train_x, ys, test_x, self.WARM, mesh=mesh,
            init_params=warm_start(aux),
        )
        assert samples.shape == (8, 16, H)
        assert np.asarray(aux_w["ok"]).all()
        assert len({s.device for s in samples.addressable_shards}) == 8


class TestOptionPricingAtScale:
    def test_price_grid_sharded(self, batch_data, devices):
        from volt_tpu.parallel import price_options_batch

        train_x, ys, test_x = batch_data
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

    def test_rejects_quantile_delivery(self, batch_data):
        """A quantile fan is not MC paths; averaging payoffs over the
        levels would be plausible garbage — must raise."""
        import dataclasses

        train_x, ys, test_x = batch_data
        from volt_tpu.parallel import price_options_batch

        qcfg = dataclasses.replace(CFG, output="quantiles")
        with pytest.raises(ValueError, match="samples"):
            price_options_batch(
                jax.random.key(0), train_x, ys, test_x,
                jnp.asarray([100.0]), jnp.asarray([2]), qcfg,
            )


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


_MULTIPROC_WORKER = r'''
import sys

import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
coord = sys.argv[2]
repo = sys.argv[3]
sys.path.insert(0, repo)

from volt_tpu.parallel import (PipelineConfig, fit_forecast_batch,
                               make_mesh, multihost_initialize)

# the REAL bring-up: coordination service handshake, no mocks
assert multihost_initialize(coordinator_address=coord, num_processes=2,
                            process_id=pid) is True

import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

# a real cross-process collective
psum = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(jnp.ones(4))
assert float(psum[0]) == 8.0, psum

from volt_tpu.data import sabr_paths

N, H = 60, 6
DT = 1.0 / 252
f, _ = sabr_paths(steps=N + 1, seed=7, n_paths=8)
train_x = jnp.arange(N, dtype=jnp.float32) * DT
test_x = jnp.arange(H, dtype=jnp.float32) * DT + train_x[-1] + DT
cfg = PipelineConfig(gpcv_iters=20, vol_iters=20, data_iters=10, k=20,
                     nsample=16)
mesh = make_mesh((8, 1))  # global mesh spanning both processes
samples, aux = fit_forecast_batch(jax.random.key(1), train_x,
                                  jnp.asarray(f), test_x, cfg, mesh=mesh)
assert len(samples.addressable_shards) == 4  # this process's share

from jax.experimental import multihost_utils

gathered = multihost_utils.process_allgather(samples, tiled=True)
ok = multihost_utils.process_allgather(aux["ok"], tiled=True)
assert gathered.shape == (8, 16, H), gathered.shape
assert np.isfinite(np.asarray(gathered)).all()
assert np.asarray(ok).all()
if pid == 0:
    np.save(sys.argv[4], np.asarray(gathered))
print("MULTIPROC-PASS", pid)
'''


@pytest.mark.slow
class TestMultihostRealTwoProcess:
    """The mock-free scale-out story (round-2 verdict item 2): two OS
    processes, a real ``jax.distributed.initialize`` handshake over a
    localhost coordinator, a global 8-device mesh, a cross-process psum,
    and ``fit_forecast_batch`` sharded across the processes."""

    def test_two_process_pipeline(self, tmp_path, batch_data):
        import os
        import socket
        import subprocess
        import sys as _sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        worker = tmp_path / "worker.py"
        worker.write_text(_MULTIPROC_WORKER)
        out_npy = tmp_path / "gathered.npy"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        }
        procs = [
            subprocess.Popen(
                [_sys.executable, str(worker), str(pid), coord, repo,
                 str(out_npy)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
            assert f"MULTIPROC-PASS {pid}" in out

        # cross-process result == this (single-process, 8-virtual-device)
        # run of the identical program
        train_x, ys, test_x = batch_data
        ref, _ = fit_forecast_batch(jax.random.key(1), train_x, ys, test_x,
                                    CFG)
        gathered = np.load(out_npy)
        np.testing.assert_allclose(gathered, np.asarray(ref), atol=2e-4)


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
