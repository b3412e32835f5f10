"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference offers no fake backend (SURVEY.md §4); the TPU-world
equivalent is XLA's host-platform device virtualization.  This must run
before the first ``import jax`` anywhere in the test session.
"""

import os

# VOLT_TPU_TESTS=1 leaves the real TPU backend in place for the opt-in
# on-chip smoke lane (`pytest -m tpu`, tests/test_tpu_smoke.py); the
# default suite runs on 8 virtual CPU devices.  `=0`/`=false` count as
# off (the conventional env idiom), not as "non-empty therefore on".
_TPU_LANE = os.environ.get("VOLT_TPU_TESTS", "").lower() not in (
    "", "0", "false", "no",
)

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers a TPU PJRT plugin and force-selects it
# via jax.config (overriding JAX_PLATFORMS from the environment), so the
# config must be re-pointed at CPU explicitly after import.
if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    if jax._src.xla_bridge.backends_are_initialized():  # pragma: no cover
        from jax.extend.backend import clear_backends

        clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    On this image the XLA:CPU backend segfaults *inside compilation*
    (``backend_compile_and_load``) once a single long-lived process has
    accumulated a few hundred compiled programs — deterministically at
    the same test in a full-suite run, never in isolation or in any
    half-suite bisect (2026-08-19: three full-run crashes, all compiling
    ``learn_gpcv`` at ``test_pipeline.py``; 8 MB vs unlimited stack made
    no difference, 128 GB RAM free).  Clearing the jit caches between
    modules caps the accumulation; the cost is re-jitting shared helpers
    per module (~1-2 min over the suite).
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(2019)


@pytest.fixture(scope="session")
def std_fitted():
    """Standard fitted pipeline shared across test files.

    One SABR series (N=72, seed 77) fitted once per session with the
    standard smoke iteration budget (gpcv 60, vol 60, ewma-k20 magpie 40).
    Sharing the exact (shape, iters, config) tuple means every consumer
    reuses both the compiled programs and the fit itself — the single
    biggest suite wall-time lever on this one-CPU image.
    Returns (train_x, train_y, test_x, vol, vol_state, ewma_model).
    """
    import jax.numpy as jnp
    from volt_tpu.data import sabr_paths
    from volt_tpu.train import learn_gpcv, train_vol_model, train_volt_magpie

    n, h, dt = 72, 10, 1.0 / 252
    f, _ = sabr_paths(steps=n + 1, seed=77)
    train_y = jnp.asarray(f)
    train_x = jnp.arange(n, dtype=jnp.float32) * dt
    test_x = jnp.arange(h, dtype=jnp.float32) * dt + train_x[-1] + dt
    vol = learn_gpcv(train_x, train_y, train_iters=60)
    vol_state = train_vol_model(train_x, vol, train_iters=60)
    model = train_volt_magpie(train_x, train_y[1:], vol_state, vol,
                              train_iters=40, k=20, mean_func="ewma")
    return train_x, train_y, test_x, vol, vol_state, model
