"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference offers no fake backend (SURVEY.md §4); the TPU-world
equivalent is XLA's host-platform device virtualization.  This must run
before the first ``import jax`` anywhere in the test session.
"""

import os

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
jax.config.update("jax_platforms", "cpu")
if jax._src.xla_bridge.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(2019)
