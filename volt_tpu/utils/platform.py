"""Backend selection for benchmark/measurement scripts.

This image's ``sitecustomize`` force-selects its TPU PJRT plugin through
``jax.config``, so the ``JAX_PLATFORMS`` env var alone does NOT switch
the backend (see CLAUDE.md) — and merely *initializing* the TPU plugin
blocks on the tunnel, hanging outright when the tunnel is degraded.
Scripts therefore call :func:`configure_backend` immediately after
``import jax`` and before any device use.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax

__all__ = ["configure_backend", "tpu_probe_alive"]


_PROBE_CODE = (
    "import jax, sys; ds = jax.devices(); "
    "sys.exit(0 if ds and ds[0].platform != 'cpu' else 1)"
)


def tpu_probe_alive(timeout_s: float = 120.0) -> bool:
    """Is the default (TPU) backend actually reachable right now?

    This image's TPU plugin tunnels device init through a remote service
    that goes dead for hours at a time — and a dead tunnel HANGS device
    init rather than raising.  The only safe check is a subprocess with a
    hard timeout: init the default backend there and see whether it comes
    up as a non-CPU platform in time.  The probe must run in a subprocess
    because a hung init in-process is unkillable and would wedge the
    caller exactly the way it is trying to avoid.
    """
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def configure_backend(cache_dir: str = "/tmp/volt_tpu_jax_cache") -> None:
    """Honor an explicit ``JAX_PLATFORMS=cpu`` request; otherwise enable
    the persistent compilation cache for the (default, TPU) backend.

    The cache is TPU-only on purpose: CPU AOT artifacts written through
    this image's remote compiler target a different machine-feature set
    (SIGILL risk — see ``__graft_entry__.py``), and CPU compiles of the
    toy shapes used off-chip are cheap anyway.
    """
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
