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

import jax

__all__ = ["configure_backend"]


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
