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

__all__ = ["configure_backend", "cpu_requested", "scan_unroll",
           "tpu_probe", "tpu_probe_alive"]


# The probe must COMPILE AND FETCH, not just enumerate devices: this
# image's tunnel has failure modes where PJRT init succeeds but the
# remote compiler / transfer path stalls (and block_until_ready never
# syncs on axon — only a device_get fetch is a real barrier).
_PROBE_CODE = (
    "import jax, jax.numpy as jnp, sys; ds = jax.devices(); "
    "v = float(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(())))); "
    "sys.exit(0 if (ds and ds[0].platform != 'cpu' and v == 2.0) else 1)"
)


def cpu_requested() -> bool:
    """True iff ``JAX_PLATFORMS`` in the environment names ONLY cpu.

    A priority list like ``axon,cpu`` (what sitecustomize itself sets) is
    a TPU-first request, not a CPU one — and a dead tunnel HANGS the axon
    entry, so the cpu fallback entry never engages on its own.  Substring
    checks must not treat such a list as an explicit CPU choice.
    """
    plats = [p.strip() for p in
             os.environ.get("JAX_PLATFORMS", "").lower().split(",")
             if p.strip()]
    return bool(plats) and all(p == "cpu" for p in plats)


def tpu_probe(timeout_s: float = 120.0) -> str:
    """Probe the default (TPU) backend: ``"tpu"``, ``"cpu-only"`` or
    ``"timeout"``.

    This image's TPU plugin tunnels device init through a remote service
    that goes dead for hours at a time — and a dead tunnel HANGS device
    init rather than raising.  The only safe check is a subprocess with a
    hard timeout: init the default backend there, compile-and-fetch a
    trivial program, and see what comes back.  The probe must run in a
    subprocess because a hung init in-process is unkillable and would
    wedge the caller exactly the way it is trying to avoid.

    ``"cpu-only"`` means the backend came up promptly but without a
    usable non-CPU device (no TPU plugin on this machine, or the probe
    program failed outright) — on this image's tunnel, transient faults
    manifest as hangs, so a fast failure is treated as definitive and not
    worth retrying; ``"timeout"`` is a (possibly transient) dead tunnel
    and is worth retrying.
    """
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return "tpu" if r.returncode == 0 else "cpu-only"
    except (subprocess.TimeoutExpired, OSError):
        return "timeout"


def tpu_probe_alive(timeout_s: float = 120.0) -> bool:
    """Boolean convenience wrapper over :func:`tpu_probe`."""
    return tpu_probe(timeout_s) == "tpu"


def configure_backend(cache_dir: str = "/tmp/volt_tpu_jax_cache") -> None:
    """Honor an explicit ``JAX_PLATFORMS=cpu`` request; otherwise enable
    the persistent compilation cache for the (default, TPU) backend.

    The cache is TPU-only on purpose: CPU AOT artifacts written through
    this image's remote compiler target a different machine-feature set
    (SIGILL risk — see ``__graft_entry__.py``), and CPU compiles of the
    toy shapes used off-chip are cheap anyway.
    """
    if cpu_requested():
        jax.config.update("jax_platforms", "cpu")
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_unroll(default_tpu: int) -> int:
    """Unroll factor for the latency-bound scans (Kalman MLL, rollout).

    On TPU these scans are dispatch-bound (a handful of elementwise ops
    per step), so unrolling trades HLO size — and therefore first-compile
    time — for measured per-step wins (ladders in ``ops/tridiag.py`` /
    ``rollouts.py``).  ``VOLT_TPU_SCAN_UNROLL`` overrides the per-site
    TPU default for users who care more about time-to-first-forecast
    than steady-state (compile-time ladder: PERFORMANCE.md).  Non-TPU
    backends always get 1: the unrolled HLO roughly doubles CPU compile
    wall for no runtime benefit.

    Read at trace time — set the env var before the first call of the
    process (an already-jitted program keeps the unroll it traced with).
    """
    if jax.default_backend() != "tpu":
        return 1
    raw = os.environ.get("VOLT_TPU_SCAN_UNROLL", "")
    try:
        return max(1, int(raw)) if raw else default_tpu
    except ValueError:
        return default_tpu
