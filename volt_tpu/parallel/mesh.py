"""Device-mesh helpers.

Conventions: a 2-D logical mesh ``(asset, path)`` — the asset axis carries
the embarrassingly-parallel per-ticker fits (data parallelism over the
batched-GP leading dim), the path axis carries Monte-Carlo sample paths
during rollouts.  On a pod slice both axes ride ICI; across slices
``jax.distributed`` + DCN.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "multihost_initialize"]


def make_mesh(axis_sizes=None, axis_names=("asset", "path"), devices=None):
    """Build a :class:`jax.sharding.Mesh`.

    ``axis_sizes=None`` puts every device on the first axis.  Pass e.g.
    ``(4, 2)`` to split 8 devices into 4-way asset x 2-way path.
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} does not cover {n} devices")
    if not explicit:
        # topology-aware placement: on a real slice, naive enumeration-
        # order reshape can put a collective-carrying axis across
        # non-adjacent chips; mesh_utils folds the physical ICI topology
        # into the device array.  Falls back to the plain reshape where
        # no topology info exists (host-platform CPU devices).
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(
                tuple(axis_sizes), devices=devices
            ), axis_names)
        except Exception:
            pass
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


_DISTRIBUTED_INITIALIZED = False

# Environment variables under which ``jax.distributed.initialize()`` can
# auto-detect a multi-process cluster (JAX's own coordination bootstrap plus
# the managed-cluster launchers it recognizes).
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",     # explicit JAX coordination service
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice TPU (DCN) launcher
    "SLURM_JOB_ID",                # SLURM cluster
    "OMPI_MCA_orte_hnp_uri",       # OpenMPI
)


def multihost_initialize(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None,
                         detect: str = "env",
                         **kwargs) -> bool:
    """Multi-host bring-up over DCN (``jax.distributed.initialize``).

    Contract (unit-tested in ``tests/test_parallel.py``):

    * **single-process** — no explicit arguments, ``detect="env"`` and no
      recognized cluster environment variable: returns ``False`` without
      touching the JAX runtime (the common one-slice case; collectives
      inside the slice ride ICI and need no process coordination);
    * **multi-process** — ANY explicit argument (``coordinator_address``,
      ``num_processes``, ``process_id``, or extra kwargs), a recognized
      launcher environment, or ``detect="force"``: calls
      ``jax.distributed.initialize`` and returns ``True``.  Errors
      propagate — a misconfigured cluster must fail loudly, not fall back
      to a silent single-process run;
    * ``detect="force"`` exists because Cloud TPU pods launched via GCE /
      GKE advertise the cluster through the metadata server, not
      environment variables — JAX's own detectors find it, but this
      function's env scan cannot; pass ``detect="force"`` (or any
      explicit argument) on such pods;
    * idempotent — once initialization succeeded, later calls return
      ``False`` and do nothing.
    """
    global _DISTRIBUTED_INITIALIZED
    if detect not in ("env", "force"):
        raise ValueError("detect must be 'env' or 'force'")
    if _DISTRIBUTED_INITIALIZED:
        return False
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or bool(kwargs)
    )
    detected = any(os.environ.get(v) for v in _CLUSTER_ENV_VARS)
    if not explicit and not detected and detect != "force":
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _DISTRIBUTED_INITIALIZED = True
    return True
