"""Device-mesh helpers.

Conventions: a 2-D logical mesh ``(asset, path)`` — the asset axis carries
the embarrassingly-parallel per-ticker fits (data parallelism over the
batched-GP leading dim), the path axis carries Monte-Carlo sample paths
during rollouts.  On a pod slice both axes ride ICI; across slices
``jax.distributed`` + DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "multihost_initialize"]


def make_mesh(axis_sizes=None, axis_names=("asset", "path"), devices=None):
    """Build a :class:`jax.sharding.Mesh`.

    ``axis_sizes=None`` puts every device on the first axis.  Pass e.g.
    ``(4, 2)`` to split 8 devices into 4-way asset x 2-way path.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def multihost_initialize(**kwargs):
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough.

    A no-op when running single-process (the common case on one slice).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process run without coordinator env — fine.
        pass
