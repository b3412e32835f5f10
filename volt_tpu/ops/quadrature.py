"""Gauss–Hermite quadrature for expected log-likelihoods.

The GPCV stage evaluates ``E_{f ~ N(mu, s2)}[log p(y | f)]`` with 75-node
Gauss–Hermite quadrature (reference ``train_utils.py:52`` runs the ELBO under
``gpytorch.settings.num_gauss_hermite_locs(75)``).  Node placement matches
the reference's quadrature: physicists' Hermite nodes ``x_i`` / weights
``w_i`` with ``f`` evaluated at ``sqrt(2) * sigma * x_i + mu`` and weights
``w_i / sqrt(pi)``.

Nodes are computed once in float64 on the host and baked into the jitted
computation as constants; the quadrature itself is a single fused
``(nodes, ...)`` broadcast + reduction — pure VPU work that XLA fuses into
the surrounding ELBO.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_hermite_nodes", "expected_value", "DEFAULT_NUM_LOCS"]

DEFAULT_NUM_LOCS = 75


@lru_cache(maxsize=8)
def _hermgauss(n: int):
    x, w = np.polynomial.hermite.hermgauss(n)
    return x, w / np.sqrt(np.pi)


def gauss_hermite_nodes(num_locs: int = DEFAULT_NUM_LOCS, dtype=jnp.float32):
    """Return ``(locations, normalized_weights)`` as jnp arrays."""
    x, w = _hermgauss(num_locs)
    return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)


def expected_value(fn, mean, var, num_locs: int = DEFAULT_NUM_LOCS):
    """``E_{f ~ N(mean, var)}[fn(f)]`` by Gauss–Hermite quadrature.

    ``mean``/``var`` may have any (matching) shape; ``fn`` must be
    broadcast-safe over a new leading node axis.  Returns an array shaped
    like ``mean``.
    """
    mean = jnp.asarray(mean)
    var = jnp.asarray(var)
    locs, weights = gauss_hermite_nodes(num_locs, dtype=mean.dtype)
    # (num_locs, *mean.shape)
    shape = (num_locs,) + (1,) * mean.ndim
    shifted = jnp.sqrt(2.0 * var) * locs.reshape(shape) + mean
    vals = fn(shifted)
    # HIGHEST: on TPU the default bf16 contraction loses ~2 decimal digits
    # of the ELBO (and its gradients) — the node weights span 1e-20..1e0.
    return jnp.tensordot(weights, vals, axes=(0, 0),
                         precision=jax.lax.Precision.HIGHEST)
