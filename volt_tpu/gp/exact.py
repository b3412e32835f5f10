"""Exact-GP marginal likelihood and posterior.

The reference's exact models (BMGP, VoltronGP/VoltMagpie, baselines) all
train by maximizing ``ExactMarginalLogLikelihood`` — the MVN log-density of
the targets under ``K + sigma^2 I``, divided by the number of data points —
and predict with the standard noisy-conditioning formulas.  Here these are
pure functions.

A TPU-specific fast path: during Volt data-model training the covariance is
*fixed* (the vol path is frozen; only mean/noise parameters train —
reference ``train_utils.py:111-114`` freezes everything else), so we
eigendecompose ``K`` once and evaluate every subsequent MLL+grad step in
O(n^2) instead of re-factorizing O(n^3) per iteration.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.chol import psd_safe_cholesky
from ..ops.mvn import conditional, mvn_log_prob_chol

__all__ = [
    "exact_mll",
    "posterior",
    "FixedCovCache",
    "make_fixed_cov_cache",
    "exact_mll_fixed_cov",
]

_LOG_2PI = math.log(2.0 * math.pi)
_HIGHEST = jax.lax.Precision.HIGHEST


def _add_noise(cov, noise):
    n = cov.shape[-1]
    noise = jnp.asarray(noise)
    if noise.ndim and noise.shape[-1] == 1:
        noise = noise[..., 0]
    return cov + noise[..., None, None] * jnp.eye(n, dtype=cov.dtype)


def exact_mll(y, mean, cov, noise, jitter: float | None = None):
    """``log N(y; mean, cov + noise I) / N`` (gpytorch ``ExactMLL`` parity).

    Supports leading batch dims on every argument.
    """
    n = y.shape[-1]
    chol = psd_safe_cholesky(_add_noise(cov, noise), jitter=jitter)
    return mvn_log_prob_chol(y, mean, chol) / n


def posterior(k_tr, k_tr_te, k_te, residual, noise,
              jitter: float | None = None, chol_tr=None):
    """Latent posterior ``p(f* | y)`` with noisy conditioning.

    ``mean* = K_*^T (K + sigma^2 I)^{-1} residual`` (add the test prior mean
    yourself), ``cov* = K_** - K_*^T (K + sigma^2 I)^{-1} K_*``.
    ``chol_tr`` optionally supplies a precomputed factor of
    ``K + sigma^2 I`` (e.g. FBM's increment-domain one).
    """
    return conditional(_add_noise(k_tr, noise), k_tr_te, k_te, residual,
                       jitter=jitter, chol_tr=chol_tr)


class FixedCovCache(NamedTuple):
    """Eigendecomposition of a fixed train covariance ``K = Q diag(evals) Q^T``."""

    evals: jax.Array  # (..., n)
    evecs: jax.Array  # (..., n, n)


def make_fixed_cov_cache(cov) -> FixedCovCache:
    """Factorize once; reuse across every MLL+grad step of a fit."""
    evals, evecs = jnp.linalg.eigh(cov)
    return FixedCovCache(evals=jnp.maximum(evals, 0.0), evecs=evecs)


def exact_mll_fixed_cov(y, mean, cache: FixedCovCache, noise):
    """O(n^2) exact MLL against a pre-eigendecomposed covariance.

    ``logdet(K + s I) = sum log(evals + s)`` and the quadratic form rotates
    the residual once: ``|Q^T r|^2 / (evals + s)``.  Numerically this is the
    same function as :func:`exact_mll` (same gradients), evaluated through a
    different factorization.
    """
    n = y.shape[-1]
    noise = jnp.asarray(noise)
    if noise.ndim and noise.shape[-1] == 1:
        noise = noise[..., 0]
    r = y - mean
    rot = jnp.einsum("...ij,...i->...j", cache.evecs, r, precision=_HIGHEST)
    denom = cache.evals + noise[..., None]
    quad = jnp.sum(rot * rot / denom, axis=-1)
    logdet = jnp.sum(jnp.log(denom), axis=-1)
    return -0.5 * (quad + logdet + n * _LOG_2PI) / n
