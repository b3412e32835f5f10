"""Bidiagonal-Cholesky (tridiagonal-precision) Gaussian algebra.

The TPU-native variational family for the GPCV stage.  For a factorized
likelihood and a Gaussian prior, the *optimal* Gaussian variational
posterior has precision ``Q* = K^{-1} + diag(lambda)`` (the stationarity
condition of the ELBO in natural parameters).  The GPCV prior is a
Brownian-motion kernel, whose precision is tridiagonal (Markov property) —
so ``Q*`` is tridiagonal, and the family

    ``q = N(m, Q^{-1})``,  ``Q = L L^T``,  ``L`` lower *bidiagonal*

contains the optimum of the full ``n x n`` Cholesky family used by the
reference (``models/single_task_variational_gp.py:66-122``) while carrying
O(n) parameters instead of O(n^2).  Every ELBO term is an O(n) associative
scan:

* marginal variances of ``q``        — Takahashi recursion on the band,
* ``KL(q || N(mu, vol * min(x)))``    — closed-form tridiagonal algebra,
* ``logdet``                          — ``-2 sum log d``.

This removes the ``n^2`` variational covariance — and the Adam traffic on
it, the dominant cost of the reference-shaped GPCV stage at n ~ 1000 — from
the training loop entirely.

All functions broadcast over leading batch dims and run as
O(log n)-depth ``lax.associative_scan``s (reverse-differentiable).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .tridiag import tridiag_ldl_pivots

__all__ = [
    "affine_scan",
    "bidiag_chol_from_tridiag",
    "bidiag_solve_lower",
    "bidiag_solve_upper",
    "takahashi_band",
    "min_precision",
    "tridiag_q_kl_bm_prior",
]


def affine_scan(alpha, beta, reverse: bool = False):
    """Solve the first-order affine recurrence ``z_i = alpha_i z_{i-1} + beta_i``
    (``z_{-1} = 0``) along the last axis via an associative scan."""
    def combine(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay * bx + by

    if reverse:
        alpha = alpha[..., ::-1]
        beta = beta[..., ::-1]
    z = lax.associative_scan(combine, (alpha, beta), axis=alpha.ndim - 1)[1]
    return z[..., ::-1] if reverse else z


def bidiag_chol_from_tridiag(diag, off):
    """Cholesky ``(d, e)`` of an SPD tridiagonal ``T``: ``T = L L^T`` with
    ``L[i, i] = d_i``, ``L[i+1, i] = e_i``.

    From the LDL pivots ``p`` (``T = L_u diag(p) L_u^T``, unit ``L_u``):
    ``d_i = sqrt(p_i)``, ``e_i = off_i / sqrt(p_i)``.
    """
    p, _ = tridiag_ldl_pivots(diag, off)
    d = jnp.sqrt(p)
    return d, off / d[..., :-1]


def bidiag_solve_lower(d, e, b):
    """``L^{-1} b`` for lower-bidiagonal ``L`` (diag ``d``, subdiag ``e``),
    along the last axis of ``b``."""
    alpha = jnp.concatenate(
        [jnp.zeros_like(b[..., :1]), -e / d[..., 1:]], axis=-1
    )
    return affine_scan(alpha, b / d)


def bidiag_solve_upper(d, e, b):
    """``L^{-T} b``: backward substitution ``x_i = (b_i - e_i x_{i+1}) / d_i``
    as a reverse affine scan."""
    alpha = jnp.concatenate(
        [-e / d[..., :-1], jnp.zeros_like(b[..., :1])], axis=-1
    )
    return affine_scan(alpha, b / d, reverse=True)


def takahashi_band(d, e):
    """Banded entries of ``(L L^T)^{-1}`` for lower-bidiagonal ``L``.

    Returns ``(var (..., n), cov (..., n-1))`` — the diagonal and first
    off-diagonal of the covariance whose *precision* Cholesky is ``(d, e)``:

        ``var_{n-1} = 1/d_{n-1}^2``
        ``var_j = 1/d_j^2 + (e_j / d_j)^2 var_{j+1}``
        ``cov_j = -(e_j / d_j) var_{j+1}``

    (Takahashi equations specialized to bandwidth 1.)
    """
    a = 1.0 / (d * d)
    r = e / d[..., :-1]
    alpha = jnp.concatenate([r * r, jnp.zeros_like(d[..., :1])], axis=-1)
    var = affine_scan(alpha, a, reverse=True)
    cov = -r * var[..., 1:]
    return var, cov


def min_precision(x, jitter: float = 0.0):
    """Tridiagonal precision of ``min(x)`` (unit vol): with increments
    ``dx_i`` (floored at ``jitter``),

        ``A_ii = 1/dx_i + 1/dx_{i+1}`` (last: ``1/dx_n``),
        ``A_{i,i+1} = -1/dx_{i+1}``.

    Returns ``(diag, off, dx)``.
    """
    x = jnp.asarray(x)
    dx = jnp.diff(x, axis=-1, prepend=jnp.zeros_like(x[..., :1]))
    # jitter may be traced (jitter / vol); maximum(dx, 0.0) is a no-op.
    dx = jnp.maximum(dx, jitter)
    inv = 1.0 / dx
    diag = inv + jnp.concatenate(
        [inv[..., 1:], jnp.zeros_like(inv[..., :1])], axis=-1
    )
    off = -inv[..., 1:]
    return diag, off, dx


def tridiag_q_kl_bm_prior(x, vol, mean_q, q_d, q_e, mean_p,
                          jitter: float = 1e-6):
    """``KL(N(mean_q, (L L^T)^{-1}) || N(mean_p, vol * min(x)))`` in O(n).

    ``(q_d, q_e)``: bidiagonal Cholesky of the variational *precision*.
    Matches :func:`volt_tpu.ops.mvn.mvn_kl` against the dense equivalents;
    the same increment-domain jitter policy as
    :func:`volt_tpu.ops.brownian.bm_kl_against_prior` regularizes grids
    starting at ``x_0 = 0``.
    """
    n = mean_q.shape[-1]
    vol0 = vol[..., 0] if (hasattr(vol, "ndim") and vol.ndim) else vol
    a_diag, a_off, dx = min_precision(x, jitter / vol0)

    var, cov = takahashi_band(q_d, q_e)
    trace = (
        jnp.sum(a_diag * var, axis=-1) + 2.0 * jnp.sum(a_off * cov, axis=-1)
    ) / vol0

    diff = jnp.diff(mean_p - mean_q, axis=-1,
                    prepend=jnp.zeros_like(mean_q[..., :1]))
    quad = jnp.sum(diff * diff / dx, axis=-1) / vol0

    logdet_p = n * jnp.log(vol0) + jnp.sum(jnp.log(dx), axis=-1)
    logdet_q_cov = -2.0 * jnp.sum(jnp.log(q_d), axis=-1)
    return 0.5 * (trace + quad - n + logdet_p - logdet_q_cov)
