"""Kronecker-structured MVN algebra for multitask GPs.

The reference's multitask models put ``K = K_data (x) K_task`` over
``N x T`` observations (botorch ``KroneckerMultiTaskGP`` in
``models/BMGP.py:30-56``; hand-rolled Kronecker lazies in
``models/multi_task_variational_gp.py``).  Materializing the NT x NT matrix
is never necessary: with eigendecompositions ``K_d = Q_d L_d Q_d^T`` and
``K_t = Q_t L_t Q_t^T``,

* ``K + s I`` has eigenvalues ``l_d l_t + s`` under ``Q_d (x) Q_t``, giving
  the marginal log-likelihood in O(N^3 + T^3 + N^2 T + N T^2);
* KL between two Kronecker MVNs factorizes into per-factor traces and
  log-dets.

Everything here is batched and jit-safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.chol import psd_safe_cholesky, solve_lower_triangular

__all__ = [
    "kron_mvn_log_prob",
    "kron_kl",
    "kron_posterior",
]

_LOG_2PI = math.log(2.0 * math.pi)
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def kron_mvn_log_prob(y, mean, k_data, k_task, noise):
    """``log N(vec(y); vec(mean), K_data (x) K_task + noise I)``.

    ``y`` / ``mean``: ``(..., N, T)`` laid out so that
    ``vec`` interleaves tasks fastest (gpytorch's multitask convention).
    """
    n, t = y.shape[-2], y.shape[-1]
    ld, qd = jnp.linalg.eigh(k_data)
    lt, qt = jnp.linalg.eigh(k_task)
    ld = jnp.maximum(ld, 0.0)
    lt = jnp.maximum(lt, 0.0)
    r = y - mean
    # rotate: r~ = Q_d^T r Q_t
    rot = _mm(jnp.swapaxes(qd, -1, -2), _mm(r, qt))
    denom = ld[..., :, None] * lt[..., None, :] + noise
    quad = jnp.sum(rot * rot / denom, axis=(-2, -1))
    logdet = jnp.sum(jnp.log(denom), axis=(-2, -1))
    return -0.5 * (quad + logdet + n * t * _LOG_2PI)


def kron_kl(mean_q, root_x, root_t, mean_p, k_data, k_task):
    """``KL(N(vec(m_q), Sx (x) St) || N(vec(m_p), Kd (x) Kt))``.

    ``root_x`` / ``root_t``: lower-triangular roots of the variational
    factors (``Sx = Rx Rx^T``), as in the reference's
    ``variational_covar_root.tril()`` parameterization
    (``multi_task_variational_gp.py:95-111``).  Means are ``(..., N, T)``.
    """
    n, t = mean_q.shape[-2], mean_q.shape[-1]
    rx = jnp.tril(root_x)
    rt = jnp.tril(root_t)
    ld = psd_safe_cholesky(k_data)
    lt = psd_safe_cholesky(k_task)

    # trace term: tr((Kd (x) Kt)^{-1} (Sx (x) St)) = tr(Kd^{-1}Sx) tr(Kt^{-1}St)
    ax = solve_lower_triangular(ld, rx)
    at = solve_lower_triangular(lt, rt)
    tr_x = jnp.sum(ax * ax, axis=(-2, -1))
    tr_t = jnp.sum(at * at, axis=(-2, -1))
    trace = tr_x * tr_t

    # quadratic: || Ld^{-1} (m_p - m_q) Lt^{-T} ||_F^2
    diff = mean_p - mean_q
    half = solve_lower_triangular(ld, diff)  # Ld^{-1} diff : (N, T)
    half = solve_lower_triangular(lt, jnp.swapaxes(half, -1, -2))
    quad = jnp.sum(half * half, axis=(-2, -1))

    def _ld(tri):
        return 2.0 * jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(tri, axis1=-2, axis2=-1))), axis=-1)

    logdet_p = t * _ld(ld) + n * _ld(lt)
    logdet_q = t * _ld(rx) + n * _ld(rt)
    return 0.5 * (trace + quad - n * t + logdet_p - logdet_q)


def kron_posterior(k_data_tr, k_data_cross, k_data_te, k_task, resid, noise):
    """Multitask exact-GP posterior.

    Conditions ``NT`` train observations (residuals ``resid (..., N, T)``)
    under ``K_d (x) K_t + noise I`` and returns the posterior of the ``M``
    test points for all tasks:

    ``mean (..., M, T)`` and the full ``cov (..., M*T, M*T)`` (row-major in
    (point, task)) for joint sampling of forecast paths across tasks.
    """
    m = k_data_cross.shape[-1]
    t = k_task.shape[-1]
    ld, qd = jnp.linalg.eigh(k_data_tr)
    lt, qt = jnp.linalg.eigh(k_task)
    ld = jnp.maximum(ld, 0.0)
    lt = jnp.maximum(lt, 0.0)
    denom = ld[..., :, None] * lt[..., None, :] + noise  # (N, T)

    rot = _mm(jnp.swapaxes(qd, -1, -2), _mm(resid, qt)) / denom
    alpha = _mm(qd, _mm(rot, jnp.swapaxes(qt, -1, -2)))  # (N, T): K^{-1} r
    # mean: (Kx_d^T (x) Kt) vec(alpha) = Kx_d^T alpha Kt^T
    mean = _mm(jnp.swapaxes(k_data_cross, -1, -2), _mm(alpha, k_task))

    # covariance: (Kte (x) Kt) - (Kx^T (x) Kt) K^{-1} (Kx (x) Kt)
    # project the cross block into the eigenbasis once:
    cross_rot = _mm(jnp.swapaxes(qd, -1, -2), k_data_cross)  # (N, M)
    # data-side quadratic forms weighted per task-eigenvalue:
    # S2[i,j,a,b] = sum_n cross[n,i]cross[n,j] * sum over task modes ...
    # assemble in the task eigenbasis then rotate back.
    lt_col = lt[..., None, None, :]  # (..., 1, 1, T)
    weights = (lt_col ** 2) / (
        ld[..., :, None, None] * lt_col + noise
    )  # (..., N, 1, T) after broadcast with cross
    # down-weighted data gram per task mode: G[t_mode, i, j]
    g = jnp.einsum(
        "...ni,...nj,...nt->...tij",
        cross_rot, cross_rot,
        (lt[..., None, :] ** 2)
        / (ld[..., :, None] * lt[..., None, :] + noise),
        precision=_HIGHEST,
    )  # (..., T, M, M)
    del weights
    # rotate task modes back: cov = Kte (x) Kt - sum_t (qt e_t)(qt e_t)^T (x) g_t
    k_te_full = jnp.einsum(
        "...ij,...ab->...iajb", k_data_te, k_task, precision=_HIGHEST
    )
    correction = jnp.einsum(
        "...tij,...at,...bt->...iajb", g, qt, qt, precision=_HIGHEST
    )
    cov = (k_te_full - correction).reshape(*k_te_full.shape[:-4], m * t, m * t)
    return mean, cov
