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

from ..ops.chol import cholesky_solve, psd_safe_cholesky, solve_lower_triangular

__all__ = [
    "kron_mvn_log_prob",
    "kron_kl",
    "kron_kl_bm_prior_tridiag",
    "kron_posterior",
]

_LOG_2PI = math.log(2.0 * math.pi)
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def _kron_pieces(y, mean, k_data, k_task, noise):
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
    ll = -0.5 * (quad + logdet + n * t * _LOG_2PI)
    return ll, (ld, qd, lt, qt, rot, denom)


@jax.custom_vjp
def kron_mvn_log_prob(y, mean, k_data, k_task, noise):
    """``log N(vec(y); vec(mean), K_data (x) K_task + noise I)``.

    ``y`` / ``mean``: ``(..., N, T)`` laid out so that
    ``vec`` interleaves tasks fastest (gpytorch's multitask convention).

    Carries a closed-form VJP: the MLL's factor gradients are

        ``dL/dK_d = -1/2 (Q_d diag_i(sum_a lt_a / D_ia) Q_d^T
                          - alpha K_t alpha^T)``
        ``dL/dK_t = -1/2 (Q_t diag_a(sum_i ld_i / D_ia) Q_t^T
                          - alpha^T K_d alpha)``

    with ``alpha = Sigma^{-1} r`` — spectral functions and
    alpha-quadratics only.  This matters: autodiff through ``eigh``
    divides by eigenvalue gaps and returns NaN for repeated eigenvalues,
    and the task covariance is born degenerate (``IndexKernel.init``
    gives ``f f^T + c I`` with ``T - rank`` equal eigenvalues), which
    NaN'd the whole multitask fit at iteration 0.
    """
    return _kron_pieces(y, mean, k_data, k_task, noise)[0]


def _kron_mvn_log_prob_fwd(y, mean, k_data, k_task, noise):
    ll, (ld, qd, lt, qt, rot, denom) = _kron_pieces(
        y, mean, k_data, k_task, noise
    )
    return ll, (ld, qd, lt, qt, rot, denom, k_data, k_task, noise)


def _kron_mvn_log_prob_bwd(res, g):
    ld, qd, lt, qt, rot, denom, k_data, k_task, noise = res
    qd_t = jnp.swapaxes(qd, -1, -2)
    qt_t = jnp.swapaxes(qt, -1, -2)
    scaled = rot / denom
    alpha = _mm(qd, _mm(scaled, qt_t))       # Sigma^{-1} r, (N, T) layout

    g_ = g[..., None, None]
    d_y = (-g_) * alpha                       # dL/dy = -alpha
    d_mean = g_ * alpha

    inv = 1.0 / denom
    # logdet spectral terms
    trace_d = jnp.sum(lt[..., None, :] * inv, axis=-1)   # (..., N)
    trace_t = jnp.sum(ld[..., :, None] * inv, axis=-2)   # (..., T)
    gkd_logdet = _mm(qd * trace_d[..., None, :], qd_t)
    gkt_logdet = _mm(qt * trace_t[..., None, :], qt_t)
    # quadratic terms
    akt = _mm(alpha, k_task)
    gkd_quad = _mm(akt, jnp.swapaxes(alpha, -1, -2))     # alpha Kt alpha^T
    kda = _mm(k_data, alpha)
    gkt_quad = _mm(jnp.swapaxes(alpha, -1, -2), kda)     # alpha^T Kd alpha

    def _sym(m):
        return 0.5 * (m + jnp.swapaxes(m, -1, -2))

    d_kd = (-0.5 * g_) * _sym(gkd_logdet - gkd_quad)
    d_kt = (-0.5 * g_) * _sym(gkt_logdet - gkt_quad)

    d_noise_full = -0.5 * g * (
        jnp.sum(inv, axis=(-2, -1)) - jnp.sum(alpha * alpha, axis=(-2, -1))
    )
    noise_arr = jnp.asarray(noise)
    d_noise = jnp.sum(
        d_noise_full,
        axis=tuple(range(d_noise_full.ndim - noise_arr.ndim)),
    ).reshape(noise_arr.shape)
    return d_y, d_mean, d_kd, d_kt, d_noise


kron_mvn_log_prob.defvjp(_kron_mvn_log_prob_fwd, _kron_mvn_log_prob_bwd)


def kron_mvn_log_prob_blockdiag(r_tilde, ld, c, k_task, noise, w):
    """Kronecker MLL with a *known* data-side eigenbasis — no ``eigh``.

    For ``Sigma = (c 11^T + A) (x) K_t + s I`` where ``A`` has eigenpairs
    ``(ld, U)``: rotating only the data side with ``U (x) I_T`` gives

        ``Sigma~ = blockdiag_i(ld_i K_t + s I_T) + c (w w^T) (x) K_t``,

    ``w = U^T 1``.  The block part is N independent T x T SPD systems
    (batched Cholesky); the rank-T coupling is a Woodbury correction with
    one T x T solve.  Everything is stock-differentiable — in particular
    no ``eigh(K_t)``, whose autodiff divides by eigenvalue gaps and NaNs
    on the IndexKernel's born-degenerate task covariance (the reason
    :func:`kron_mvn_log_prob` needs a hand-written VJP).

    Args: ``r_tilde`` (..., N, T) = ``U^T (y - mean)``; ``ld`` (..., N);
    ``c`` scalar (may be 0 or negative); ``k_task`` (..., T, T); ``noise``
    scalar; ``w`` (..., N).  Returns the log-density (unnormalized by
    count — same convention as :func:`kron_mvn_log_prob`).
    """
    n, t = r_tilde.shape[-2], r_tilde.shape[-1]
    eye_t = jnp.eye(t, dtype=r_tilde.dtype)
    blocks = (
        ld[..., :, None, None] * k_task[..., None, :, :]
        + noise * eye_t
    )
    chol = psd_safe_cholesky(blocks)  # (..., N, T, T)
    z = cholesky_solve(chol, r_tilde[..., None])[..., 0]  # (..., N, T)
    inv_blocks = cholesky_solve(
        chol, jnp.broadcast_to(eye_t, blocks.shape)
    )
    w2 = (w * w)[..., None, None]
    s_mat = jnp.sum(w2 * inv_blocks, axis=-3)            # V^T B^{-1} V
    v = jnp.sum(w[..., None] * z, axis=-2)               # V^T B^{-1} r

    # Woodbury written so c = 0 degrades smoothly (no K_t^{-1}):
    #   quad -= c v^T K_t (I + c S K_t)^{-1} v
    #   logdet += slogdet(I + c S K_t)
    m = eye_t + c * _mm(s_mat, k_task)
    kv = jnp.einsum("...ab,...b->...a", k_task, v, precision=_HIGHEST)
    corr = jnp.linalg.solve(m, kv[..., None])[..., 0]
    quad = (
        jnp.sum(r_tilde * z, axis=(-2, -1))
        - c * jnp.sum(v * corr, axis=-1)
    )
    logdet_blocks = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=(-2, -1)
    )
    _, logdet_corr = jnp.linalg.slogdet(m)
    logdet = logdet_blocks + logdet_corr
    return -0.5 * (quad + logdet + n * t * _LOG_2PI)


def kron_mvn_log_prob_blockdiag_lowrank(r_tilde, ld, c, factor, task_diag,
                                        noise, w):
    """:func:`kron_mvn_log_prob_blockdiag` exploiting the IndexKernel's
    low-rank-plus-diagonal task covariance — no T x T factorization.

    With ``K_t = F F^T + diag(v)`` (``F`` (T, r), the reference's
    ``IndexKernel``, ``multi_task_variational_gp.py:32``), each data-mode
    block is diagonal-plus-rank-r:

        ``B_i = ld_i K_t + s I = diag(ld_i v + s) + ld_i F F^T``

    so Woodbury/matrix-determinant-lemma give every per-block solve and
    logdet in O(T r^2) instead of the batched T x T Cholesky's O(T^3) —
    the difference between O(N T^3) and O(N T r^2 + N T^2 r) per Adam
    step, i.e. the step that makes the multitask vol fit tractable at
    the 505-ticker north star (VERDICT round 2, item 1).  The rank-T
    offset coupling (``c (w w^T) (x) K_t``) keeps one dense T x T solve
    per evaluation — O(T^3) once, not N times.

    Args: ``r_tilde`` (..., N, T) = ``U^T (y - mean)``; ``ld`` (..., N);
    ``c`` scalar; ``factor`` (T, r); ``task_diag`` (T,) positive;
    ``noise`` scalar; ``w`` (..., N).  Matches
    :func:`kron_mvn_log_prob_blockdiag` to float precision (pinned in
    tests).  Everything is stock-differentiable.
    """
    n, t = r_tilde.shape[-2], r_tilde.shape[-1]
    r = factor.shape[-1]
    eye_t = jnp.eye(t, dtype=r_tilde.dtype)
    k_task = (_mm(factor, jnp.swapaxes(factor, -1, -2))
              + task_diag[..., :, None] * eye_t)

    ld_ = ld[..., :, None]                       # (..., N, 1)
    dinv = 1.0 / (ld_ * task_diag + noise)       # (..., N, T)
    # G = Dinv_i F : (..., N, T, r) contracted lazily; M_i = I_r + ld_i F^T Dinv_i F
    fdf = jnp.einsum("...nt,ta,tb->...nab", dinv, factor, factor,
                     precision=_HIGHEST)          # (..., N, r, r)
    m_i = jnp.eye(r, dtype=r_tilde.dtype) + ld_[..., None] * fdf
    chol_r = psd_safe_cholesky(m_i)              # (..., N, r, r)

    def binv_apply(u):
        """``B_i^{-1} u_i`` for stacked (..., N, T) right-hand sides."""
        du = dinv * u
        fu = jnp.einsum("ta,...nt->...na", factor, du,
                        precision=_HIGHEST)       # (..., N, r)
        sol = cholesky_solve(chol_r, fu[..., None])[..., 0]
        return du - ld_ * dinv * jnp.einsum(
            "ta,...na->...nt", factor, sol, precision=_HIGHEST
        )

    z = binv_apply(r_tilde)                       # (..., N, T)

    # S = sum_i w_i^2 B_i^{-1}  (T x T), assembled from the Woodbury pieces:
    #   diag(sum_i w_i^2 dinv_i) - sum_i w_i^2 ld_i H_i H_i^T,
    #   H_i = Dinv_i F L_i^{-T}  (L_i = chol(M_i)).
    w2 = w * w                                    # (..., N)
    s_diag = jnp.einsum("...n,...nt->...t", w2, dinv, precision=_HIGHEST)
    g = dinv[..., None] * factor                  # (..., N, T, r)
    h = jnp.swapaxes(
        solve_lower_triangular(chol_r, jnp.swapaxes(g, -1, -2)), -1, -2
    )                                             # (..., N, T, r)
    coeff = w2 * ld                               # (..., N)
    s_corr = jnp.einsum("...n,...nta,...nua->...tu", coeff, h, h,
                        precision=_HIGHEST)
    s_mat = s_diag[..., :, None] * eye_t - s_corr

    v = jnp.sum(w[..., None] * z, axis=-2)        # (..., T)

    # Woodbury for the offset coupling (identical to the dense-block path).
    m = eye_t + c * _mm(s_mat, k_task)
    kv = jnp.einsum("...ab,...b->...a", k_task, v, precision=_HIGHEST)
    corr = jnp.linalg.solve(m, kv[..., None])[..., 0]
    quad = (
        jnp.sum(r_tilde * z, axis=(-2, -1))
        - c * jnp.sum(v * corr, axis=-1)
    )
    # logdet B_i = sum_t log(ld_i v_t + s) + logdet M_i
    logdet_blocks = (
        -jnp.sum(jnp.log(dinv), axis=(-2, -1))
        + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol_r, axis1=-2, axis2=-1)),
            axis=(-2, -1),
        )
    )
    _, logdet_corr = jnp.linalg.slogdet(m)
    logdet = logdet_blocks + logdet_corr
    return -0.5 * (quad + logdet + n * t * _LOG_2PI)


def kron_kl_bm_prior(mean_q, root_x, root_t, mean_p, x, vol, k_task,
                     jitter: float = 1e-6):
    """:func:`kron_kl` specialized to a BM data prior — no N x N Cholesky.

    For ``K_data = vol * min(x)`` the data-side Cholesky is the analytic
    diff-and-scale operator (``ops/brownian.py``), so the KL's per-step
    cost drops from O(n^3) (``psd_safe_cholesky`` of the data kernel
    inside the training loop) to O(n^2) differencing of the variational
    root's columns.  Same increment-domain jitter policy as
    :func:`volt_tpu.ops.brownian.bm_kl_against_prior`; matches
    :func:`kron_kl` on the same inputs (pinned in tests).
    """
    n, t = mean_q.shape[-2], mean_q.shape[-1]
    vol0 = vol[..., 0] if (hasattr(vol, "ndim") and vol.ndim) else vol
    dx = jnp.diff(x, axis=-1, prepend=jnp.zeros_like(x[..., :1]))
    dx = jnp.maximum(dx, jitter / vol0)
    sqrt_dx = jnp.sqrt(dx)

    def data_solve_lower(b, axis=-1):
        b = jnp.moveaxis(b, axis, -1)
        out = jnp.diff(b, axis=-1, prepend=jnp.zeros_like(b[..., :1]))
        return jnp.moveaxis(out / sqrt_dx, -1, axis)

    rx = jnp.tril(root_x)
    rt = jnp.tril(root_t)
    lt = psd_safe_cholesky(k_task)

    # trace term: tr(Kd^{-1} Sx) tr(Kt^{-1} St) with Kd = vol min(x)
    ax = data_solve_lower(rx, axis=-2)
    tr_x = jnp.sum(ax * ax, axis=(-2, -1)) / vol0
    at = solve_lower_triangular(lt, rt)
    tr_t = jnp.sum(at * at, axis=(-2, -1))
    trace = tr_x * tr_t

    # quadratic: || Ld^{-1} (m_p - m_q) Lt^{-T} ||_F^2 / vol
    diff = mean_p - mean_q
    half = data_solve_lower(diff, axis=-2)          # (N, T)
    half = solve_lower_triangular(lt, jnp.swapaxes(half, -1, -2))
    quad = jnp.sum(half * half, axis=(-2, -1)) / vol0

    def _tri_logdet(tri):
        return 2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(tri, axis1=-2, axis2=-1))),
            axis=-1,
        )

    logdet_p = (
        t * (n * jnp.log(vol0) + jnp.sum(jnp.log(dx), axis=-1))
        + n * _tri_logdet(lt)
    )
    logdet_q = t * _tri_logdet(rx) + n * _tri_logdet(rt)
    return 0.5 * (trace + quad - n * t + logdet_p - logdet_q)


def kron_kl_bm_prior_tridiag(mean_q, q_d, q_e, root_t, mean_p, x, vol,
                             k_task, jitter: float = 1e-6):
    """:func:`kron_kl_bm_prior` with a *tridiagonal-precision* data factor.

    ``q = N(vec(M), Sx (x) St)`` with ``Sx = (Lx Lx^T)^{-1}`` for lower-
    bidiagonal ``Lx = (q_d, q_e)`` — the Kronecker extension of the
    single-task TPU-native family (``ops/bidiag.py``): the BM prior's
    precision is tridiagonal, so the per-factor optimal ``Sx`` of the
    ELBO stationarity condition lives in this family, and it carries
    O(n) parameters where the reference's explicit data root
    (``multi_task_variational_gp.py:15-30``) carries O(n^2).  Every term
    is an O(n) scan on the data side:

    * ``tr(Kd^{-1} Sx)`` — Takahashi band marginals against the
      tridiagonal ``min(x)^{-1}``,
    * quadratic — increment differencing (diff-and-scale Cholesky),
    * ``logdet Sx = -2 sum log q_d``.

    Matches :func:`kron_kl` with the dense equivalents (pinned in
    tests).  Same increment-domain jitter policy as
    :func:`kron_kl_bm_prior`.
    """
    from ..ops.bidiag import min_precision, takahashi_band

    n, t = mean_q.shape[-2], mean_q.shape[-1]
    vol0 = vol[..., 0] if (hasattr(vol, "ndim") and vol.ndim) else vol
    a_diag, a_off, dx = min_precision(x, jitter / vol0)
    lt = psd_safe_cholesky(k_task)
    rt = jnp.tril(root_t)

    # trace: tr(Kd^{-1} Sx) tr(Kt^{-1} St), both factors banded/small
    var, cov = takahashi_band(q_d, q_e)
    tr_x = (
        jnp.sum(a_diag * var, axis=-1) + 2.0 * jnp.sum(a_off * cov, axis=-1)
    ) / vol0
    at = solve_lower_triangular(lt, rt)
    trace = tr_x * jnp.sum(at * at, axis=(-2, -1))

    # quadratic: || Ld^{-1} (m_p - m_q) Lt^{-T} ||_F^2 / vol
    diff = mean_p - mean_q
    half = jnp.diff(diff, axis=-2, prepend=jnp.zeros_like(diff[..., :1, :]))
    half = half / jnp.sqrt(dx)[..., :, None]
    half = solve_lower_triangular(lt, jnp.swapaxes(half, -1, -2))
    quad = jnp.sum(half * half, axis=(-2, -1)) / vol0

    def _tri_logdet(tri):
        return 2.0 * jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(tri, axis1=-2, axis2=-1))), axis=-1)

    logdet_p = (
        t * (n * jnp.log(vol0) + jnp.sum(jnp.log(dx), axis=-1))
        + n * _tri_logdet(lt)
    )
    logdet_q = t * (-2.0 * jnp.sum(jnp.log(q_d), axis=-1)) \
        + n * _tri_logdet(rt)
    return 0.5 * (trace + quad - n * t + logdet_p - logdet_q)


def kron_kl(mean_q, root_x, root_t, mean_p, k_data, k_task,
            chol_data=None):
    """``KL(N(vec(m_q), Sx (x) St) || N(vec(m_p), Kd (x) Kt))``.

    ``root_x`` / ``root_t``: lower-triangular roots of the variational
    factors (``Sx = Rx Rx^T``), as in the reference's
    ``variational_covar_root.tril()`` parameterization
    (``multi_task_variational_gp.py:95-111``).  Means are ``(..., N, T)``.
    ``chol_data`` optionally supplies a structure-aware factor of the
    data kernel (FBM's increment-domain one, ``ops/fbm.py``).
    """
    n, t = mean_q.shape[-2], mean_q.shape[-1]
    rx = jnp.tril(root_x)
    rt = jnp.tril(root_t)
    ld = chol_data if chol_data is not None else psd_safe_cholesky(k_data)
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
    # down-weighted data gram per task mode: G[t_mode, i, j]
    g = jnp.einsum(
        "...ni,...nj,...nt->...tij",
        cross_rot, cross_rot,
        (lt[..., None, :] ** 2)
        / (ld[..., :, None] * lt[..., None, :] + noise),
        precision=_HIGHEST,
    )  # (..., T, M, M)
    # rotate task modes back: cov = Kte (x) Kt - sum_t (qt e_t)(qt e_t)^T (x) g_t
    k_te_full = jnp.einsum(
        "...ij,...ab->...iajb", k_data_te, k_task, precision=_HIGHEST
    )
    correction = jnp.einsum(
        "...tij,...at,...bt->...iajb", g, qt, qt, precision=_HIGHEST
    )
    cov = (k_te_full - correction).reshape(*k_te_full.shape[:-4], m * t, m * t)
    return mean, cov
