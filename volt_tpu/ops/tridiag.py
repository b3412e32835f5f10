"""Tridiagonal algebra via parallel (associative) scans.

The Volt covariance is a min-kernel, so its *precision* is tridiagonal
(the Markov property): with integral values ``v_1..v_n`` and increments
``D_i = v_i - v_{i-1}``,

    ``W_ii = 1/D_i + 1/D_{i+1}`` (last: ``1/D_n``),
    ``W_{i,i+1} = -1/D_{i+1}``.

Therefore the data-model marginal likelihood under ``K + s I`` needs only
tridiagonal work:

    ``logdet(K + s I) = sum log D_i + logdet(I + s W)``
    ``(K + s I)^{-1} r = (I + s W)^{-1} W r``

``logdet`` of an SPD tridiagonal comes from the leading-minor linear
recurrence ``p_i = a_i p_{i-1} - e_{i-1}^2 p_{i-2}`` — a product of 2x2
matrices, evaluated with a *normalized* ``lax.associative_scan`` (O(log n)
depth, overflow-safe); its prefixes give the LDL pivots ``d_i = p_i /
p_{i-1}``, and the solve is two first-order affine recurrences, also
associative scans.  This removes the batched eigendecomposition from the
Volt fit entirely (one ``eigh`` of a 400^2 matrix per asset was the last
O(n^3) fixed cost in the pipeline).

Everything is batched over leading dims and reverse-differentiable
(``associative_scan`` has standard JVP/transpose rules).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "tridiag_ldl_pivots",
    "tridiag_solve",
    "brownian_noise_mll",
    "brownian_noise_mll_kalman",
    "brownian_noise_filter",
]


def tridiag_ldl_pivots(diag, off):
    """LDL pivots ``d`` and ``logdet`` of an SPD tridiagonal matrix.

    ``diag``: ``(..., n)``; ``off``: ``(..., n-1)`` (the super/sub
    diagonal).  Returns ``(d (..., n), logdet (...,))`` with
    ``d_i = p_i / p_{i-1}`` from the leading-minor recurrence.
    """
    diag = jnp.asarray(diag)
    off = jnp.asarray(off)
    n = diag.shape[-1]
    # 2x2 recurrence matrices M_i = [[a_i, -e_{i-1}^2], [1, 0]], i >= 1
    # (M_0 encodes p_0 = a_0 with p_{-1} = 1).
    esq = jnp.concatenate(
        [jnp.zeros_like(diag[..., :1]), off * off], axis=-1
    )
    m = jnp.stack(
        [
            jnp.stack([diag, -esq], axis=-1),
            jnp.stack([jnp.ones_like(diag), jnp.zeros_like(diag)], axis=-1),
        ],
        axis=-2,
    )  # (..., n, 2, 2)
    # normalize each matrix; accumulate log-scales separately so the
    # minor products never overflow float32.
    scale = jnp.maximum(jnp.max(jnp.abs(m), axis=(-2, -1)), 1e-30)
    m = m / scale[..., None, None]
    logs = jnp.log(scale)

    def combine(x, y):
        mx, sx = x
        my, sy = y
        # HIGHEST: TPU's default bf16 matmul destroys the minor recurrence
        # when the tridiagonal entries span orders of magnitude (the
        # tridiag-q init spans 1e3..1e6 at the jitter-floored first point).
        prod = jnp.matmul(my, mx, precision=jax.lax.Precision.HIGHEST)
        ps = jnp.maximum(jnp.max(jnp.abs(prod), axis=(-2, -1)), 1e-30)
        return prod / ps[..., None, None], sx + sy + jnp.log(ps)

    prefixes, logsums = lax.associative_scan(combine, (m, logs),
                                             axis=diag.ndim - 1)
    # applied to the init vector (p_{-1..}) = (1, 1)? p_{-1} = 1, p_{-2} = 0:
    # [p_i, p_{i-1}]^T = P_i @ [1, 0]^T  => column 0 of the prefix product.
    p_top = prefixes[..., 0, 0]
    p_bot = prefixes[..., 1, 0]
    # d_i = p_i / p_{i-1}; p_{i-1} of step i equals the bottom entry.
    # bottom entry of prefix i is p_{i-1} (scaled identically), except at
    # i = 0 where it is p_{-1} = 1 (also scaled) — the ratio is exact
    # because both entries share the same normalization.
    d = p_top / p_bot
    logdet = logsums[..., -1] + jnp.log(jnp.abs(p_top[..., -1]))
    # note: |p_bot[-1] * exp(logsum)| telescopes into the same total via the
    # d-products; for SPD input p_top > 0 throughout.
    return d, logdet


def tridiag_solve(d, off, b):
    """Solve ``T x = b`` given LDL pivots ``d`` of the SPD tridiagonal ``T``
    with off-diagonal ``off`` — two affine associative scans.

    ``T = L diag(d) L^T`` with unit-lower-bidiagonal ``L``,
    ``L[i+1, i] = off_i / d_i``.
    """
    l = off / d[..., :-1]

    def affine_combine(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay * bx + by

    # forward: z_0 = b_0; z_i = b_i - l_{i-1} z_{i-1}
    alpha = jnp.concatenate([jnp.zeros_like(b[..., :1]), -l], axis=-1)
    z = lax.associative_scan(affine_combine, (alpha, b), axis=b.ndim - 1)[1]
    y = z / d
    # backward: x_n = y_n; x_i = y_i - l_i x_{i+1}  (reverse scan)
    alpha_r = jnp.concatenate([jnp.zeros_like(b[..., :1]), -l[..., ::-1]],
                              axis=-1)
    xs = lax.associative_scan(affine_combine, (alpha_r, y[..., ::-1]),
                              axis=b.ndim - 1)
    return xs[1][..., ::-1]


def brownian_noise_mll(v, sigma2, resid):
    """``log N(resid; 0, K + sigma2 I) / n`` for the min-kernel ``K`` with
    integral values ``v`` — O(n) work, O(log n) depth, no factorization.

    ``v``: ``(..., n)`` strictly increasing positive integral values;
    ``sigma2``: ``(...,)``; ``resid``: ``(..., n)``.
    """
    v = jnp.asarray(v)
    resid = jnp.asarray(resid)
    n = v.shape[-1]
    delta = jnp.diff(v, axis=-1, prepend=jnp.zeros_like(v[..., :1]))
    inv_d = 1.0 / delta
    s2 = jnp.asarray(sigma2)[..., None]

    # W = K^{-1} tridiagonal
    w_diag = inv_d + jnp.concatenate(
        [inv_d[..., 1:], jnp.zeros_like(inv_d[..., :1])], axis=-1
    )
    w_off = -inv_d[..., 1:]

    a_diag = 1.0 + s2 * w_diag
    a_off = s2 * w_off

    d, logdet_a = tridiag_ldl_pivots(a_diag, a_off)
    logdet = jnp.sum(jnp.log(delta), axis=-1) + logdet_a

    # g = W r  (tridiagonal matvec)
    r = resid
    up = jnp.concatenate([w_off * r[..., 1:], jnp.zeros_like(r[..., :1])],
                         axis=-1)
    down = jnp.concatenate([jnp.zeros_like(r[..., :1]), w_off * r[..., :-1]],
                           axis=-1)
    g = w_diag * r + up + down
    x = tridiag_solve(d, a_off, g)
    quad = jnp.sum(r * x, axis=-1)

    return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi)) / n


def brownian_noise_mll_kalman(v, sigma2, resid):
    """Numerically robust alternative: the Kalman-filter MLL.

    The min-kernel + noise model IS a scalar state-space model — a random
    walk ``f_t = f_{t-1} + w_t``, ``w_t ~ N(0, D_t)`` observed through
    ``y_t = f_t + eps``, ``eps ~ N(0, s)`` — so the filter's innovation
    decomposition gives the exact MLL in O(n) *sequential* steps with
    all-positive recursions (no cancellation; accurate even when the
    increments span many orders of magnitude, where the LDL minor
    recurrence of :func:`brownian_noise_mll` loses float32 digits).

    Batched over leading dims of ``resid``/``sigma2`` (``v`` may broadcast).
    """
    v = jnp.asarray(v)
    resid = jnp.asarray(resid)
    n = resid.shape[-1]
    delta = jnp.diff(v, axis=-1, prepend=jnp.zeros_like(v[..., :1]))
    s2 = jnp.asarray(sigma2)

    batch = jnp.broadcast_shapes(resid.shape[:-1], s2.shape,
                                 delta.shape[:-1])
    delta_b = jnp.broadcast_to(delta, (*batch, n))
    resid_b = jnp.broadcast_to(resid, (*batch, n))
    s2_b = jnp.broadcast_to(s2, batch)

    def step(carry, inp):
        mean, var, ll = carry
        d_t, y_t = inp
        var_pred = var + d_t
        innov_var = var_pred + s2_b
        e = y_t - mean
        ll = ll - 0.5 * (jnp.log(innov_var) + e * e / innov_var
                         + math.log(2.0 * math.pi))
        gain = var_pred / innov_var
        mean = mean + gain * e
        var = var_pred * (1.0 - gain)
        return (mean, var, ll), None

    zeros = jnp.zeros(batch, resid.dtype)
    # The filter is latency-bound, not flop-bound: each step is a handful
    # of elementwise ops over the batch lanes, so per-step dispatch
    # dominates and unrolling trades HLO size (first-compile time) for
    # steady-state.  Isolated MLL+grad ladder at B=500, n=999:
    # 2.37/1.93/1.46/1.25 ms at unroll 1/8/16/32 — but END-TO-END the
    # pipeline measures the same at 8 and 32 (B=64: 115.2 vs 114.4 ms;
    # B=500: 274.3 vs 300.0 ms per batch) while 32 compiles the B=500
    # program ~30 s slower cold (tools/bench_compile.py, PERFORMANCE.md),
    # so 8 is the default.  TPU only: on CPU the unrolled HLO roughly
    # doubles the test suite's compile wall-time for no benefit.
    # VOLT_TPU_SCAN_UNROLL overrides.
    from ..utils.platform import scan_unroll

    unroll = scan_unroll(8)
    (_, _, ll), _ = lax.scan(
        step, (zeros, zeros, zeros),
        (jnp.moveaxis(delta_b, -1, 0), jnp.moveaxis(resid_b, -1, 0)),
        unroll=unroll,
    )
    return ll / n


def brownian_noise_filter(v, sigma2, resid):
    """Posterior of the LATENT at the last train point given all data.

    Same state-space model as :func:`brownian_noise_mll_kalman`; the
    filtered state at the final observation is exactly the joint-GP
    posterior there (Markov property), so forecasting needs no
    factorization of anything: the posterior over any future grid is the
    filtered state plus independent Brownian increments.  Returns
    ``(mean, var)`` with the batch shape of ``resid``/``sigma2``.
    """
    v = jnp.asarray(v)
    resid = jnp.asarray(resid)
    n = resid.shape[-1]
    delta = jnp.diff(v, axis=-1, prepend=jnp.zeros_like(v[..., :1]))
    s2 = jnp.asarray(sigma2)
    batch = jnp.broadcast_shapes(resid.shape[:-1], s2.shape,
                                 delta.shape[:-1])
    delta_b = jnp.broadcast_to(delta, (*batch, n))
    resid_b = jnp.broadcast_to(resid, (*batch, n))
    s2_b = jnp.broadcast_to(s2, batch)

    def step(carry, inp):
        mean, var = carry
        d_t, y_t = inp
        var_pred = var + d_t
        innov_var = var_pred + s2_b
        gain = var_pred / innov_var
        mean = mean + gain * (y_t - mean)
        var = var_pred * (1.0 - gain)
        return (mean, var), None

    zeros = jnp.zeros(batch, resid.dtype)
    (mean, var), _ = lax.scan(
        step, (zeros, zeros),
        (jnp.moveaxis(delta_b, -1, 0), jnp.moveaxis(resid_b, -1, 0)),
    )
    return mean, var
