"""The volatility time-integral underlying the Volt covariance.

The Volt price kernel is ``K[i, j] = I[min(i, j)]`` where
``I = CumTrapz(vol**2, x)`` (reference ``kernels/VolKernel.py:4-42``).  The
reference's ``CumTrapz`` uses a *uniform* step ``dx = x[1] - x[0]`` with the
first **and last** weights halved before the running sum — a slightly
nonstandard endpoint rule that we replicate exactly (it is a documented
parity trap: the last grid point's weight changes as the rollout grid grows).

Because ``I`` is a cumulative sum of non-negative increments, the full
covariance never needs a gather:  ``K[i, j] = where(i <= j, I[i], I[j])`` is
a rank-1 broadcast + select that XLA fuses into a single VPU pass, and the
same structure gives the *analytic Cholesky* ``L[i, j] = sqrt(I[j] - I[j-1])``
for ``j <= i`` (time-changed Brownian motion), which the fast rollout path
exploits.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "cumtrapz_weights",
    "vol_integral",
    "min_index_covariance",
    "brownian_cholesky",
]


def cumtrapz_weights(x):
    """Reference ``CumTrapz`` weights: uniform ``dx`` with both endpoints halved."""
    x = jnp.asarray(x)
    dx = (x[..., 1] - x[..., 0])[..., None]
    w = jnp.broadcast_to(dx, x.shape)
    n = x.shape[-1]
    scale = jnp.ones((n,), x.dtype).at[0].set(0.5).at[-1].set(0.5)
    return w * scale


def vol_integral(x, vol, rule: str = "reference"):
    """``I_j = integral of vol**2 up to x[j]`` along the last axis.

    ``x`` is the (sorted, uniform) time grid, ``vol`` the volatility path;
    both may carry leading batch dims (broadcast against each other).

    ``rule`` selects the quadrature:

    * ``"reference"`` (default) — the reference's ``CumTrapz``
      (``VolKernel.py:4-10``): cumsum of uniform weights with the grid's
      first AND last weight halved.  Every *prefix* therefore carries the
      last point at full weight except the final one — a documented parity
      quirk whose consequence (one-step forecast std ``/sqrt(2)``) is
      quantified in PARITY.md.
    * ``"trapezoid"`` — the exact cumulative trapezoid rule over the grid,
      with the first point carrying the time-from-zero mass
      ``I_0 = x_0 * v_0^2`` (constant extension of the vol path to
      ``t = 0`` — the same convention the BM prior uses for its first
      increment, :func:`volt_tpu.ops.bidiag.min_precision`); thereafter
      each increment is ``dx * (v_j^2 + v_{j-1}^2) / 2``, so rollout
      one-step variances carry full weight.  The principled opt-out from
      the reference quirk.  ``I_0 > 0`` on the pipelines' ``x_0 = dx``
      grids keeps the min-kernel Gram nonsingular (the dense conditional
      oracles factor it jitterless).

    Both rules assume the uniform grid every pipeline uses
    (``dx = x[1] - x[0]``; non-uniform grids are not supported here).
    """
    if rule == "reference":
        return jnp.cumsum(cumtrapz_weights(x) * vol * vol, axis=-1)
    if rule == "trapezoid":
        x = jnp.asarray(x)
        vol = jnp.asarray(vol)
        dx = (x[..., 1] - x[..., 0])[..., None]
        v2 = vol * vol
        x0 = jnp.broadcast_to(x[..., :1], v2[..., :1].shape)
        inc0 = x0 * v2[..., :1]
        incs = 0.5 * dx * (v2[..., 1:] + v2[..., :-1])
        return jnp.cumsum(jnp.concatenate([inc0, incs], axis=-1), axis=-1)
    raise ValueError(f"unknown integral rule {rule!r} "
                     "(expected 'reference' or 'trapezoid')")


def min_index_covariance(integral):
    """``K[i, j] = integral[..., min(i, j)]`` without a gather.

    Exact for any ``integral`` (uses index comparison, not value ``min``), so
    it stays faithful even if the running integral were non-monotone.
    """
    n = integral.shape[-1]
    ii = jnp.arange(n)[:, None]
    jj = jnp.arange(n)[None, :]
    return jnp.where(ii <= jj, integral[..., :, None], integral[..., None, :])


def brownian_cholesky(integral, jitter: float = 0.0):
    """Closed-form lower Cholesky of ``min_index_covariance(integral)``.

    For nondecreasing ``I`` the min-kernel is the covariance of a
    time-changed Brownian motion, so ``L[i, j] = sqrt(I[j] - I[j-1])`` for
    ``j <= i`` (with ``I[-1] = 0``).  ``jitter`` adds ``jitter`` to each
    increment's square (i.e. factors ``K + jitter*I`` approximately — exact
    only in the increment domain; used for numerical floors, not parity).
    """
    inc = jnp.diff(integral, axis=-1, prepend=jnp.zeros_like(integral[..., :1]))
    col = jnp.sqrt(jnp.maximum(inc + jitter, 0.0))
    n = integral.shape[-1]
    tril = jnp.tril(jnp.ones((n, n), integral.dtype))
    return tril * col[..., None, :]
