"""PSD-safe Cholesky and triangular-solve primitives.

The reference relies on GPyTorch's exception-driven ``psd_safe_cholesky``
(jitter retry on failure; invoked with explicit ``jitter=1e-4`` in the
rollout hot loop, reference ``rollout_utils.py:35,46``).  Exceptions cannot
live under ``jit``, so the TPU-native equivalent is a *deterministic jitter
ladder* expressed as ``lax.while_loop`` control flow: attempt the factor,
detect failure through NaNs on the diagonal (XLA's Cholesky reports failure
as NaN rather than raising), and escalate ``jitter * 10**i`` exactly like the
reference's retry loop.

Everything here supports arbitrary leading batch dimensions and is
``vmap``/``pjit`` safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "psd_safe_cholesky",
    "cholesky_solve",
    "solve_lower_triangular",
    "solve_upper_triangular",
    "tril_inverse_quad",
    "add_jitter",
]


def add_jitter(a, jitter):
    """``a + jitter * I`` over the trailing two dims (batched)."""
    n = a.shape[-1]
    return a + jitter * jnp.eye(n, dtype=a.dtype)


def _default_jitter(dtype) -> float:
    # Matches gpytorch's dtype-based starting jitter (1e-6 for float32,
    # 1e-8 for float64).
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-8
    return 1e-6


def _chol_ok(chol):
    """A Cholesky attempt succeeded iff every diagonal entry is finite and > 0."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(diag) & (diag > 0))


def _jitter_ladder(a, base_jitter: float, max_tries: int):
    """Forward-only jitter escalation (not differentiable by itself)."""
    first = jnp.linalg.cholesky(a)

    def cond(state):
        i, chol = state
        return (~_chol_ok(chol)) & (i < max_tries)

    def body(state):
        i, _ = state
        eps = base_jitter * (10.0 ** i)
        return i + 1, jnp.linalg.cholesky(add_jitter(a, jnp.asarray(eps, a.dtype)))

    _, chol = lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), first))
    return chol


def _phi(x):
    """Lower triangle with the diagonal halved (Cholesky VJP mask)."""
    return jnp.tril(x) / (1.0 + jnp.eye(x.shape[-1], dtype=x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _psd_safe_cholesky(a, base_jitter: float, max_tries: int):
    return _jitter_ladder(a, base_jitter, max_tries)


def _psd_safe_cholesky_fwd(a, base_jitter, max_tries):
    chol = _jitter_ladder(a, base_jitter, max_tries)
    return chol, chol


def _psd_safe_cholesky_bwd(base_jitter, max_tries, chol, g):
    # Standard Cholesky reverse-mode (Murray 2016), built from the factor
    # that the forward ladder actually produced — a single factorization
    # total, and gradients that agree with jnp.linalg.cholesky whenever no
    # jitter was needed.
    # HIGHEST: bf16 here would degrade the gradients of every GP loss
    m = _phi(jnp.matmul(jnp.swapaxes(chol, -1, -2), g,
                        precision=lax.Precision.HIGHEST))
    x1 = lax.linalg.triangular_solve(
        chol, m, left_side=True, lower=True, transpose_a=True
    )
    x2 = lax.linalg.triangular_solve(
        chol, x1, left_side=False, lower=True, transpose_a=False
    )
    grad = 0.5 * (x2 + jnp.swapaxes(x2, -1, -2))
    return (grad,)


_psd_safe_cholesky.defvjp(_psd_safe_cholesky_fwd, _psd_safe_cholesky_bwd)


def psd_safe_cholesky(a, jitter: float | None = None, max_tries: int = 3):
    """Cholesky with a deterministic jitter-escalation ladder.

    Semantics mirror the reference's ``psd_safe_cholesky``: first try the
    bare factorization; on failure add ``jitter * 10**i`` to the diagonal for
    ``i = 0..max_tries-1``.  ``jitter=None`` selects the dtype default
    (1e-6 float32 / 1e-8 float64).

    Returns the lower-triangular factor.  If every attempt fails, the final
    (NaN-carrying) attempt is returned — downstream reductions surface the
    NaNs, the jit-safe analogue of raising ``NotPSDError``.

    Reverse-differentiable via a custom VJP (the ladder itself runs only in
    the forward pass; the backward pass reuses the produced factor).
    """
    a = jnp.asarray(a)
    base_jitter = _default_jitter(a.dtype) if jitter is None else float(jitter)
    return _psd_safe_cholesky(a, base_jitter, int(max_tries))


def _broadcast_batch(chol, b):
    """Broadcast leading batch dims of a factor and right-hand side."""
    batch = jnp.broadcast_shapes(chol.shape[:-2], b.shape[:-2])
    chol = jnp.broadcast_to(chol, (*batch, *chol.shape[-2:]))
    b = jnp.broadcast_to(b, (*batch, *b.shape[-2:]))
    return chol, b


def solve_lower_triangular(chol, b):
    """Solve ``L x = b`` with ``L`` lower triangular (batch-broadcasting)."""
    chol, b = _broadcast_batch(chol, b)
    return lax.linalg.triangular_solve(
        chol, b, left_side=True, lower=True, transpose_a=False
    )


def solve_upper_triangular(chol, b):
    """Solve ``L^T x = b`` with ``L`` lower triangular (batch-broadcasting)."""
    chol, b = _broadcast_batch(chol, b)
    return lax.linalg.triangular_solve(
        chol, b, left_side=True, lower=True, transpose_a=True
    )


def cholesky_solve(chol, b):
    """Solve ``(L L^T) x = b`` given the lower Cholesky factor (batched).

    Equivalent to ``torch.cholesky_solve(b, L)``.
    """
    return solve_upper_triangular(chol, solve_lower_triangular(chol, b))


def tril_inverse_quad(chol, b):
    """``b^T (L L^T)^{-1} b`` summed over the matrix dimension.

    ``b`` has shape ``(..., n)`` or ``(..., n, k)``; returns the quadratic
    form reduced over ``n`` (and over ``k`` columns independently when 2-D).
    """
    squeeze = b.ndim == chol.ndim - 1
    if squeeze:
        b = b[..., None]
    w = solve_lower_triangular(chol, b)
    out = jnp.sum(w * w, axis=-2)
    if squeeze:
        out = out[..., 0]
    return out
