"""Closed-form linear algebra for Brownian (min) kernels.

``M[i, j] = min(x_i, x_j)`` (sorted positive ``x``) factors analytically:
``M = L L^T`` with ``L = T D``, where ``T`` is the lower-triangular ones
matrix and ``D = diag(sqrt(dx))``, ``dx_j = x_j - x_{j-1}`` (``x_{-1}=0``).
Consequently

* ``L^{-1} b = diff(b) / sqrt(dx)``            — O(n), no factorization;
* ``L^{-T} b = backward-diff(b / sqrt(dx))``   — O(n)
  (``z_i = c_i - c_{i+1}``; reverse-cumsum is ``L^T``'s *forward* action
  scaled, not its inverse — see :func:`bm_solve_upper`);
* ``logdet M = sum log dx``                    — O(n);
* ``M + s I`` diagonalizes through the *fixed* eigendecomposition of ``M``
  once per grid: ``vol*M + s I = Q (vol*lam + s) Q^T`` for every
  ``(vol, s)`` — one O(n^3) factorization per **fit**, O(n^2) per
  training iteration.

This is what makes the GPCV/vol-GP training loops factorization-free: the
reference's per-iteration GPyTorch Cholesky (SURVEY.md §3.1-3.2 hot loops)
becomes a diff-and-scale.  The scaled kernel ``K = vol * M`` just carries
``vol`` through: ``chol(K) = sqrt(vol) L``, ``logdet K = n log vol +
logdet M``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "bm_increments",
    "bm_solve_lower",
    "bm_solve_upper",
    "bm_logdet",
    "bm_kl_against_prior",
    "future_grid_ok",
    "min_kernel_eigenvalues",
    "min_kernel_project",
    "min_kernel_spectrum",
    "spectral_n_ok",
]


def future_grid_ok(test_x, train_x):
    """Traced check of the Markov forecast contract: ``test_x`` strictly
    increasing and strictly after the last train point.

    The filtered-state closed forms (``BMGP.sample_forecast`` /
    ``posterior_forecast``, the multitask Matheron sampler) are exact
    ONLY on such grids.  This is the jit-safe runtime complement of the
    host-side probe in :mod:`volt_tpu.rollouts`: the fast samplers
    ``jnp.where`` their outputs against it, so a contract-violating grid
    inside a user's ``jit`` produces all-NaN output (a loud failure)
    instead of a silently wrong distribution.  Returns a boolean with the
    broadcast batch shape of the grids.
    """
    test_x = jnp.asarray(test_x)
    train_x = jnp.asarray(train_x)
    inc_ok = (
        jnp.all(jnp.diff(test_x, axis=-1) > 0, axis=-1)
        if test_x.shape[-1] > 1
        else jnp.ones(test_x.shape[:-1], bool)
    )
    return inc_ok & (test_x[..., 0] > train_x[..., -1])


def nan_poison(x, ok):
    """``x`` where ``ok`` else NaN — as *arithmetic*, not a select.

    ``x * (ok / ok)`` multiplies by exactly 1.0 when ``ok`` (bit-exact for
    every normal/inf value of ``x``; backends with flush-to-zero multiply,
    e.g. XLA:CPU, flush subnormals) and by ``0/0 = NaN`` otherwise.  A plain
    ``jnp.where(ok, x, nan)`` is NOT reliable here: XLA:CPU commutes unary
    transcendentals with selects and mis-folds the constant-NaN branch
    (observed: ``jit(exp(where(pred, x, nan)))`` with a traced false
    predicate returning denormal garbage instead of NaN), whereas a NaN
    produced by runtime arithmetic propagates through every downstream op.
    ``ok`` broadcasts against ``x`` from the left as usual — pass it
    pre-expanded (e.g. ``ok[..., None]``).
    """
    okf = jnp.asarray(ok).astype(jnp.result_type(x))
    return x * (okf / okf)

def spectral_n_ok(n: int) -> bool:
    """Whether :func:`min_kernel_spectrum` is exact at this ``n``.

    The integer angle reduction computes ``(2k+1) * j`` with
    ``k <= n-1, j <= n`` — max intermediate ``(2n-1) n`` — in int32;
    beyond ``n = 32768`` the products overflow and the eigenvectors
    silently degrade.  This bound applies ONLY to the materialized
    ``n x n`` basis: :func:`min_kernel_project` dispatches to an FFT
    transform above its crossover (well inside the bound), so the
    spectral MLL paths themselves are valid at any ``n`` and the
    auto-selecting callers (``train.py``, ``parallel/pipeline.py``) no
    longer consult this predicate.
    """
    return (2 * n - 1) * n < 2**31


def min_kernel_spectrum(n: int, dtype=jnp.float32):
    """Closed-form eigensystem of the 1-indexed integer min-matrix.

    ``M[i, j] = min(i, j)`` (``i, j = 1..n``) has the exact DST-like
    eigensystem

        ``mu_k = 1 / (4 sin^2((2k+1) pi / (2(2n+1))))``
        ``u_k[j] = 2/sqrt(2n+1) * sin((2k+1) j pi / (2n+1))``

    so no factorization is ever needed on an equispaced grid
    (``min(x_i, x_j) = (x0 - dx) 11^T + dx M`` for ``x_i = x0 + i dx``).
    The sine arguments are reduced with *integer* modular arithmetic
    (exact in int32 for n up to ~30k) so float32 ``sin`` stays accurate
    at large ``n`` where the raw arguments reach ``~2 n pi``.

    Returns ``(mu (n,), u (n, n) orthonormal columns, w (n,) = U^T 1)``.
    Consumed by ``BMGP.spectral_cache`` and
    ``MultitaskBMGP.spectral_cache``.

    Raises for ``n`` beyond the int32-exact angle-reduction bound
    (:func:`spectral_n_ok`) instead of returning silently wrong
    eigenvectors; auto-selecting callers check the bound and use the
    Kalman path instead.
    """
    if not spectral_n_ok(n):
        raise ValueError(
            f"min_kernel_spectrum: n={n} overflows the int32 angle "
            f"reduction (needs (2n-1)n < 2^31, i.e. n <= 32768); use the "
            f"Kalman MLL path for longer series"
        )
    k = jnp.arange(n)
    mu = 1.0 / (
        4.0 * jnp.sin((2 * k + 1) * (math.pi / (2 * (2 * n + 1)))) ** 2
    )
    j = jnp.arange(1, n + 1)
    prod = ((2 * k[None, :] + 1) * j[:, None]) % (2 * (2 * n + 1))
    u = jnp.sin(prod * (math.pi / (2 * n + 1))) * (
        2.0 / math.sqrt(2 * n + 1)
    )
    return (jnp.asarray(mu, dtype), jnp.asarray(u, dtype),
            jnp.sum(jnp.asarray(u, dtype), axis=0))


def min_kernel_eigenvalues(n: int, dtype=jnp.float32):
    """Eigenvalues ``mu_k`` of the integer min-matrix alone — O(n), any n.

    The angles ``(2k+1) pi / (2(2n+1))`` lie in ``(0, pi/2)`` for every
    ``k < n``, so unlike the eigenvector build there is no argument
    reduction and no int32 bound: exact at any ``n``.
    """
    k = jnp.arange(n)
    mu = 1.0 / (
        4.0 * jnp.sin((2 * k + 1) * (math.pi / (2 * (2 * n + 1)))) ** 2
    )
    return jnp.asarray(mu, dtype)


# Above this length the projection drops the materialized n x n basis for
# the O(n log n) FFT transform below; the memory crossover is what
# matters (the basis is ~67 MB f32 at 4096, ~1 GB at 16384), and both
# branches agree to float32 noise (pinned in tests).
_PROJECT_FFT_MIN_N = 4096


def min_kernel_project(y, axis: int = -1, method: str = "auto"):
    """``U^T y`` for the closed-form min-matrix eigenbasis, along ``axis``.

    ``(U^T y)[k] = 2/sqrt(2n+1) * sum_{j=1..n} y_j sin((2k+1) j pi /
    (2n+1))`` — the odd-frequency half of a DST on the length-``2n+1``
    circle.  Two evaluation strategies:

    * ``"matmul"`` — one einsum against the materialized basis
      (:func:`min_kernel_spectrum`): MXU-friendly and cheap at small
      ``n``, but O(n^2) memory and bounded by ``spectral_n_ok``.
    * ``"fft"`` — a Bluestein chirp-z evaluation with POWER-OF-TWO FFTs
      only: with ``theta = pi/m``, the identity ``2jk = j^2 + k^2 -
      (j-k)^2`` turns the sum into

          ``S[k] = -Im( e^{-i theta k^2} *
                        sum_j [y_j e^{-i theta (j^2+j)}] e^{i theta (j-k)^2}
                      ) * 2/sqrt(m)``

      — a linear convolution against the symmetric chirp
      ``c_t = e^{i theta t^2}``, computed by three length-``L`` FFTs
      with ``L = nextpow2(3n)``.  O(n log n) time, O(n) memory, no n x n
      object, valid for ANY ``n`` — this lifts the spectral MLL paths
      past the materialized basis' 32k bound and removes the last
      quadratic-in-n allocation from the pipeline.  Power-of-two lengths
      matter: XLA:TPU lowers other FFT sizes as a *materialized dense
      DFT matrix* (observed: a direct length-80001 FFT at n=40000
      allocates f32[80001, 80001] = 25.6 GB and OOMs), so the textbook
      odd-length transform is exactly the wrong shape for this backend.
      Chirp phase indices ``(j^2+j) mod 2m`` are reduced host-side in
      int64 (they overflow int32 past n ~ 46k), keeping every traced
      angle in ``[0, 2 pi)``.

    ``"auto"`` (default) picks matmul below ``_PROJECT_FFT_MIN_N`` and
    FFT above.  Linear in ``y`` either way; consumed once per fit by
    ``BMGP.spectral_cache`` / ``MultitaskBMGP.spectral_cache``.
    """
    import numpy as np

    y = jnp.asarray(y)
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    if method not in ("auto", "matmul", "fft"):
        raise ValueError("method must be 'auto', 'matmul' or 'fft'")
    if method == "matmul" or (method == "auto" and n <= _PROJECT_FFT_MIN_N):
        _, u, _ = min_kernel_spectrum(n, y.dtype)
        out = jnp.einsum("...j,jk->...k", y, u,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out, -1, axis)
    m = 2 * n + 1
    theta = math.pi / m
    # host-side int64 phase-index reduction (n is static): e^{-i theta q}
    # is periodic in q with period 2m, so reduce the quadratic indices
    # exactly before any float sees them
    j = np.arange(n + 1, dtype=np.int64)
    qb = (j * j + j) % (2 * m)                        # input chirp
    t = np.arange(-n, n - 1, dtype=np.int64)
    qc = (t * t) % (2 * m)                            # convolution chirp
    k = np.arange(n, dtype=np.int64)
    qk = (k * k) % (2 * m)                            # output chirp
    ph_b = jnp.exp(-1j * (theta * jnp.asarray(qb[1:], y.dtype)))
    ph_c = jnp.exp(1j * (theta * jnp.asarray(qc, y.dtype)))
    ph_k = jnp.exp(-1j * (theta * jnp.asarray(qk, y.dtype)))
    lfft = 1 << (3 * n - 1).bit_length()
    b = jnp.zeros((*y.shape[:-1], lfft), ph_b.dtype)
    b = b.at[..., 1:n + 1].set(y * ph_b)
    c = jnp.zeros((lfft,), ph_c.dtype).at[:2 * n - 1].set(ph_c)
    conv = jnp.fft.ifft(jnp.fft.fft(b, axis=-1) * jnp.fft.fft(c), axis=-1)
    out = -jnp.imag(ph_k * conv[..., n:2 * n]) * (2.0 / math.sqrt(m))
    return jnp.moveaxis(out.astype(y.dtype), -1, axis)


def bm_increments(x):
    """``dx_j = x_j - x_{j-1}`` with ``x_{-1} = 0`` (must be positive)."""
    x = jnp.asarray(x)
    return jnp.diff(x, axis=-1, prepend=jnp.zeros_like(x[..., :1]))


def bm_solve_lower(x, b, axis: int = -1):
    """``L^{-1} b`` for ``L = chol(min(x))`` along ``axis`` of ``b``: O(n)."""
    dx = bm_increments(x)
    b = jnp.moveaxis(b, axis, -1)
    out = jnp.diff(b, axis=-1, prepend=jnp.zeros_like(b[..., :1]))
    out = out / jnp.sqrt(dx)
    return jnp.moveaxis(out, -1, axis)


def bm_solve_upper(x, b, axis: int = -1):
    """``L^{-T} b``: backward difference of ``b / sqrt(dx)``.

    ``L^T = D T^T`` with ``T^T`` the upper-ones matrix, whose inverse is the
    upper bidiagonal difference ``z_i - z_{i+1}``.
    """
    dx = bm_increments(x)
    b = jnp.moveaxis(b, axis, -1)
    scaled = b / jnp.sqrt(dx)
    out = scaled - jnp.concatenate(
        [scaled[..., 1:], jnp.zeros_like(scaled[..., :1])], -1
    )
    return jnp.moveaxis(out, -1, axis)


def bm_logdet(x):
    """``logdet min(x) = sum log dx``."""
    return jnp.sum(jnp.log(bm_increments(x)), axis=-1)


def bm_kl_against_prior(x, vol, mean_q, chol_q, mean_p, jitter: float = 1e-6):
    """``KL(N(mean_q, Cq Cq^T) || N(mean_p, vol * min(x)))`` — O(n^2).

    The prior-side solves use the analytic bidiagonal inverse; the only
    O(n^2) work is differencing the columns of ``Cq``.  Matches
    :func:`volt_tpu.ops.mvn.mvn_kl` against the dense factorization.

    Grids routinely start at ``x_0 = 0`` (the reference's
    ``arange(n-1) * dt``), which makes the prior singular; the dense path
    survives via the jitter ladder (``K + jitter I``).  Here the same
    regularization lands in the increment domain: increments are floored at
    ``jitter / vol``, which reproduces the ``jitter`` marginal variance on
    the singular first point and leaves nonsingular increments untouched.
    """
    n = mean_q.shape[-1]
    vol0 = vol[..., 0] if (hasattr(vol, "ndim") and vol.ndim) else vol
    dx = jnp.maximum(bm_increments(x), jitter / vol0)
    sqrt_dx = jnp.sqrt(dx)

    def solve_lower(b, axis=-1):
        b = jnp.moveaxis(b, axis, -1)
        out = jnp.diff(b, axis=-1, prepend=jnp.zeros_like(b[..., :1]))
        return jnp.moveaxis(out / sqrt_dx, -1, axis)

    chol_q = jnp.tril(chol_q)
    a = solve_lower(chol_q, axis=-2)
    trace = jnp.sum(a * a, axis=(-2, -1)) / vol0
    d = solve_lower(mean_p - mean_q)
    quad = jnp.sum(d * d, axis=-1) / vol0
    logdet_p = n * jnp.log(vol0) + jnp.sum(jnp.log(dx), axis=-1)
    logdet_q = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_q, axis1=-2, axis2=-1))), axis=-1
    )
    return 0.5 * (trace + quad - n + logdet_p - logdet_q)
