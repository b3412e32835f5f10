"""Covariance functions.

Each kernel is a lightweight object holding static configuration; learnable
state is a dict of *raw* (unconstrained) arrays produced by ``init()`` and
passed explicitly to every evaluation — replacing gpytorch's stateful
``Kernel`` modules with pure functions that jit/vmap/shard cleanly.

Conventions:

* time inputs are 1-D grids ``(..., n)`` (the reference stores ``(n, 1)``
  columns for gpytorch; the trailing singleton carries no information for
  these stationary-in-index kernels and is dropped here);
* every kernel broadcasts over leading batch dimensions;
* ``diag=True`` returns the diagonal ``(..., n)`` without building the full
  matrix.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.constraints import Interval, Positive
from ..ops.volint import min_index_covariance, vol_integral

from ..utils.static import ConfigEq

__all__ = [
    "BMKernel",
    "FBMKernel",
    "OUKernel",
    "VolatilityKernel",
    "RBFKernel",
    "MaternKernel",
    "ScaleKernel",
    "SpectralMixtureKernel",
    "IndexKernel",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def _as_grid(x):
    """Accept ``(..., n)`` or gpytorch-style ``(..., n, 1)`` inputs."""
    x = jnp.asarray(x)
    if x.ndim >= 2 and x.shape[-1] == 1:
        x = x[..., 0]
    return x


class BMKernel(ConfigEq):
    """Brownian-motion covariance ``K(s, t) = vol * min(s, t)``.

    Parity: ``vol`` lives in ``Interval(0, 1)`` through a sigmoid transform
    and defaults to 0.2 (reference ``kernels/BMKernel.py:6-36``); note the
    covariance scales with ``vol``, *not* ``vol**2``.
    """

    def __init__(self, vol: float = 0.2, batch_shape: tuple = (),
                 vol_constraint: Optional[Interval] = None):
        self.batch_shape = tuple(batch_shape)
        self.constraint = vol_constraint or Interval(0.0, 1.0)
        self._init_vol = vol

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            (*self.batch_shape, 1),
            self.constraint.inverse(self._init_vol),
            dtype=dtype,
        )
        return {"raw_vol": raw}

    def vol(self, params):
        return self.constraint.forward(params["raw_vol"])

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        vol = self.vol(params)  # (..., 1)
        if diag:
            return vol * jnp.minimum(x1, x2)
        cov = jnp.minimum(x1[..., :, None], x2[..., None, :])
        return vol[..., None] * cov


class FBMKernel(ConfigEq):
    """Fractional-Brownian-motion covariance with Hurst parameter ``vol``.

    ``K(s, t) = (|s|^{2H} + |t|^{2H} - |s - t|^{2H}) / 2`` with ``H`` stored
    under the same ``Interval(0, 1)`` plumbing as :class:`BMKernel`
    (reference ``kernels/FBMKernel.py:38-59``).
    """

    def __init__(self, vol: float = 0.2, batch_shape: tuple = (),
                 vol_constraint: Optional[Interval] = None):
        self.batch_shape = tuple(batch_shape)
        self.constraint = vol_constraint or Interval(0.0, 1.0)
        self._init_vol = vol

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            (*self.batch_shape, 1),
            self.constraint.inverse(self._init_vol),
            dtype=dtype,
        )
        return {"raw_vol": raw}

    def vol(self, params):
        return self.constraint.forward(params["raw_vol"])

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        two_h = (2.0 * self.vol(params))[..., None]  # (..., 1, 1)
        if diag:
            # elementwise closed form, O(n) — no full-matrix build
            th = two_h[..., 0]
            return 0.5 * (
                jnp.abs(x1) ** th + jnp.abs(x2) ** th
                - jnp.abs(x1 - x2) ** th
            )
        s = jnp.abs(x1[..., :, None])
        t = jnp.abs(x2[..., None, :])
        d = jnp.abs(x1[..., :, None] - x2[..., None, :])
        return 0.5 * (s**two_h + t**two_h - d**two_h)

    def prior_cholesky(self, params, x, jitter=None, max_tries: int = 3):
        """Lower Cholesky of ``K(x, x)`` via the increment-domain identity.

        ``x`` must be an increasing non-negative grid (every consumer's
        grid is ``arange(1..n) * dt``).  Exact for the Gram matrix but
        factorized through the far-better-conditioned fGn increment
        covariance (:mod:`volt_tpu.ops.fbm`): float32-robust where the
        value-domain Cholesky fails outright (H ~ 0.9, n in the
        hundreds — the reference's gpytorch ladder raises ``NotPSDError``
        there, ``kernels/FBMKernel.py:38-59`` + gpytorch
        ``psd_safe_cholesky``).
        """
        from ..ops.fbm import fbm_cholesky

        return fbm_cholesky(_as_grid(x), 2.0 * self.vol(params),
                            jitter=jitter, max_tries=max_tries)

    def noise_cholesky(self, params, x, noise, jitter=None,
                       max_tries: int = 3):
        """Lower Cholesky of ``K(x, x) + noise I`` in increment domain."""
        from ..ops.fbm import fbm_noise_cholesky

        return fbm_noise_cholesky(_as_grid(x), 2.0 * self.vol(params),
                                  noise, jitter=jitter, max_tries=max_tries)


class OUKernel(ConfigEq):
    """Ornstein–Uhlenbeck / exponential kernel ``exp(-|s - t| / (2 l))``.

    Reference ``kernels/OUKernel.py:5-23`` divides the (non-squared)
    distance by the lengthscale and applies ``exp(-d / 2)``.  Lengthscale is
    positive via softplus (gpytorch's default lengthscale constraint).
    """

    def __init__(self, lengthscale: float = 0.6931, batch_shape: tuple = ()):
        self.batch_shape = tuple(batch_shape)
        self.constraint = Positive()
        self._init_lengthscale = lengthscale

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            (*self.batch_shape, 1),
            self.constraint.inverse(self._init_lengthscale),
            dtype=dtype,
        )
        return {"raw_lengthscale": raw}

    def lengthscale(self, params):
        return self.constraint.forward(params["raw_lengthscale"])

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        ell = self.lengthscale(params)
        if diag:
            return jnp.exp(-jnp.abs(x1 - x2) / ell / 2.0)
        d = jnp.abs(x1[..., :, None] - x2[..., None, :]) / ell[..., None]
        return jnp.exp(-d / 2.0)


class VolatilityKernel(ConfigEq):
    """The Volt covariance: ``K[i, j] = CumTrapz(vol^2, x)[min(i, j)]``.

    The flagship kernel (reference ``kernels/VolKernel.py:12-42``).  It has
    **no trainable parameters**; the volatility path is data, passed per
    call.  The reference builds the matrix with an index-meshgrid gather
    over a *single* time axis — i.e. it assumes the caller concatenates
    train and test onto one joint grid ("joint grid + slice" pattern,
    SURVEY.md preamble).  Here that contract is explicit: ``x`` *is* the
    joint grid and callers slice the result.

    TPU-native form: the running integral is a length-``n`` cumsum; the
    matrix is a broadcast + select (no gather), which XLA fuses into a
    single memory-bound pass.  See also
    :func:`volt_tpu.ops.volint.brownian_cholesky` for the closed-form
    factor that the fast rollout path uses instead of ever building ``K``.
    """

    def __init__(self, batch_shape: tuple = (),
                 integral_rule: str = "reference"):
        if integral_rule not in ("reference", "trapezoid"):
            raise ValueError("integral_rule must be 'reference' or "
                             "'trapezoid'")
        self.batch_shape = tuple(batch_shape)
        # quadrature for the running integral: "reference" replicates the
        # CumTrapz endpoint quirk (VolKernel.py:4-10; one-step forecast
        # std / sqrt(2) — quantified in PARITY.md); "trapezoid" is the
        # exact cumulative trapezoid rule, the fix-by-design opt-out.
        # Both assume the uniform grid every pipeline uses (dx = x1 - x0).
        self.integral_rule = integral_rule

    def init(self, dtype=jnp.float32):
        return {}

    def __call__(self, params, x, vol_path, diag: bool = False):
        del params
        x = _as_grid(x)
        vol_path = _as_grid(vol_path)
        if diag:
            return vol_integral(x, vol_path, self.integral_rule)
        if (
            self.integral_rule == "reference"
            and jax.default_backend() == "tpu"
            and x.ndim == 1
            and vol_path.ndim in (1, 2)
        ):
            # TPU default: the fused Pallas tile build (bit-identical to
            # the XLA twin, measured faster — PERFORMANCE.md), with
            # gradients through the XLA transpose.  The Pallas kernel
            # hard-codes the reference endpoint weights; the trapezoid
            # rule takes the XLA build below.
            from ..ops.pallas import volt_covariance_grad

            return volt_covariance_grad(x, vol_path)
        return min_index_covariance(
            vol_integral(x, vol_path, self.integral_rule)
        )

    def integral(self, x, vol_path):
        """Expose the running integral for closed-form Cholesky consumers."""
        return vol_integral(_as_grid(x), _as_grid(vol_path),
                            self.integral_rule)


class RBFKernel(ConfigEq):
    """``exp(-(s - t)^2 / (2 l^2))`` with softplus-positive lengthscale."""

    def __init__(self, lengthscale: float = 0.6931, batch_shape: tuple = ()):
        self.batch_shape = tuple(batch_shape)
        self.constraint = Positive()
        self._init_lengthscale = lengthscale

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            (*self.batch_shape, 1),
            self.constraint.inverse(self._init_lengthscale),
            dtype=dtype,
        )
        return {"raw_lengthscale": raw}

    def lengthscale(self, params):
        return self.constraint.forward(params["raw_lengthscale"])

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        ell = self.lengthscale(params)
        if diag:
            return jnp.exp(-((x1 - x2) ** 2) / (2.0 * ell * ell))
        d = (x1[..., :, None] - x2[..., None, :]) / ell[..., None]
        return jnp.exp(-0.5 * d * d)


class MaternKernel(ConfigEq):
    """Matérn covariance (default ``nu = 2.5``, gpytorch's default)."""

    def __init__(self, nu: float = 2.5, lengthscale: float = 0.6931,
                 batch_shape: tuple = ()):
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError("nu must be one of 0.5, 1.5, 2.5")
        self.nu = nu
        self.batch_shape = tuple(batch_shape)
        self.constraint = Positive()
        self._init_lengthscale = lengthscale

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            (*self.batch_shape, 1),
            self.constraint.inverse(self._init_lengthscale),
            dtype=dtype,
        )
        return {"raw_lengthscale": raw}

    def lengthscale(self, params):
        return self.constraint.forward(params["raw_lengthscale"])

    def _from_dist(self, d):
        if self.nu == 0.5:
            return jnp.exp(-d)
        if self.nu == 1.5:
            s = jnp.sqrt(3.0) * d
            return (1.0 + s) * jnp.exp(-s)
        s = jnp.sqrt(5.0) * d
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        ell = self.lengthscale(params)
        if diag:
            return self._from_dist(jnp.abs(x1 - x2) / ell)
        d = jnp.abs(x1[..., :, None] - x2[..., None, :]) / ell[..., None]
        return self._from_dist(d)


class ScaleKernel(ConfigEq):
    """``outputscale * base_kernel`` (softplus-positive outputscale)."""

    def __init__(self, base_kernel, outputscale: float = 0.6931,
                 batch_shape: tuple = ()):
        self.base_kernel = base_kernel
        self.batch_shape = tuple(batch_shape)
        self.constraint = Positive()
        self._init_outputscale = outputscale

    def init(self, dtype=jnp.float32):
        raw = jnp.full(
            self.batch_shape,
            self.constraint.inverse(self._init_outputscale),
            dtype=dtype,
        )
        return {"raw_outputscale": raw, "base": self.base_kernel.init(dtype)}

    def outputscale(self, params):
        return self.constraint.forward(params["raw_outputscale"])

    def __call__(self, params, x1, x2=None, diag: bool = False):
        base = self.base_kernel(params["base"], x1, x2, diag=diag)
        scale = self.outputscale(params)
        extra = 1 if diag else 2
        return scale[(...,) + (None,) * extra] * base


class SpectralMixtureKernel(ConfigEq):
    """Spectral-mixture kernel (Wilson & Adams 2013), 1-D inputs.

    ``K(tau) = sum_q w_q exp(-2 pi^2 tau^2 s_q^2) cos(2 pi tau mu_q)``.
    All of weights / means / scales are softplus-positive.
    ``initialize_from_data`` reproduces the reference baseline's heuristic:
    mixture scales drawn from a distribution bounded by the data range,
    means uniform below the Nyquist frequency implied by the minimum
    spacing, weights set to the target std (cf. gpytorch
    ``SpectralMixtureKernel.initialize_from_data``, used by
    ``models/BasicGPModels.py:24``).
    """

    def __init__(self, num_mixtures: int = 10, batch_shape: tuple = ()):
        self.num_mixtures = num_mixtures
        self.batch_shape = tuple(batch_shape)
        self.constraint = Positive()

    def init(self, dtype=jnp.float32, key=None):
        q = self.num_mixtures
        shape = (*self.batch_shape, q)
        if key is None:
            key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        means = jax.random.exponential(k1, shape, dtype)
        scales = jax.random.exponential(k2, shape, dtype)
        weights = jax.random.uniform(k3, shape, dtype, 0.5, 1.5) / q
        return {
            "raw_weights": self.constraint.inverse(weights),
            "raw_means": self.constraint.inverse(means),
            "raw_scales": self.constraint.inverse(scales),
        }

    def initialize_from_data(self, params, x, y, key=None):
        """Data-driven re-init: scales ~ 1/range, means < Nyquist, weights ~ std(y)."""
        x = _as_grid(x)
        if key is None:
            key = jax.random.key(0)
        q = self.num_mixtures
        shape = (*self.batch_shape, q)
        xs = jnp.sort(x, axis=-1)
        spacing = jnp.diff(xs, axis=-1)
        min_dist = jnp.min(jnp.where(spacing > 0, spacing, jnp.inf), axis=-1)
        max_dist = xs[..., -1] - xs[..., 0]
        k1, k2 = jax.random.split(key)
        # gpytorch draws the RECIPROCAL of |randn| * max_dist (heavy-
        # tailed, unbounded above), not |randn| / max_dist; the 1e-6
        # floor on |z| only guards the measure-zero division blowup.
        z = jnp.abs(jax.random.normal(k1, shape, x.dtype))
        scales = 1.0 / (jnp.maximum(z, 1e-6) * max_dist[..., None])
        means = (
            jax.random.uniform(k2, shape, x.dtype)
            * 0.5
            / jnp.maximum(min_dist[..., None], 1e-12)
        )
        weights = jnp.broadcast_to(jnp.std(y, axis=-1)[..., None] / q, shape)
        return {
            "raw_weights": self.constraint.inverse(weights),
            "raw_means": self.constraint.inverse(means),
            "raw_scales": self.constraint.inverse(scales),
        }

    def __call__(self, params, x1, x2=None, diag: bool = False):
        x1 = _as_grid(x1)
        x2 = x1 if x2 is None else _as_grid(x2)
        w = self.constraint.forward(params["raw_weights"])
        mu = self.constraint.forward(params["raw_means"])
        s = self.constraint.forward(params["raw_scales"])
        if diag:
            tau = (x1 - x2)[..., None]  # (..., n, q)
            comp = jnp.exp(-2.0 * jnp.pi**2 * tau**2 * s[..., None, :] ** 2)
            comp = comp * jnp.cos(2.0 * jnp.pi * tau * mu[..., None, :])
            return jnp.sum(w[..., None, :] * comp, axis=-1)
        tau = (x1[..., :, None] - x2[..., None, :])[..., None]  # (..., n, m, q)
        sq = s[..., None, None, :]
        mq = mu[..., None, None, :]
        comp = jnp.exp(-2.0 * jnp.pi**2 * tau**2 * sq**2) * jnp.cos(
            2.0 * jnp.pi * tau * mq
        )
        return jnp.sum(w[..., None, None, :] * comp, axis=-1)


class IndexKernel(ConfigEq):
    """Low-rank-plus-diagonal task covariance ``B = F F^T + diag(v)``.

    The task kernel of the Kronecker multitask models (reference
    ``models/multi_task_variational_gp.py:32``); ``v`` positive via softplus.
    """

    def __init__(self, num_tasks: int, rank: int = 1):
        self.num_tasks = num_tasks
        self.rank = rank
        self.constraint = Positive()

    def init(self, dtype=jnp.float32, key=None):
        if key is None:
            key = jax.random.key(0)
        factor = jax.random.normal(key, (self.num_tasks, self.rank), dtype)
        return {
            "covar_factor": factor,
            "raw_var": jnp.zeros((self.num_tasks,), dtype),
        }

    def factor_and_diag(self, params):
        """The explicit low-rank-plus-diagonal pieces ``(F, v)`` of
        ``B = F F^T + diag(v)`` — consumed by the Woodbury multitask MLL
        (``gp/kronecker.kron_mvn_log_prob_blockdiag_lowrank``)."""
        return params["covar_factor"], self.constraint.forward(
            params["raw_var"]
        )

    def covar_matrix(self, params):
        f, v = self.factor_and_diag(params)
        return jnp.matmul(f, jnp.swapaxes(f, -1, -2), precision=_HIGHEST) + jnp.diag(v)

    def __call__(self, params, i1=None, i2=None, diag: bool = False):
        b = self.covar_matrix(params)
        if i1 is None:
            return b
        if diag:
            return b[..., i1, i2 if i2 is not None else i1]
        i2 = i1 if i2 is None else i2
        return b[..., i1[:, None], i2[None, :]]
