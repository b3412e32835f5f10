"""Likelihood implementations."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.constraints import GreaterThan, Interval, Positive
from ..ops.quadrature import DEFAULT_NUM_LOCS, expected_value

from ..utils.static import ConfigEq

__all__ = [
    "GaussianLikelihood",
    "MultitaskGaussianLikelihood",
    "VolatilityGaussianLikelihood",
]

_LOG_2PI = math.log(2.0 * math.pi)


class GaussianLikelihood(ConfigEq):
    """Homoskedastic Gaussian noise.

    ``noise = softplus(raw_noise) + 1e-4`` (gpytorch's default
    ``GreaterThan(1e-4)`` constraint).  ``raw_noise`` inits to 0, i.e.
    ``noise ~= 0.6932`` — and note the reference's two "noise pins":

    * ``lh.raw_noise.data = 1e-5`` (``train_utils.py:107``) sets the *raw*
      value, leaving noise at ~0.6932;
    * ``vol_lh.noise.data = 1e-2`` (``train_utils.py:71``) mutates a
      *computed* tensor and is a silent no-op in the reference.

    Both are replicated by initializing ``raw_noise`` accordingly (pass
    ``raw_noise_init``).
    """

    def __init__(self, batch_shape: tuple = (), noise_constraint=None):
        self.batch_shape = tuple(batch_shape)
        self.constraint = noise_constraint or GreaterThan(1e-4)

    def init(self, dtype=jnp.float32, raw_noise_init: float = 0.0):
        return {
            "raw_noise": jnp.full((*self.batch_shape, 1), raw_noise_init, dtype)
        }

    def init_with_noise(self, noise: float, dtype=jnp.float32):
        """Init from a *transformed* noise value (the working setter path)."""
        raw = self.constraint.inverse(noise)
        return {"raw_noise": jnp.full((*self.batch_shape, 1), raw, dtype)}

    def noise(self, params):
        return self.constraint.forward(params["raw_noise"])

    def marginal_covariance(self, params, cov):
        """``K + sigma^2 I`` over the trailing two dims."""
        n = cov.shape[-1]
        noise = self.noise(params)[..., 0]
        return cov + noise[..., None, None] * jnp.eye(n, dtype=cov.dtype)

    def log_prob(self, params, y, f):
        noise = self.noise(params)
        return -0.5 * ((y - f) ** 2 / noise + jnp.log(noise) + _LOG_2PI)


class MultitaskGaussianLikelihood(GaussianLikelihood):
    """Global noise shared across ``num_tasks`` outputs.

    The reference uses gpytorch's ``MultitaskGaussianLikelihood`` with
    ``noise = 1e-3`` set through the (working) property setter
    (``models/VoltronGP.py:47-48``).
    """

    def __init__(self, num_tasks: int, batch_shape: tuple = ()):
        super().__init__(batch_shape=batch_shape)
        self.num_tasks = num_tasks


class VolatilityGaussianLikelihood(ConfigEq):
    """Heteroscedastic volatility observation model: ``y ~ N(0, scale(f))``.

    Parameterizations (reference ``likelihoods/volatility_likelihood.py``):

    * ``"cv"`` — Wilson & Ghahramani copula-process form:
      ``scale = sum_k a_k * log(1 + exp(b_k f + c_k))`` with ``K=5``
      constrained parameter triplets (``a`` positive, ``b`` in (0, 3),
      ``c`` in (-3, 3); random uniform init).
    * ``"exp"`` — ``scale = exp(f)`` (no learnable parameters).

    ``scale`` is clamped at ``1e-3`` in both cases.  ``expected_log_prob``
    marginalizes over ``f ~ N(mean, var)`` by Gauss–Hermite quadrature
    (75 nodes by default, matching ``train_utils.py:52``).
    """

    def __init__(self, K: int = 5, batch_shape: tuple = (), param: str = "cv"):
        if param not in ("cv", "exp"):
            raise ValueError("param must be 'cv' or 'exp'")
        self.K = K
        self.batch_shape = tuple(batch_shape)
        self.param = param
        self.a_constraint = Positive()
        self.b_constraint = Interval(0.0, 3.0)
        self.c_constraint = Interval(-3.0, 3.0)

    def init(self, dtype=jnp.float32, key=None):
        if self.param == "exp":
            return {}
        if key is None:
            key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        shape = (*self.batch_shape, self.K)
        return {
            "raw_a": jax.random.uniform(k1, shape, dtype),
            "raw_b": 0.1 * jax.random.uniform(k2, shape, dtype),
            "raw_c": jax.random.uniform(k3, shape, dtype),
        }

    def trans_a(self, params):
        return self.a_constraint.forward(params["raw_a"])

    def trans_b(self, params):
        return self.b_constraint.forward(params["raw_b"])

    def trans_c(self, params):
        return self.c_constraint.forward(params["raw_c"])

    def scale(self, params, f):
        """Observation scale (std) as a function of the latent ``f``.

        Overflow guards (both invisible below float32 overflow): the cv
        form uses the softplus identity for ``log(1 + exp(.))``, and the
        exp form caps ``f`` at 80 — Gauss–Hermite tail nodes of a
        wide-variance ``q`` otherwise push ``exp(f)`` to ``inf`` and the
        weighted quadrature sum to NaN (observed at n=1000 with the
        reference's x10-inflated Laplace init).
        """
        if self.param == "cv":
            t = jax.nn.softplus(
                self.trans_b(params) * f[..., None] + self.trans_c(params)
            ) * self.trans_a(params)
            s = jnp.sum(t, axis=-1)
        else:
            s = jnp.exp(jnp.clip(f, max=80.0))
        return jnp.clip(s, min=1e-3)

    def log_prob(self, params, y, f):
        """``log N(y; 0, scale(f)^2)`` elementwise."""
        s = self.scale(params, f)
        return -0.5 * (y / s) ** 2 - jnp.log(s) - 0.5 * _LOG_2PI

    def latent_from_scale(self, params, target_scale, newton_iters: int = 30):
        """Invert ``scale(f) = target`` for ``f`` (elementwise).

        For ``"exp"`` this is ``log(target)``; for ``"cv"`` the softplus
        mixture is strictly increasing in ``f`` (``a_k > 0``,
        ``b_k > 0``), so a damped Newton iteration from 0 converges for
        any positive target.  Replaces the reference's cv init, which
        inverted a single-component approximation against the *latent*
        (``single_task_variational_gp.py:227-238`` — the branch the
        SURVEY marks broken; fixed by design).
        """
        target = jnp.clip(jnp.asarray(target_scale), min=1e-3)
        if self.param == "exp":
            return jnp.log(target)

        def step(f, _):
            s = self.scale(params, f)
            # ds/df = sum_k a_k b_k sigmoid(b_k f + c_k) > 0
            ds = jnp.sum(
                self.trans_a(params) * self.trans_b(params)
                * jax.nn.sigmoid(
                    self.trans_b(params) * f[..., None]
                    + self.trans_c(params)
                ),
                axis=-1,
            )
            f = f - jnp.clip((s - target) / jnp.maximum(ds, 1e-8),
                             min=-5.0, max=5.0)
            return f, None
        f0 = jnp.zeros_like(target)
        f, _ = jax.lax.scan(step, f0, None, length=newton_iters)
        return f

    def neg_log_prob_hessian(self, params, y, f):
        """Exact per-datum ``-d^2 log p(y | f) / df^2`` (autodiff).

        The Laplace-init curvature.  For ``"exp"`` this has the closed
        form ``2 y^2 e^{-2f}`` (the reference's inverse,
        ``0.5 y^{-2} e^{2f}``); for ``"cv"`` hand-deriving the K=5
        softplus mixture's curvature is exactly what the reference got
        wrong — the autodiff Hessian is exact by construction.
        """
        def nlp(ff, yy):
            return -self.log_prob(params, yy, ff)

        hess = jax.grad(jax.grad(nlp))
        for _ in range(max(jnp.ndim(f), jnp.ndim(y))):
            hess = jax.vmap(hess)
        return hess(jnp.broadcast_to(f, jnp.shape(y)), jnp.asarray(y))

    def laplace_inv_hessian(self, params, y, f):
        """Clamped inverse curvature for the Laplace variational init.

        The single shared definition of the clamp band — Hessian floored
        at 1e-3 before inversion, inverse clipped to ``[1e-4, 1e3]``
        (the reference's ``clamp(min=1e-4, max=1000)``,
        ``single_task_variational_gp.py:225-226``) — used by the
        single-task, sparse, and multitask cv inits so they cannot
        drift apart.
        """
        hess = self.neg_log_prob_hessian(params, y, f)
        return jnp.clip(1.0 / jnp.maximum(hess, 1e-3), min=1e-4,
                        max=1000.0)

    def expected_log_prob(self, params, y, mean, var,
                          num_locs: int = DEFAULT_NUM_LOCS,
                          method: str | None = None):
        """``E_{f ~ N(mean, var)}[log p(y | f)]``.

        For ``param="exp"`` the expectation is CLOSED FORM (lognormal
        moments: ``E[e^{-2f}] = e^{-2 mean + 2 var}``, ``E[f] = mean``):

            ``ELL = -y^2/2 * e^{-2 mean + 2 var} - mean - log(2 pi)/2``

        — exact where the reference's 75-node Gauss–Hermite quadrature
        (``train_utils.py:52``) approximates, and free of the quadrature's
        VPU-transcendental cost (75 ``exp`` evals per datum per ELBO step;
        measured at the quadrature's roofline ~0.38 ms/step at B=64,
        n=1000 for either the XLA or the Pallas node loop — the entire
        term now costs one ``exp``).  Differences from GH-75 are below
        float32 resolution except in the clamp regions (``scale >= 1e-3``,
        ``f <= 80``), which no sanely-initialized fit enters; the exponent
        is capped at 80 for the same overflow robustness as the
        quadrature path.  ``method="quadrature"`` forces GH (used by the
        parity tests and any clamp-sensitive caller); ``"cv"`` has no
        closed form and always uses GH.
        """
        if method is None:
            method = "analytic" if self.param == "exp" else "quadrature"
        if method == "analytic":
            if self.param != "exp":
                raise ValueError(
                    "analytic expected_log_prob exists only for param='exp'"
                )
            e = jnp.exp(jnp.clip(-2.0 * mean + 2.0 * var, max=80.0))
            return -0.5 * y * y * e - mean - 0.5 * _LOG_2PI
        return expected_value(
            lambda f: self.log_prob(params, y, f), mean, var, num_locs
        )

    def expected_scale(self, params, mean, var, mc_samples: int | None = None,
                       key=None):
        """Posterior-mean predicted scale ``E_f[scale(f)]``.

        The reference estimates this with 10 Monte-Carlo samples of ``f``
        (gpytorch's default likelihood marginal, ``train_utils.py:62-67``);
        pass ``mc_samples`` to replicate that estimator.  The default is the
        deterministic Gauss–Hermite expectation (for ``"exp"`` this is the
        exact log-normal mean ``exp(mean + var/2)`` up to the 1e-3 clamp).
        """
        if mc_samples is not None:
            if key is None:
                key = jax.random.key(0)
            f = (
                jax.random.normal(key, (mc_samples, *jnp.shape(mean)),
                                  jnp.result_type(mean))
                * jnp.sqrt(var)
                + mean
            )
            return jnp.mean(self.scale(params, f), axis=0)
        return expected_value(lambda f: self.scale(params, f), mean, var)
