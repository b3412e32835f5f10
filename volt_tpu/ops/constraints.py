"""Constrained-parameter bijectors.

Parameters are stored *unconstrained* ("raw") in pytrees and mapped to their
constrained value by a bijector at use time.  The transforms match the
semantics of the reference's constraint plumbing (see
``/root/reference/voltron/kernels/BMKernel.py:10,20-36``, which uses
``Interval(0, 1)`` sigmoid transforms, and the Gaussian likelihood's
``softplus(raw) + lower_bound`` noise transform) so that fitted raw values are
exchangeable between the two implementations.

All transforms are elementwise, jit-safe, and batch-shape agnostic.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "Interval",
    "Positive",
    "GreaterThan",
    "softplus",
    "inv_softplus",
]


def softplus(x):
    """Numerically stable ``log(1 + exp(x))``."""
    return jax.nn.softplus(x)


def inv_softplus(y):
    """Inverse of :func:`softplus`: ``y + log(-expm1(-y))`` (stable form)."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def _logit(p):
    p = jnp.asarray(p)
    return jnp.log(p) - jnp.log1p(-p)


@dataclasses.dataclass(frozen=True)
class Interval:
    """``value = lower + (upper - lower) * sigmoid(raw)``.

    Mirrors the sigmoid-interval transform used for the Brownian-motion
    kernel's ``vol`` parameter (reference ``BMKernel.py:10``).
    """

    lower: float = 0.0
    upper: float = 1.0

    def forward(self, raw):
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(raw)

    def inverse(self, value):
        return _logit((jnp.asarray(value) - self.lower) / (self.upper - self.lower))


@dataclasses.dataclass(frozen=True)
class Positive:
    """``value = softplus(raw)``."""

    def forward(self, raw):
        return softplus(raw)

    def inverse(self, value):
        return inv_softplus(value)


@dataclasses.dataclass(frozen=True)
class GreaterThan:
    """``value = softplus(raw) + lower_bound``.

    This is the default Gaussian-likelihood noise transform (lower bound
    ``1e-4``); note that a raw init of ``1e-5`` therefore yields a noise of
    ``softplus(1e-5) + 1e-4 ~= 0.6932`` — the reference's "noise pinned to
    1e-5" (``train_utils.py:107``) sets the *raw* value, and we replicate
    that faithfully.
    """

    lower_bound: float = 1e-4

    def forward(self, raw):
        return softplus(raw) + self.lower_bound

    def inverse(self, value):
        return inv_softplus(jnp.asarray(value) - self.lower_bound)
