"""Observation models.

* :class:`GaussianLikelihood` — homoskedastic noise, ``softplus + 1e-4``
  transform (gpytorch parity, including the raw-vs-transformed init traps
  documented in SURVEY.md §7).
* :class:`MultitaskGaussianLikelihood` — global noise shared across tasks.
* :class:`VolatilityGaussianLikelihood` — the GPCV heteroscedastic model:
  ``y ~ N(0, scale(f))`` with the copula-process ("cv") or ``exp``
  parameterization (reference ``likelihoods/volatility_likelihood.py``).
"""

from .likelihoods import (
    GaussianLikelihood,
    MultitaskGaussianLikelihood,
    VolatilityGaussianLikelihood,
)

__all__ = [
    "GaussianLikelihood",
    "MultitaskGaussianLikelihood",
    "VolatilityGaussianLikelihood",
]
