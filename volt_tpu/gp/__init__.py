"""GP inference primitives: exact marginal likelihood / posteriors and the
unwhitened variational strategy used by the GPCV stage."""

from .exact import (
    FixedCovCache,
    exact_mll,
    exact_mll_fixed_cov,
    make_fixed_cov_cache,
    posterior,
)
from .variational import (
    elbo_at_inducing,
    laplace_initialize,
    variational_predict,
)

__all__ = [
    "exact_mll",
    "posterior",
    "FixedCovCache",
    "make_fixed_cov_cache",
    "exact_mll_fixed_cov",
    "elbo_at_inducing",
    "laplace_initialize",
    "variational_predict",
]
