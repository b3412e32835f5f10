"""Covariance functions (pure, batched, jit-safe).

Functional rebuilds of the reference's ``voltron/kernels`` plus the external
gpytorch kernels its baselines use.  A kernel object holds *static* config
(constraints, batch shape); learnable state lives in a plain dict of raw
(unconstrained) arrays returned by ``init()`` and passed to every call —
the JAX idiom replacing gpytorch's stateful ``Kernel`` modules.
"""

from .kernels import (
    BMKernel,
    FBMKernel,
    IndexKernel,
    MaternKernel,
    OUKernel,
    RBFKernel,
    ScaleKernel,
    SpectralMixtureKernel,
    VolatilityKernel,
)

__all__ = [
    "BMKernel",
    "FBMKernel",
    "OUKernel",
    "VolatilityKernel",
    "MaternKernel",
    "RBFKernel",
    "ScaleKernel",
    "SpectralMixtureKernel",
    "IndexKernel",
]
