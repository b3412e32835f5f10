"""Numerics core: constraints, linear algebra, quadrature, filters.

This layer replaces the reference's GPyTorch/PyTorch numerical backbone
(``psd_safe_cholesky``, lazy-tensor solves, conv1d EWMA, Gauss–Hermite
quadrature) with jit/vmap-safe XLA primitives — see SURVEY.md §7 layer 1.
"""

from .chol import (
    add_jitter,
    cholesky_solve,
    psd_safe_cholesky,
    solve_lower_triangular,
    solve_upper_triangular,
    tril_inverse_quad,
)
from .constraints import GreaterThan, Interval, Positive, inv_softplus, softplus
from .ewma import ewma, ewma_weights, window_append, window_init, window_value
from .fbm import fbm_cholesky, fbm_increment_cov, fbm_noise_cholesky
from .mvn import conditional, mvn_kl, mvn_log_prob, mvn_log_prob_chol, sample_mvn
from .quadrature import DEFAULT_NUM_LOCS, expected_value, gauss_hermite_nodes
from .volint import (
    brownian_cholesky,
    cumtrapz_weights,
    min_index_covariance,
    vol_integral,
)

__all__ = [
    "add_jitter",
    "cholesky_solve",
    "psd_safe_cholesky",
    "solve_lower_triangular",
    "solve_upper_triangular",
    "tril_inverse_quad",
    "GreaterThan",
    "Interval",
    "Positive",
    "inv_softplus",
    "softplus",
    "ewma",
    "fbm_cholesky",
    "fbm_increment_cov",
    "fbm_noise_cholesky",
    "ewma_weights",
    "window_append",
    "window_init",
    "window_value",
    "conditional",
    "mvn_kl",
    "mvn_log_prob",
    "mvn_log_prob_chol",
    "sample_mvn",
    "DEFAULT_NUM_LOCS",
    "expected_value",
    "gauss_hermite_nodes",
    "brownian_cholesky",
    "cumtrapz_weights",
    "min_index_covariance",
    "vol_integral",
]
