"""Shared float64 restatements of reference formulas.

The suite's parity methodology pins production code against literal
numpy restatements of the reference's math; the restatements themselves
must exist ONCE so a fix to an oracle cannot silently miss a copy
(previously ``ewma`` lived in two files and the FBM Gram in four).
"""

import numpy as np

__all__ = ["ewma_reference", "fbm_gram"]


def ewma_reference(y, k):
    """Literal restatement of reference ``means/EWMA.py:20-37`` in
    numpy float64: normalized exponential weights over a k-tap window,
    left-padded with ``y[0]``."""
    y = np.asarray(y, np.float64)
    alpha = 2.0 / (k + 1)
    w = alpha * (1 - alpha) ** np.arange(k - 1, -1, -1, dtype=np.float64)
    w = w / w.sum()
    padded = np.concatenate([np.full(k, y[0]), y])
    return np.convolve(padded, w[::-1], mode="valid")


def fbm_gram(a, b=None, *, two_h):
    """float64 FBM (cross-)Gram ``(|s|^2H + |t|^2H - |s-t|^2H)/2``
    (reference ``kernels/FBMKernel.py:38-59``)."""
    a = np.asarray(a, np.float64)
    b = a if b is None else np.asarray(b, np.float64)
    s = np.abs(a[:, None])
    t = np.abs(b[None, :])
    d = np.abs(a[:, None] - b[None, :])
    return 0.5 * (s**two_h + t**two_h - d**two_h)
