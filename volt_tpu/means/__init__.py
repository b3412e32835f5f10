"""Mean functions, including the "Magpie" moving-average family.

Two families with different data dependence:

* **Deterministic means** (constant / linear / log-linear / mul-identity):
  pure functions of the query inputs ``x``.
* **History means** (EWMA / HEWMA / DEWMA / TEWMA / mean-reverting EWMA):
  functions of the *observed series* ``y``.  The reference implements these
  as stateful modules holding ``train_x`` / ``train_y`` and dispatching on
  three query cases (single point / train grid / full series, reference
  ``means/EWMA.py:46-54``).  Here the three cases are explicit methods
  (``last_value`` / ``train_values`` / ``full_values``) plus an O(k)
  *scan protocol* (``scan_init`` / ``scan_value`` / ``scan_append``) used by
  the ``lax.scan`` rollout, replacing the reference's re-convolution of the
  whole growing series at every autoregressive step
  (``rollout_utils.py:80-86``).

Case semantics (shared by the whole family): the underlying filter output
has length ``T + 1`` for a length-``T`` series; the *train* branch drops the
last entry (a causal one-step-ahead mean over the train grid) and the
*single-query* branch returns the last entry (the forecast for the next
point).
"""

from .means import (
    ConstantMean,
    DEWMAMean,
    EWMAMean,
    HEWMAMean,
    LinearMean,
    LogLinearMean,
    MeanRevertingEMAMean,
    MulIdentityMean,
    TEWMAMean,
)

__all__ = [
    "ConstantMean",
    "LinearMean",
    "LogLinearMean",
    "MulIdentityMean",
    "EWMAMean",
    "HEWMAMean",
    "DEWMAMean",
    "TEWMAMean",
    "MeanRevertingEMAMean",
]
