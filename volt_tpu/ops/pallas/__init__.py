"""Pallas TPU kernels for the hot builders.

Two kernels back the named hot paths (BASELINE.json):

* :func:`volt_covariance` — fused Volt-covariance build: the CumTrapz
  integral (weighted cumsum) and the min-index tile expansion in one pass,
  writing covariance tiles straight from VMEM without materializing the
  ``(B, N)`` integral in HBM.
* :func:`ewma_pallas` — the batched truncated-EWMA filter (the Magpie
  means' builder) with the tap loop as shifted VMEM reads.
* :func:`gh_expected_log_prob` — the GPCV likelihood's 75-node
  Gauss–Hermite expected log-prob for the ``exp`` parameterization, with
  the node reduction kept in registers instead of materializing the
  ``(num_nodes, N)`` intermediate.

Both have XLA reference implementations (``volt_tpu.ops.volint`` /
``volt_tpu.ops.quadrature``) that the tests pin them against; on CPU the
kernels run in interpreter mode.
"""

from .ewma_filter import ewma_pallas
from .gh_ell import gh_expected_log_prob
from .volt_cov import volt_covariance, volt_covariance_grad

__all__ = ["volt_covariance", "volt_covariance_grad",
           "gh_expected_log_prob", "ewma_pallas"]
