"""Exponentially-weighted moving-average primitives ("Magpie" means).

The reference computes a *truncated, renormalized* EWMA with a k-tap
``Conv1d``: weights ``alpha * (1 - alpha)**i`` (newest-first), normalized to
sum to one, applied to the series left-padded with ``k`` copies of its first
value (reference ``means/EWMA.py:20-37``).  The output therefore has length
``T + 1``: entry ``j`` is the weighted average of the window *ending at*
``y[j-1]`` (entry 0 is pure padding, i.e. ``y[0]``) — a causal one-step-ahead
moving-average forecast.

Two TPU-native forms are provided:

* :func:`ewma` — the full filter as an XLA depthwise convolution (used when
  fitting, where the whole train-mean vector is needed at once).
* a rolling-window *scan state* (:func:`window_init` / :func:`window_append`
  / :func:`window_value`) — O(k) per step, used inside the ``lax.scan``
  autoregressive rollout where the reference re-convolves the entire growing
  series every step (``rollout_utils.py:80-86``).  Because the filter is
  truncated at ``k`` taps, the last filter output depends only on the last
  ``k`` padded values, so the two forms agree exactly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "ewma_weights",
    "ewma",
    "window_init",
    "window_append",
    "window_value",
    "rolling_coeffs",
    "rolling_append",
]


@lru_cache(maxsize=64)
def _ewma_weights_np(k: int):
    alpha = 2.0 / (k + 1)
    w = alpha * (1.0 - alpha) ** np.arange(k - 1, -1, -1, dtype=np.float64)
    return w / w.sum()


def ewma_weights(k: int, dtype=jnp.float32):
    """Normalized truncated-EWMA taps, oldest-first (matches the conv layout).

    ``w[i] = alpha * (1 - alpha)**(k - 1 - i) / Z`` with ``alpha = 2/(k+1)``;
    computed on the host in float64, baked into the graph as a constant.
    """
    return jnp.asarray(_ewma_weights_np(k), dtype=dtype)


def _pad_left(y, k: int):
    """Left-pad the series with ``k`` copies of its first value."""
    first = y[..., :1]
    pad = jnp.broadcast_to(first, (*y.shape[:-1], k))
    return jnp.concatenate([pad, y], axis=-1)


def _ewma_conv(y, k: int):
    """The XLA depthwise-convolution filter (reference semantics)."""
    y = jnp.asarray(y)
    w = ewma_weights(k, y.dtype)
    padded = _pad_left(y, k)
    batch_shape = padded.shape[:-1]
    length = padded.shape[-1]
    lhs = padded.reshape((-1, 1, length))
    rhs = w.reshape((1, 1, k))
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape((*batch_shape, y.shape[-1] + 1))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ewma_mxu(y, k: int):
    from .pallas import ewma_pallas

    # interpret=None: compiled on TPU (the only production dispatcher),
    # interpreter elsewhere (tests).
    return ewma_pallas(y, k, interpret=None)


def _ewma_mxu_fwd(y, k):
    return _ewma_mxu(y, k), y


def _ewma_mxu_bwd(k, y, g):
    # the filter is linear in y: reuse the conv path's transpose.
    return (jax.vjp(lambda yy: _ewma_conv(yy, k), y)[1](g)[0],)


_ewma_mxu.defvjp(_ewma_mxu_fwd, _ewma_mxu_bwd)

# Pallas pays off once the tap count amortizes its banded-matmul setup:
# measured on-chip at (64, 999): k=400 0.93 ms vs 1.72 ms XLA conv, k=100
# a wash (0.98 vs 0.95).  PERFORMANCE.md has the table.
_PALLAS_MIN_K = 128


def ewma(y, k: int):
    """Truncated EWMA filter.  ``(..., T) -> (..., T + 1)``.

    Matches the reference ``EWMA(y, k)`` exactly: output ``j`` is the
    weighted mean of ``padded[j : j + k]``, i.e. the window ending at
    ``y[j - 1]``.  On TPU, wide filters route to the banded-matmul Pallas
    kernel (same values, pinned in tests; conv-transpose gradients).
    """
    y = jnp.asarray(y)
    if k >= _PALLAS_MIN_K and jax.default_backend() == "tpu":
        return _ewma_mxu(y, k)
    return _ewma_conv(y, k)


# ---------------------------------------------------------------------------
# Rolling-window scan state: the O(k)-per-step rollout form.
# ---------------------------------------------------------------------------


def window_init(y, k: int):
    """Last ``k`` values of the padded series — the state whose weighted sum
    is ``ewma(y, k)[..., -1]``."""
    return _pad_left(jnp.asarray(y), k)[..., -k:]


def window_append(buf, value):
    """Shift the window left by one and append ``value`` (shape ``(...,)``)."""
    return jnp.concatenate([buf[..., 1:], value[..., None]], axis=-1)


def window_value(buf, w):
    """Weighted window sum — equals the last output of the full filter."""
    return jnp.einsum("...k,k->...", buf, w, precision=lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# O(1) rolling register: the scalar-state rollout form.
# ---------------------------------------------------------------------------
#
# Appending y_new to a k-tap truncated EWMA window whose oldest element is
# y_exp updates the weighted sum in O(1):
#
#     sum' = (1 - alpha) * sum + w[-1] * y_new - (1 - alpha) * w[0] * y_exp
#
# (shifting the window multiplies every surviving tap's weight by
# ``1 - alpha``).  When the rollout horizon H <= k, every expiring element
# is a *train-side* value known before the scan starts (the init window's
# entries, leaving oldest-first), so the whole Magpie mean state collapses
# from an (S, k) buffer — whose per-step shift + dot dominated the rollout
# at production batch sizes (~40 GB of buffer traffic at B=500, S=1000,
# k=100, H=100) — to one scalar sum per path per level, with the expiry
# sequence fed through the scan's per-step inputs.  Exact up to float
# reassociation (pinned against the window form in tests).


def rolling_coeffs(k: int, dtype=jnp.float32):
    """``(decay, w_new, w_exp)`` for :func:`rolling_append`."""
    w = _ewma_weights_np(k)
    alpha = 2.0 / (k + 1)
    return (jnp.asarray(1.0 - alpha, dtype), jnp.asarray(w[-1], dtype),
            jnp.asarray((1.0 - alpha) * w[0], dtype))


def rolling_append(sum_cur, y_new, y_exp, coeffs):
    """O(1) update of the truncated-EWMA weighted sum."""
    decay, w_new, w_exp = coeffs
    return decay * sum_cur + w_new * y_new - w_exp * y_exp
