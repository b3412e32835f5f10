"""Batched truncated-EWMA filter as a Pallas TPU kernel.

The second hot builder named in BASELINE.json: the Magpie means re-filter
entire (batched) series during fitting.

TPU formulation: Mosaic only vector-loads lane-aligned slices, so instead
of k shifted reads the filter is a *banded matmul* on the MXU: each grid
step reads one aligned ``(B, TILE + k_pad)`` segment of the padded series
from VMEM and multiplies it by a constant ``(TILE + k_pad, TILE)`` band
matrix ``W[a, j] = w[a - j - delta]`` — one systolic-array pass per output
tile, no unaligned access, nothing materialized beyond the output.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import round_up as _round_up

from ..ewma import _ewma_weights_np

__all__ = ["ewma_pallas"]

_TILE = 512




@lru_cache(maxsize=32)
def _band_matrix_np(k: int):
    """``W[a, j] = w[a - j - delta]`` with ``delta = k_pad - k`` (host f64).

    ``delta`` absorbs the lane-alignment left-padding of the series so tap
    0 of output ``j`` lands at segment offset ``j + delta``.
    """
    k_pad = _round_up(k, 128)
    delta = k_pad - k
    w = _ewma_weights_np(k)
    band = np.zeros((_TILE + k_pad, _TILE), np.float64)
    a = np.arange(_TILE + k_pad)[:, None]
    j = np.arange(_TILE)[None, :]
    t = a - j - delta
    mask = (t >= 0) & (t < k)
    band[mask] = w[t[mask]]
    return band


def _kernel(padded_ref, band_ref, out_ref):
    i = pl.program_id(0)
    seg = padded_ref[:, pl.ds(i * _TILE, band_ref.shape[0])]
    out_ref[:, :] = jnp.dot(seg, band_ref[:, :],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("interpret",))
def _ewma_padded(padded, band, interpret: bool):
    b, total = padded.shape
    lseg = band.shape[0]
    out_len = total - (lseg - _TILE)  # = out_pad, multiple of _TILE
    grid = (out_len // _TILE,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_len), padded.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lseg, _TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded, band)


def ewma_pallas(y, k: int, interpret: bool | None = None):
    """Pallas-fused reference EWMA filter: ``(..., T) -> (..., T + 1)``.

    Matches :func:`volt_tpu.ops.ewma.ewma` exactly (same taps, same
    left-padding with ``y[0]``).
    """
    y = jnp.asarray(y)
    shape = y.shape
    t = shape[-1]
    y2 = y.reshape(-1, t)
    b = y2.shape[0]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    k_pad = _round_up(k, 128)
    delta = k_pad - k
    out_len = t + 1
    out_pad = _round_up(out_len, _TILE)
    # layout: [zeros(delta) | y0 * k | series | zeros], total out_pad + k_pad
    lead = jnp.zeros((b, delta), y2.dtype)
    first = jnp.broadcast_to(y2[:, :1], (b, k))
    tail = jnp.zeros((b, out_pad - t), y2.dtype)
    padded = jnp.concatenate([lead, first, y2, tail], axis=-1)

    band = jnp.asarray(_band_matrix_np(k), y2.dtype)
    out = _ewma_padded(padded, band, interpret)[:, :out_len]
    return out.reshape(*shape[:-1], out_len)
