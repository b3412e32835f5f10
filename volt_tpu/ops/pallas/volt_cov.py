"""Fused Volt-covariance build as a Pallas TPU kernel.

``K[b, i, j] = I[b, min(i, j)]`` with ``I = cumsum(w * vol^2)`` and the
reference's endpoint-halved trapezoid weights (``VolKernel.py:4-10``).

The O(N) running integral is prepared in XLA (a single cumsum); the kernel
owns the O(N^2) part: one grid step per ``(batch, row-tile, col-tile)``
loads the batch row's integral from VMEM and writes one ``TILE x TILE``
tile via a broadcast-compare-select on the VPU — gather-free, one HBM
write per tile, no broadcast intermediates materialized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import round_up

__all__ = ["volt_covariance", "volt_covariance_grad"]

_TILE = 256


def _kernel(integral_ref, out_ref):
    # the BlockSpec delivers only THIS batch row's integral (see below),
    # so no dynamic batch index is needed in-kernel
    i = pl.program_id(1)
    j = pl.program_id(2)

    rows = integral_ref[0, 0, pl.ds(i * _TILE, _TILE)]
    cols = integral_ref[0, 0, pl.ds(j * _TILE, _TILE)]
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
               + i * _TILE)
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)
               + j * _TILE)
    out_ref[0, :, :] = jnp.where(
        row_ids <= col_ids, rows[:, None], cols[None, :]
    )


@partial(jax.jit, static_argnames=("interpret",))
def _volt_covariance_padded(integral, interpret: bool):
    b, n = integral.shape
    grid = (b, n // _TILE, n // _TILE)
    # Per-batch-row input block: VMEM holds one (n,)-row per grid step
    # instead of the whole (b, n) batch (which approached the VMEM
    # budget at large b*n).  The row rides as a (1, 1, n) block of a
    # 3-D view so the sublane dim equals the array dim (this image's
    # Pallas rejects sub-(8, 128) blocks otherwise — CLAUDE.md).
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, n), integral.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda b_, i, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE, _TILE), lambda b_, i, j: (b_, i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(integral[:, None, :])


@jax.custom_vjp
def volt_covariance_grad(x, vol):
    """:func:`volt_covariance` with gradients (the build is linear in the
    weighted ``vol^2`` integral; the backward pass reuses the XLA twin's
    transpose).  This is what :class:`~volt_tpu.kernels.VolatilityKernel`
    dispatches to on TPU."""
    return volt_covariance(x, vol)


def _volt_cov_fwd(x, vol):
    return volt_covariance(x, vol), (x, vol)


def _volt_cov_bwd(res, g):
    from ..volint import min_index_covariance, vol_integral

    x, vol = res
    return jax.vjp(
        lambda xx, vv: min_index_covariance(vol_integral(xx, vv)), x, vol
    )[1](g)


volt_covariance_grad.defvjp(_volt_cov_fwd, _volt_cov_bwd)


def volt_covariance(x, vol, interpret: bool | None = None):
    """Pallas-fused ``(B, N, N)`` Volt covariance (uniform grid ``x``).

    ``x``: ``(N,)`` sorted uniform grid; ``vol``: ``(N,)`` or ``(B, N)``.
    Pads to the 256-tile to satisfy TPU tiling, slices back after (the
    zero-padded increments leave the integral constant over the pad).
    """
    x = jnp.asarray(x)
    vol = jnp.asarray(vol)
    squeeze = vol.ndim == 1
    if squeeze:
        vol = vol[None, :]
    n = vol.shape[-1]
    dx = x[..., 1] - x[..., 0]
    scale = jnp.full((n,), dx, vol.dtype).at[0].set(0.5 * dx).at[-1].set(
        0.5 * dx
    )
    # O(N) prefix integral in XLA (cumsum is not lowerable in-kernel on
    # this Pallas version); the kernel owns the O(N^2) tile expansion.
    integral = jnp.cumsum(scale * vol * vol, axis=-1)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_pad = round_up(n, _TILE)
    if n_pad != n:
        integral = jnp.pad(integral, ((0, 0), (0, n_pad - n)), mode="edge")
        out = _volt_covariance_padded(integral, interpret)[:, :n, :n]
    else:
        out = _volt_covariance_padded(integral, interpret)
    return out[0] if squeeze else out
