"""Shared tile-padding arithmetic for the Pallas kernels."""

from __future__ import annotations

__all__ = ["round_up"]


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (the pad-to-tile bound every
    kernel wrapper uses — one definition so a tiling change cannot be
    applied to three of four copies)."""
    return -(-x // m) * m
