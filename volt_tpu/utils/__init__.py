"""Utilities: static-config hashing, checkpointing, profiling."""

from .static import ConfigEq

__all__ = ["ConfigEq"]
