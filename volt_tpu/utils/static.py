"""Equality/hash by configuration for module objects.

Kernel/mean/likelihood objects are *static* configuration — they carry no
arrays — and travel through ``jit`` as pytree metadata (``pytree_node=False``
fields of model structs).  JAX caches compilations keyed on that metadata's
``__eq__``/``__hash__``; the default identity semantics would retrace on
every freshly-constructed module.  This mixin keys both on
``(type, sorted public attrs)`` instead, recursing through nested modules.
"""

from __future__ import annotations

__all__ = ["ConfigEq"]


def _freeze(value):
    if isinstance(value, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    return value


class ConfigEq:
    """Mixin: value semantics over public ``__dict__`` entries."""

    def _config_key(self):
        return (
            type(self),
            _freeze(
                {k: v for k, v in self.__dict__.items() if not k.startswith("_")}
            ),
            _freeze(
                {k: v for k, v in self.__dict__.items() if k.startswith("_")}
            ),
        )

    def __eq__(self, other):
        if type(other) is not type(self):
            return NotImplemented
        return self._config_key() == other._config_key()

    def __hash__(self):
        return hash(self._config_key())

    def __repr__(self):  # pragma: no cover - debugging aid
        attrs = ", ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"{type(self).__name__}({attrs})"
