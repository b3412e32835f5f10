"""Checkpointing fitted states.

The reference persists only forecast sample tensors (``torch.save`` keyed
by ticker/model/date; no model state, no resume — SURVEY.md §5).  The TPU
build keeps that samples-on-disk layout (``experiments/``) and adds what
the reference lacks: orbax checkpoints of fitted hyperparameters and vol
paths, so backtests resume without refitting.

A model state splits into (array pytree, static module config); the module
is reconstructed by the caller (or via the round-trip helpers here for the
standard states).
"""

from __future__ import annotations

import os


__all__ = ["save_pytree", "restore_pytree", "save_volt_state",
           "restore_volt_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree):
    """Save an array pytree (orbax; path becomes a directory).

    ``StandardCheckpointer`` saves asynchronously — block until the
    checkpoint is finalized so the path is immediately restorable.
    """
    path = os.path.abspath(path)
    ck = _checkpointer()
    ck.save(path, tree, force=True)
    ck.wait_until_finished()


def restore_pytree(path: str, like):
    """Restore an array pytree saved by :func:`save_pytree`.

    ``like``: a template pytree with matching structure/shapes/dtypes
    (e.g. a freshly-initialized state).
    """
    path = os.path.abspath(path)
    return _checkpointer().restore(path, like)


def save_volt_state(path: str, state):
    """Checkpoint a fitted :class:`~volt_tpu.models.volt.VoltState`
    (arrays only; the mean/kernel config travels with the caller's code)."""
    arrays = {
        "params": state.params,
        "train_x": state.train_x,
        "train_y": state.train_y,
        "log_vol_path": state.log_vol_path,
    }
    if state.vol_state is not None:
        arrays["vol_params"] = state.vol_state.params
        arrays["vol_train_x"] = state.vol_state.train_x
        arrays["vol_train_y"] = state.vol_state.train_y
    save_pytree(path, arrays)


def restore_volt_state(path: str, volt_module, vol_module=None):
    """Rebuild a :class:`VoltState` from a checkpoint + module configs."""
    from ..models.volt import VoltState

    restored = _checkpointer().restore(os.path.abspath(path))
    vol_state = None
    if vol_module is not None and "vol_params" in restored:
        vol_state = vol_module.fit_state(
            restored["vol_params"], restored["vol_train_x"],
            restored["vol_train_y"],
        )
    return VoltState(
        module=volt_module,
        params=restored["params"],
        train_x=restored["train_x"],
        train_y=restored["train_y"],
        log_vol_path=restored["log_vol_path"],
        vol_state=vol_state,
    )
