"""Checkpoint/resume via orbax (the reference has none — SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> str:
    """Save a TrainState (or any pytree) to ``path`` (absolute dir)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    # Orbax wants pure arrays: strip non-pytree fields via jax.
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    ckpt.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state: Any) -> Any:
    """Restore into an existing TrainState template (apply_fn/tx kept)."""
    ckpt = _checkpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    payload = ckpt.restore(os.path.abspath(path), item=template)
    return state.replace(
        step=payload["step"],
        params=payload["params"],
        opt_state=payload["opt_state"],
    )
