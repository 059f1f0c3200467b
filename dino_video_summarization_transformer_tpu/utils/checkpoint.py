"""Checkpoint save/restore (ref: utils/utils.py:122-154, train_ssl.py:441-455).

Orbax-backed: the full TrainState pytree (student/teacher/center/optimizer/
step) plus run variables. Mirrors the reference's auto-resume contract:
``checkpoint.pth`` -> latest step dir; periodic epoch snapshots.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, run_vars: Optional[dict] = None,
                    force: bool = True) -> None:
    """Save a pytree + small run-variable dict (rank-0 only — the
    save_on_master equivalent, ref: utils/utils.py:417-419)."""
    if jax.process_index() != 0:
        return
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"state": jax.device_get(state)}
    if run_vars:
        payload["run_vars"] = {k: np.asarray(v) for k, v in run_vars.items()}
    _ckptr().save(path, payload, force=force)


def restore_checkpoint(path: str, state_template: Any):
    """Restore (state, run_vars) from ``path``; returns (None, {}) when the
    checkpoint doesn't exist (ref: restart_from_checkpoint's silent-return,
    utils/utils.py:122-127)."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None, {}
    import orbax.checkpoint as ocp

    template = {"state": jax.device_get(state_template)}
    restored = _ckptr().restore(path)
    run_vars = {k: v.item() if hasattr(v, "item") else v
                for k, v in restored.get("run_vars", {}).items()}
    # re-assemble with the template's structure (tuples vs lists etc.)
    state = jax.tree.unflatten(
        jax.tree.structure(template["state"]),
        jax.tree.leaves(restored["state"]))
    return state, run_vars
