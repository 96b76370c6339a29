"""
Checkpoint / resume for simulation state and training state.

The reference has no checkpointing in its core (SURVEY.md §5) -- episode
snapshots go through ``Simulator.copy()``. Here the simulation state is a
PyTree (:class:`SimulatorState`), so durable checkpointing is a thin orbax
wrapper: any combination of simulator state, policy params, and optimizer
state saves and restores atomically.
"""
import os
from typing import Any, Optional

import jax
import numpy as np


def _is_empty(x) -> bool:
    return hasattr(x, 'size') and x.size == 0


def save_checkpoint(path: str, tree: Any, force: bool = True) -> None:
    """
    Save a PyTree (e.g. ``{'sim': sim.state, 'params': params}``) to ``path``.
    Zero-size leaves (e.g. empty NPC tensors) are skipped -- orbax cannot
    serialize them; restore rebuilds them from the ``target`` structure.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    tree = jax.tree.map(lambda x: None if _is_empty(x) else x, tree)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """
    Restore a PyTree from ``path``. Passing ``target`` (a matching PyTree of
    arrays, e.g. the current ``sim.state``) restores with exact structure,
    dtypes, and shardings; its zero-size leaves pass through unchanged.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(
                lambda x: None if _is_empty(x)
                else jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, 'shape') else x, target)
            restored = ckptr.restore(path, abstract)
            return jax.tree.map(
                lambda t, r: t if _is_empty(t) else r, target, restored,
                is_leaf=lambda x: x is None or _is_empty(x))
        return ckptr.restore(path)


def save_simulator(path: str, simulator) -> None:
    """Persist a simulator's dynamic state (parameters are code + assets)."""
    save_checkpoint(path, {'state': simulator.state})


def restore_simulator(path: str, simulator) -> None:
    """Restore dynamic state into an existing simulator (in place)."""
    restored = restore_checkpoint(path, {'state': simulator.state})
    simulator.state = restored['state']
    simulator._sync_legacy_state()
