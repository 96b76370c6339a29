"""
Runtime validation: trace-time shape checks + optional NaN guards.

The reference defends against bad values with shape asserts at construction
and per-step (`simulator.py:537-559,846-852`) and scattered ``nan_to_num``
calls. Under jit, shape checks are free (they run at trace time); value
checks use ``jax.experimental.checkify`` so they can run inside compiled
code when enabled.
"""
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def validate_state_shapes(state, agent_count: int, batch_size: int) -> None:
    """Trace-time invariants of a :class:`SimulatorState`."""
    assert state.agent_state.shape[0] == batch_size
    assert state.agent_state.shape[-2] == agent_count
    assert state.agent_state.shape[-1] == 4
    assert state.present_mask.shape == state.agent_state.shape[:-1]
    assert state.npc_state.shape[0] == batch_size
    assert state.npc_present_mask.shape == state.npc_state.shape[:-1]


def check_finite_state(state) -> None:
    """
    Checkify assertion that all agent/NPC states are finite. Wrap the caller
    with :func:`checked` (or ``checkify.checkify``) to surface errors.
    """
    checkify.check(jnp.all(jnp.isfinite(state.agent_state)),
                   "non-finite agent state")
    checkify.check(jnp.all(jnp.isfinite(state.npc_state)),
                   "non-finite NPC state")


def checked(fn: Callable) -> Callable:
    """
    Wrap a jittable function so checkify assertions (and automatic NaN/div
    checks) inside it are collected and raised on the host.

    Example:
        step = checked(lambda s, a: sim.functional_step(s, a))
        state = step(state, action)  # raises on NaN with a clear message
    """
    checked_fn = checkify.checkify(
        fn, errors=checkify.user_checks | checkify.nan_checks)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
