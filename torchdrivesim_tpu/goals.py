"""
Waypoint goals: per-agent waypoint collections that advance on arrival.

Functional re-design of the reference `torchdrivesim/goals.py`: the waypoint
tensor (BxAxNxMx2) and padding mask are static parameters; the mutable pieces
-- current collection index and the achieved-waypoint mask -- live in a small
state PyTree so the whole advance runs inside the jitted step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from torchdrivesim_tpu.utils import as_batch_index, host_repeat


@struct.dataclass
class WaypointGoalState:
    """Mutable waypoint-goal state."""
    state: jnp.ndarray  #: BxAx1 int, current collection index
    mask: jnp.ndarray   #: BxAxNxM bool, waypoints still active (padding excluded)


def init_waypoint_state(waypoints: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None) -> WaypointGoalState:
    """Initial state: collection 0, all provided waypoints active."""
    if mask is None:
        mask = jnp.ones(waypoints.shape[:-1], dtype=bool)
    state = jnp.zeros(waypoints.shape[:2] + (1,), jnp.int32)
    return WaypointGoalState(state=state, mask=mask)


def gather_current(waypoints: jnp.ndarray, goal_state: WaypointGoalState,
                   count: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Waypoints and masks of the current (and next ``count-1``) collections
    (semantics of `goals.py:35-105`).

    Args:
        waypoints: BxAxNxMx2.
    Returns:
        (BxAx(count*M)x2 waypoints, BxAx(count*M) mask); out-of-range
        collections are masked off and zeroed.
    """
    b, a, n, m = waypoints.shape[:4]
    offsets = jnp.arange(count, dtype=goal_state.state.dtype)
    idx = goal_state.state + offsets[None, None]          # BxAxcount
    valid = idx < n
    idx = jnp.clip(idx, 0, n - 1)
    wp = jnp.take_along_axis(waypoints, idx[..., None, None], axis=2)   # BxAxcountxMx2
    mk = jnp.take_along_axis(goal_state.mask, idx[..., None], axis=2)   # BxAxcountxM
    mk = mk & valid[..., None]
    # padding-masked waypoints keep their raw coordinates (matching
    # `goals.py:43,79`: only out-of-range collections are zeroed)
    wp = jnp.where(valid[..., None, None], wp, 0.0)
    return wp.reshape(b, a, count * m, 2), mk.reshape(b, a, count * m)


def step_waypoints(waypoints: jnp.ndarray, goal_state: WaypointGoalState,
                   agent_states: jnp.ndarray, threshold: float = 2.0
                   ) -> WaypointGoalState:
    """
    Advance waypoint goals one step (semantics of `goals.py:159-203`):
    if an agent is within ``threshold`` of any active waypoint of its current
    collection, the whole collection is marked achieved (its mask cleared)
    and the collection index advances (clamped to the last collection).

    Args:
        waypoints: BxAxNxMx2.
        agent_states: BxAx>=2 agent states (x, y, ...).
    Returns:
        next WaypointGoalState.
    """
    n = waypoints.shape[2]
    current_wp, current_mask = gather_current(waypoints, goal_state, count=1)
    d2 = jnp.sum((agent_states[..., None, :2] - current_wp) ** 2, axis=-1)
    overlap = (d2 <= threshold ** 2) & current_mask            # BxAxM
    hit = jnp.any(overlap, axis=-1, keepdims=True)             # BxAx1
    hit = hit & jnp.any(current_mask, axis=-1, keepdims=True)
    # clear the current collection's mask where hit (only real waypoints)
    clear = hit[..., None] & goal_state.mask & \
        (jnp.arange(n)[None, None, :, None] == goal_state.state[..., None])
    new_mask = goal_state.mask & ~clear
    new_state = jnp.clip(goal_state.state + hit.astype(goal_state.state.dtype),
                         0, n - 1)
    return WaypointGoalState(state=new_state, mask=new_mask)


class WaypointGoal:
    """
    Class facade mirroring the reference API (`goals.py:11-217`), delegating
    to the pure functions above.
    """
    def __init__(self, waypoints: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        self.waypoints = jnp.asarray(waypoints)
        self._state = init_waypoint_state(self.waypoints,
                                          None if mask is None else jnp.asarray(mask))
        self.max_goal_idx = self.waypoints.shape[2]

    # expose mutable pieces under the reference's names
    @property
    def state(self) -> jnp.ndarray:
        return self._state.state

    @state.setter
    def state(self, value):
        self._state = self._state.replace(state=jnp.asarray(value))

    @property
    def mask(self) -> jnp.ndarray:
        return self._state.mask

    @mask.setter
    def mask(self, value):
        self._state = self._state.replace(mask=jnp.asarray(value))

    def get_waypoints(self, count: int = 1) -> jnp.ndarray:
        return gather_current(self.waypoints, self._state, count)[0]

    def get_masks(self, count: int = 1) -> jnp.ndarray:
        return gather_current(self.waypoints, self._state, count)[1]

    def step(self, agent_states: jnp.ndarray, time: int = 0,
             threshold: float = 2.0) -> None:
        self._state = step_waypoints(self.waypoints, self._state,
                                     agent_states, threshold)

    def copy(self) -> "WaypointGoal":
        other = self.__class__(self.waypoints)
        other._state = self._state
        return other

    def to(self, device=None) -> "WaypointGoal":
        return self

    def extend(self, n: int, in_place: bool = True) -> "WaypointGoal":
        target = self if in_place else self.copy()
        enlarge = lambda x: host_repeat(x, n)
        target.waypoints = enlarge(self.waypoints)
        target._state = WaypointGoalState(state=enlarge(self._state.state),
                                          mask=enlarge(self._state.mask))
        return target

    def select_batch_elements(self, idx, in_place: bool = True) -> "WaypointGoal":
        target = self if in_place else self.copy()
        idx = as_batch_index(idx)
        target.waypoints = self.waypoints[idx]
        target._state = WaypointGoalState(state=self._state.state[idx],
                                          mask=self._state.mask[idx])
        return target
