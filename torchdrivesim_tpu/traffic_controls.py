"""
Traffic controls: static rectangular stoplines with discrete state.

Mirrors the semantics of the reference (`torchdrivesim/traffic_controls.py`):
state is advanced by replaying a recorded history while available, then by
``compute_state``; red-light violations are oriented-box overlaps between the
front portion of an agent and the stopline while red.

TPU-native split: the per-step state advance and the violation check are
pure jittable functions operating on arrays (time is a traced scalar), and a
thin class facade mirrors the reference API for scenario construction.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.utils import as_batch_index

from torchdrivesim_tpu.ops.box import (
    box2corners, box2corners_with_rear_factor, boxes_overlap_sat,
    boxes_overlap_sat_cross,
)

#: far-away placeholder for masked stopline corners (ref: `traffic_controls.py:33`)
MASKED_CORNER_VALUE = -1000.0


def masked_corners(pos: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """
    Stopline corners with absent entries displaced far away so they can never
    overlap an agent (ref: `traffic_controls.py:31-33`).

    Args:
        pos: BxNx5 stopline poses (x, y, length, width, orientation).
        mask: BxN presence flags.
    Returns:
        BxNx4x2 corners.
    """
    corners = box2corners(pos)
    m = mask.astype(corners.dtype)[..., None, None]
    return corners * m + (1 - m) * MASKED_CORNER_VALUE


def replay_or_hold_state(state: jnp.ndarray, replay_states: jnp.ndarray,
                         time) -> jnp.ndarray:
    """
    Pure state advance (semantics of `traffic_controls.py:127-136`): while
    ``time`` is within the replay horizon use the recorded state, otherwise
    hold the current state. ``time`` may be a traced scalar.

    Args:
        state: BxN current state indices.
        replay_states: BxNxT recorded states (T may be 0).
        time: scalar step index.
    Returns:
        BxN next state indices.
    """
    total = replay_states.shape[-1]
    if total == 0:
        return state
    from torchdrivesim_tpu.utils import time_slice
    replayed = time_slice(replay_states, time, axis=-1)
    return jnp.where(jnp.asarray(time) < total, replayed, state)


def red_light_violations(agent_state: jnp.ndarray, light_corners: jnp.ndarray,
                         light_state: jnp.ndarray, red_index: int,
                         rear_factor: float = 0.1) -> jnp.ndarray:
    """
    Which agents overlap a red stopline (semantics of
    `traffic_controls.py:164-178`), fully batched over agents x lights.

    Args:
        agent_state: BxAx5 agent boxes (x, y, length, width, orientation).
        light_corners: BxNx4x2 stopline corners (masked entries far away).
        light_state: BxN state indices.
        red_index: index of the 'red' state in allowed_states.
    Returns:
        BxA boolean violation flags.
    """
    b, a = agent_state.shape[0], agent_state.shape[1]
    n = light_corners.shape[1]
    if a == 0 or n == 0 or b == 0:
        return jnp.zeros((b, a), dtype=bool)
    agent_corners = box2corners_with_rear_factor(agent_state, rear_factor)
    # SAT boolean overlap == (intersection area > 0), far cheaper than the
    # polygon-clipping pipeline the reference evaluates here; the unrolled
    # cross-product form keeps every large tensor (B, A, N) instead of
    # padding (B, A, N, 4, 2) vreg tiles
    overlap = boxes_overlap_sat_cross(agent_corners, light_corners)
    is_red = (light_state == red_index)[:, None]          # B x 1 x N
    return jnp.any(overlap & is_red, axis=-1)


class BaseTrafficControl:
    """
    Class facade over the pure functions, mirroring the reference API
    (`traffic_controls.py:12-149`). Arrays are replaced, never mutated.

    Args:
        pos: BxNx5 stopline tensor (x, y, length, width, orientation).
        allowed_states: state names, e.g. light colors.
        replay_states: BxNxT recorded state indices (default T=0).
        mask: BxN presence flags.
    """
    def __init__(self, pos: jnp.ndarray, allowed_states: Optional[List[str]] = None,
                 replay_states: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None):
        # host inputs stay host: corners/masks embed as jit constants
        _as = lambda x: x if isinstance(x, jnp.ndarray) else np.asarray(x)
        self.pos = _as(pos)
        xp = np if isinstance(self.pos, np.ndarray) else jnp
        self.allowed_states = allowed_states if allowed_states is not None \
            else self._default_allowed_states()
        self.replay_states = _as(replay_states) if replay_states is not None \
            else xp.zeros(self.pos.shape[:2] + (0,), xp.int32)
        self.mask = _as(mask) if mask is not None \
            else xp.ones(self.pos.shape[:2], dtype=bool)
        self.corners = masked_corners(self.pos, self.mask)
        self.state = self._default_state()

    @classmethod
    def _default_allowed_states(cls) -> List[str]:
        return ['none']

    def _default_state(self) -> jnp.ndarray:
        if self.replay_states.shape[-1] > 0:
            return self.replay_states[..., 0]
        xp = np if isinstance(self.pos, np.ndarray) else jnp
        return xp.zeros(self.pos.shape[:2], xp.int32)

    @property
    def total_replay_time(self) -> int:
        return self.replay_states.shape[-1]

    def copy(self) -> "BaseTrafficControl":
        other = self.__class__(pos=self.pos, allowed_states=list(self.allowed_states),
                               replay_states=self.replay_states, mask=self.mask)
        other.state = self.state
        return other

    def to(self, device=None) -> "BaseTrafficControl":
        return self

    def extend(self, n: int, in_place: bool = True) -> "BaseTrafficControl":
        target = self if in_place else self.copy()
        enlarge = lambda x: (np if isinstance(x, np.ndarray)
                             else jnp).repeat(x, n, axis=0)
        target.pos = enlarge(self.pos)
        target.corners = enlarge(self.corners)
        target.mask = enlarge(self.mask)
        target.replay_states = enlarge(self.replay_states)
        target.state = enlarge(self.state)
        return target

    def select_batch_elements(self, idx, in_place: bool = True) -> "BaseTrafficControl":
        target = self if in_place else self.copy()
        idx = as_batch_index(idx)
        target.pos = self.pos[idx]
        target.corners = self.corners[idx]
        target.mask = self.mask[idx]
        target.replay_states = self.replay_states[idx]
        target.state = self.state[idx]
        return target

    def set_state(self, state: jnp.ndarray) -> None:
        self.state = state

    def compute_state(self, state: jnp.ndarray, time) -> jnp.ndarray:
        """
        Subclass hook for self-driven state (ref: `traffic_controls.py:121`,
        made PURE: the previous state is passed in rather than read from
        ``self.state``, so one override works identically in the mutating
        facade AND inside ``Simulator.functional_step`` under jit).
        Default: hold.
        """
        return state

    def advance(self, state: jnp.ndarray, time) -> jnp.ndarray:
        """
        THE control state advance (pure, jittable): recorded replay takes
        precedence while within the replay horizon, otherwise the subclass's
        :meth:`compute_state` (ref: `traffic_controls.py:127-136`). Both
        ``step`` and ``Simulator.functional_step`` route through here --
        a single code path, no facade/jit divergence.
        """
        return replay_or_hold_state(self.compute_state(state, time),
                                    self.replay_states, time)

    def step(self, time: int) -> None:
        """Replay-first state advance (ref: `traffic_controls.py:127-136`)."""
        self.state = self.advance(self.state, time)

    def compute_violation(self, agent_state: jnp.ndarray) -> jnp.ndarray:
        """Base controls report no violations (ref: `traffic_controls.py:138`)."""
        return jnp.zeros(agent_state.shape[:2], dtype=bool)


class TrafficLightControl(BaseTrafficControl):
    """
    Traffic lights; violation = red light and substantial bounding-box
    overlap with the stopline (ref: `traffic_controls.py:152-178`).

    Optionally FSM-driven: :meth:`set_schedule` attaches a
    :class:`~torchdrivesim_tpu.traffic_lights.BakedLightSchedule`, after
    which :meth:`compute_state` returns the schedule's light states at
    simulation time -- inside ``functional_step``, ``render`` and the
    violation metrics alike, with zero per-consumer wiring. Advance order is
    replay -> schedule -> hold (replay horizons override the FSM, matching
    the reference's log-replay-first semantics).
    """
    violation_rear_factor = 0.1

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.schedule = None
        self.dt = None

    @classmethod
    def _default_allowed_states(cls) -> List[str]:
        return ['red', 'yellow', 'green']

    def set_schedule(self, schedule, dt: float) -> None:
        """
        Drive these lights from a baked FSM schedule (ticked like the
        reference's per-step controller tick, `behavior/iai.py:130-136`,
        but as a pure time lookup usable under jit).

        Args:
            schedule: ``BakedLightSchedule`` whose light order matches this
                control's tensor order.
            dt: simulation step length in seconds (time index -> seconds).
        """
        if schedule is not None:
            n = self.pos.shape[1]
            assert len(schedule.light_ids) == n, \
                f"schedule drives {len(schedule.light_ids)} lights, control has {n}"
        self.schedule = schedule
        self.dt = dt

    def compute_state(self, state: jnp.ndarray, time) -> jnp.ndarray:
        if self.schedule is None:
            return state
        lights = self.schedule.states_at(
            jnp.asarray(time, jnp.float32) * self.dt)
        return jnp.broadcast_to(lights[None], state.shape).astype(state.dtype)

    def copy(self) -> "TrafficLightControl":
        other = super().copy()
        other.schedule = self.schedule   # host-static, shared
        other.dt = self.dt
        return other

    def compute_violation(self, agent_state: jnp.ndarray) -> jnp.ndarray:
        return red_light_violations(
            agent_state, self.corners, self.state,
            red_index=self.allowed_states.index('red'),
            rear_factor=self.violation_rear_factor)


class YieldControl(BaseTrafficControl):
    """Yield sign; violations not computed (ref: `traffic_controls.py:181`)."""


class StopSignControl(BaseTrafficControl):
    """Stop sign; violations not computed (ref: `traffic_controls.py:189`)."""
