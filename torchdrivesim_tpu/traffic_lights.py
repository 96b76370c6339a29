"""
Traffic-light state machines.

Two representations:

1. Host-side FSM classes (``TrafficLightStateMachine`` /
   ``TrafficLightController``) with the same JSON round-trip format and tick
   semantics as the reference (`torchdrivesim/traffic_lights.py`): each FSM
   cycles through group states (actor_id -> color, duration), ticks can skip
   multiple states, controllers tick many FSMs.

2. A baked tensor schedule (:class:`BakedLightSchedule`) -- the TPU-native
   form: the FSM cycle is unrolled once on the host into per-light phase
   tables, after which the light state at any simulation time is a pure
   jittable lookup (``state_at``). This is what runs inside the jitted step;
   the reference instead ticks Python FSMs on the host every step
   (`behavior/iai.py:130-136`).
"""
from __future__ import annotations

import json
import random
from dataclasses import dataclass
from enum import Enum, auto
from functools import reduce
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class TrafficLightState(Enum):
    none = auto()
    green = auto()
    yellow = auto()
    red = auto()


ActorStates = Dict[str, TrafficLightState]

#: index of each color in `TrafficLightControl` allowed_states ['red','yellow','green']
CONTROL_STATE_INDEX = {'red': 0, 'yellow': 1, 'green': 2, 'none': 0}


@dataclass(eq=True)
class TrafficLightGroupState:
    """One state of a group of lights (ref: `traffic_lights.py:27-34`)."""
    actor_states: ActorStates
    sequence_number: int
    duration: float  # seconds
    next_state: int


def _group_states_from_json_items(items) -> List[TrafficLightGroupState]:
    return [
        TrafficLightGroupState(
            actor_states={k: TrafficLightState[v] for k, v in it["actor_states"].items()},
            sequence_number=int(it["state"]),
            duration=float(it["duration"]),
            next_state=int(it["next_state"]),
        )
        for it in items
    ]


def _group_state_to_json_item(state: TrafficLightGroupState) -> Dict:
    return {
        "actor_states": {k: v.name for k, v in state.actor_states.items()},
        "state": str(state.sequence_number),
        "duration": state.duration,
        "next_state": str(state.next_state),
    }


class TrafficLightStateMachine:
    """
    Cyclic FSM over group states with reference-compatible tick semantics
    (`traffic_lights.py:37-156`): large dt can skip several states; landing
    exactly on a boundary starts the next state at full duration.
    """
    def __init__(self, group_states: List[TrafficLightGroupState]):
        self._states = group_states
        self._time_remaining: Optional[float] = None
        self._current_state: Optional[TrafficLightGroupState] = None
        self._duration: Optional[float] = None
        self.reset()

    @classmethod
    def from_json(cls, json_file_path: str) -> "TrafficLightStateMachine":
        with open(json_file_path, "rb") as f:
            items = json.load(f)
        try:
            return cls(_group_states_from_json_items(items))
        except KeyError as e:
            raise ValueError(f"KeyError: {e} in {json_file_path}")

    def to_json(self) -> str:
        return json.dumps([_group_state_to_json_item(s) for s in self._states])

    def reset(self):
        state = random.randint(0, len(self._states) - 1)
        self.set_to(state, self._states[state].duration)

    def set_to(self, state_index: int, time_remaining: float):
        state = min(max(state_index, 0), len(self._states) - 1)
        self._current_state = self._states[state]
        self._duration = self._current_state.duration
        self._time_remaining = min(time_remaining, self._duration)

    def tick(self, dt: float):
        self._time_remaining -= dt
        while self._time_remaining <= 0:
            next_state = self._current_state.next_state
            next_duration = self._states[next_state].duration
            if self._time_remaining == 0:
                self.set_to(next_state, next_duration)
                break
            elif self._time_remaining + next_duration > 0:
                self._time_remaining += next_duration
                self.set_to(next_state, self._time_remaining)
                break
            else:
                self._time_remaining += next_duration
                self._current_state = self._states[next_state]

    @property
    def states(self) -> List[TrafficLightGroupState]:
        return self._states

    @property
    def duration(self) -> float:
        return self._duration

    @property
    def current_state(self) -> TrafficLightGroupState:
        return self._current_state

    @property
    def time_remaining(self) -> float:
        return self._time_remaining

    def get_current_actor_states(self) -> ActorStates:
        return self.current_state.actor_states


class TrafficLightController:
    """Ticks a set of FSMs together (ref: `traffic_lights.py:159-284`)."""
    def __init__(self, traffic_fsms: List[TrafficLightStateMachine]):
        self.traffic_fsms = traffic_fsms
        self._time_remaining = None
        self._current_state = None
        self._state_per_machine = None
        self.reset()

    @classmethod
    def from_json(cls, json_file_path: str) -> "TrafficLightController":
        with open(json_file_path, "rb") as f:
            items = json.load(f)
        try:
            return cls([TrafficLightStateMachine(_group_states_from_json_items(sm))
                        for sm in items])
        except KeyError as e:
            raise ValueError(f"KeyError: {e} in {json_file_path}")

    def to_json(self) -> str:
        return json.dumps([
            [_group_state_to_json_item(s) for s in fsm.states]
            for fsm in self.traffic_fsms
        ])

    def tick(self, dt: float):
        for fsm in self.traffic_fsms:
            fsm.tick(dt)
        self.update_current_state_and_time()

    def set_to(self, light_states: List[List[float]]):
        for i, (state, time_remaining) in enumerate(light_states):
            self.traffic_fsms[i].set_to(int(state), time_remaining)
        self.update_current_state_and_time()

    def reset(self):
        for fsm in self.traffic_fsms:
            fsm.reset()
        self.update_current_state_and_time()

    def update_current_state_and_time(self):
        self._current_state = self.collect_all_current_light_states()
        self._state_per_machine = [fsm.current_state.sequence_number
                                   for fsm in self.traffic_fsms]
        self._time_remaining = [fsm.time_remaining for fsm in self.traffic_fsms]

    @property
    def current_state(self):
        return self._current_state

    @property
    def current_state_with_name(self):
        return {k: v.name for k, v in self._current_state.items()}

    @property
    def state_per_machine(self):
        return self._state_per_machine

    @property
    def time_remaining(self):
        return self._time_remaining

    def get_number_of_light_groups(self) -> int:
        return len(self.traffic_fsms)

    def collect_all_current_light_states(self) -> ActorStates:
        return reduce(lambda x, y: {**x, **y},
                      [fsm.get_current_actor_states() for fsm in self.traffic_fsms], {})


def current_light_state_tensor_from_controller(
        traffic_light_controller: TrafficLightController,
        traffic_light_ids: Sequence[int]) -> jnp.ndarray:
    """
    Current controller state as a tensor of indices into the
    TrafficLightControl allowed_states (ref: `traffic_lights.py:287-293`).
    """
    return jnp.asarray([
        CONTROL_STATE_INDEX[traffic_light_controller.current_state[str(i)].name]
        for i in traffic_light_ids
    ], dtype=jnp.int32)


# ----------------------------------------------------------------------------
# Baked (tensorized) schedule — runs inside jit
# ----------------------------------------------------------------------------

class BakedLightSchedule:
    """
    Unrolls FSM cycles into per-light phase tables so the light state at any
    time is a pure array lookup.

    For each FSM the walk from its current state eventually enters a cycle;
    we store the pre-cycle tail and the cycle as one schedule of (phase
    duration, per-light color) rows. ``states_at(t)`` then does a clamped /
    modular searchsorted -- fully jittable and exactly equivalent to ticking
    the host FSM by ``t`` seconds.

    Args:
        controller: host controller (defines FSMs + initial states).
        light_ids: the actor ids to expose, in tensor order.
    """
    MAX_PHASES = 64

    def __init__(self, controller: TrafficLightController, light_ids: Sequence[int]):
        self.light_ids = [int(i) for i in light_ids]
        id_strs = [str(i) for i in self.light_ids]
        n_fsm = len(controller.traffic_fsms)
        rows_dur = np.zeros((n_fsm, self.MAX_PHASES), dtype=np.float32)
        rows_color = np.zeros((n_fsm, self.MAX_PHASES, len(id_strs)), dtype=np.int32)
        cycle_start = np.zeros((n_fsm,), dtype=np.int32)
        n_rows = np.zeros((n_fsm,), dtype=np.int32)
        offset = np.zeros((n_fsm,), dtype=np.float32)

        for f, fsm in enumerate(controller.traffic_fsms):
            # unroll: current state first (with its remaining time as offset)
            seq = []
            visited = {}
            idx = fsm.current_state.sequence_number
            start_in_cycle = 0
            while True:
                if idx in visited:
                    start_in_cycle = visited[idx]
                    break
                visited[idx] = len(seq)
                seq.append(idx)
                idx = fsm.states[idx].next_state
                if len(seq) > self.MAX_PHASES:
                    raise ValueError("FSM cycle longer than MAX_PHASES")
            n_rows[f] = len(seq)
            cycle_start[f] = start_in_cycle
            offset[f] = fsm.states[seq[0]].duration - fsm.time_remaining
            for r, s in enumerate(seq):
                gs = fsm.states[s]
                rows_dur[f, r] = gs.duration
                for li, id_str in enumerate(id_strs):
                    color = gs.actor_states.get(id_str)
                    if color is not None:
                        rows_color[f, r, li] = CONTROL_STATE_INDEX[color.name]

        # map each light to its controlling FSM (first FSM that mentions it)
        light_fsm = np.zeros((len(id_strs),), dtype=np.int32)
        for li, id_str in enumerate(id_strs):
            for f, fsm in enumerate(controller.traffic_fsms):
                if any(id_str in gs.actor_states for gs in fsm.states):
                    light_fsm[li] = f
                    break

        # cumulative phase end-times over the unrolled schedule
        cum = np.cumsum(rows_dur, axis=1)
        tail_end = np.where(cycle_start > 0, cum[np.arange(n_fsm), cycle_start - 1], 0.0)
        total = cum[np.arange(n_fsm), n_rows - 1]
        self.durations_cum = jnp.asarray(cum)
        self.colors = jnp.asarray(rows_color)
        self.tail_end = jnp.asarray(tail_end)
        self.period = jnp.asarray(total - tail_end)
        self.offset = jnp.asarray(offset)
        self.light_fsm = jnp.asarray(light_fsm)
        self.n_rows = jnp.asarray(n_rows)

    def states_at(self, time_s) -> jnp.ndarray:
        """
        Light states at simulation time ``time_s`` seconds (traced ok).

        Returns:
            (num_lights,) int32 indices into ['red', 'yellow', 'green'].
        """
        t = jnp.asarray(time_s, dtype=jnp.float32) + self.offset  # per FSM
        # fold times beyond the tail into the cycle
        in_cycle = t - self.tail_end
        folded = self.tail_end + jnp.mod(in_cycle, jnp.maximum(self.period, 1e-6))
        t = jnp.where(t <= self.tail_end, t, folded)
        # row index: first cumulative end-time strictly greater than t
        row = jnp.sum((self.durations_cum <= t[..., None]).astype(jnp.int32), axis=-1)
        row = jnp.minimum(row, self.n_rows - 1)
        fsm_rows = row[self.light_fsm]                     # per light
        light_idx = jnp.arange(self.colors.shape[-1])
        return self.colors[self.light_fsm, fsm_rows, light_idx]
