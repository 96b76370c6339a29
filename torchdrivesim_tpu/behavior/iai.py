"""
Inverted AI API bridge: remote NPC intelligence
(semantics of `torchdrivesim/behavior/iai.py`).

These are blocking network calls; they can never live inside a jitted step
(the reference has the same boundary, `SURVEY.md §3.1`). The controller
therefore runs on the host between jitted segments: each ``advance`` packs
present NPC + ego states into an API payload, calls DRIVE, and scatters the
predictions back into the padded tensors.

The ``invertedai`` client is optional; importing this module without it
works, and constructing the controller raises a clear error.
"""
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.behavior.common import InitializationFailedError
from torchdrivesim_tpu.simulator import NPCController
from torchdrivesim_tpu.traffic_lights import (
    TrafficLightController, current_light_state_tensor_from_controller,
)

try:
    import invertedai
    is_available = True
except ImportError:
    invertedai = None
    is_available = False


def _require_client():
    if not is_available:
        raise ImportError(
            "The invertedai package is required for IAI-driven NPCs; "
            "install it and set IAI_API_KEY.")


def unpack_attributes(attributes) -> jnp.ndarray:
    """API AgentAttributes -> (3,) tensor (ref: `behavior/iai.py:15-16`)."""
    return jnp.asarray([attributes.length, attributes.width,
                        attributes.rear_axis_offset])


def agent_attributes_to_basic_agent_properties(agent_attributes) -> dict:
    """(3,) attribute tensor -> properties dict (ref: `behavior/iai.py:18-23`)."""
    return {
        'length': agent_attributes[0],
        'width': agent_attributes[1],
        'rear_axis_offset': agent_attributes[2],
    }


def agent_properties_to_agent_attributes(agent_properties: dict) -> jnp.ndarray:
    """Properties dict -> (3,) attribute tensor (ref: `behavior/iai.py:25-26`)."""
    return jnp.asarray([agent_properties['length'], agent_properties['width'],
                        agent_properties['rear_axis_offset']],
                       dtype=jnp.float32)


def iai_initialize(location: str, agent_count: int,
                   center: Tuple[float, float] = (0, 0),
                   traffic_light_state_history: Optional[list] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
    """
    INITIALIZE endpoint -> (agent attributes 1xAx3, states 1xAx4, recurrent
    states) (semantics of `behavior/iai.py:28-45`).
    """
    _require_client()
    try:
        response = invertedai.api.initialize(
            location=location, agent_count=agent_count,
            location_of_interest=center,
            traffic_light_state_history=traffic_light_state_history,
        )
    except invertedai.error.InvertedAIError as e:
        raise InitializationFailedError(str(e))
    attrs = jnp.asarray([[a.length, a.width, a.rear_axis_offset]
                         for a in response.agent_attributes])[None]
    states = jnp.asarray([[s.center.x, s.center.y, s.orientation, s.speed]
                          for s in response.agent_states])[None]
    return attrs, states, response.recurrent_states


def iai_drive(location: str, agent_states, agent_attributes, recurrent_states,
              traffic_lights_states=None, large: bool = False):
    """DRIVE endpoint wrapper (semantics of `behavior/iai.py:48-63`)."""
    _require_client()
    api = invertedai.large_drive if large else invertedai.api.drive
    return api(location=location, agent_states=agent_states,
               agent_attributes=agent_attributes,
               recurrent_states=recurrent_states,
               traffic_lights_states=traffic_lights_states)


class IAINPCController(NPCController):
    """
    NPCs driven by the Inverted AI API (ref: `behavior/iai.py:66-185`).
    ``advance`` is a HOST boundary: it blocks on the network and is not
    traceable; use it between jitted rollout segments.

    Args:
        location: IAI location name.
        recurrent_states: from ``iai_initialize``.
        traffic_light_controller: optional host FSM controller ticked each
            step and forwarded to the API.
    """
    LARGE_AGENT_THRESHOLD = 100

    def __init__(self, npc_size, npc_state, location: str,
                 recurrent_states=None, npc_present_mask=None, npc_types=None,
                 agent_type_names=None, spawn_controller=None,
                 traffic_light_controller: Optional[TrafficLightController] = None,
                 traffic_light_ids: Optional[List[int]] = None, dt: float = 0.1):
        _require_client()
        super().__init__(npc_size, npc_state, npc_present_mask, npc_types,
                         agent_type_names, spawn_controller)
        self.location = location
        self.recurrent_states = recurrent_states
        self.traffic_light_controller = traffic_light_controller
        self.traffic_light_ids = traffic_light_ids or []
        self.dt = dt

    def copy(self) -> "IAINPCController":
        # NPCController.copy() constructs self.__class__ positionally with
        # ITS argument order, which would scramble this subclass's signature
        # (location would receive the present mask)
        return self.__class__(
            self.npc_size, self.initial_npc_state, self.location,
            recurrent_states=self.recurrent_states,
            npc_present_mask=self.initial_npc_present_mask,
            npc_types=self.npc_types,
            agent_type_names=self.agent_type_names,
            spawn_controller=self.spawn_controller.copy(),
            traffic_light_controller=self.traffic_light_controller,
            traffic_light_ids=list(self.traffic_light_ids), dt=self.dt)

    def advance(self, npc_state, npc_present_mask, time, simulator=None):
        """
        Host-side NPC update: pack present NPCs (+ ego agents as
        conditioning), call DRIVE, scatter predictions back
        (ref: `behavior/iai.py:92-155`).
        """
        states_np = np.asarray(npc_state)
        mask_np = np.asarray(npc_present_mask)
        sizes_np = np.asarray(self.npc_size)
        assert states_np.shape[0] == 1, "IAI controller supports batch size 1"

        lights = None
        if self.traffic_light_controller is not None:
            self.traffic_light_controller.tick(self.dt)
            lights = self.traffic_light_controller.current_state_with_name
            if simulator is not None and simulator.traffic_controls and \
                    'traffic_light' in simulator.traffic_controls:
                tensor = current_light_state_tensor_from_controller(
                    self.traffic_light_controller, self.traffic_light_ids)
                simulator.state = simulator.state.replace(
                    traffic_control_state={
                        **simulator.state.traffic_control_state,
                        'traffic_light': tensor[None]})

        present_idx = np.nonzero(mask_np[0])[0]
        agent_states = [invertedai.common.AgentState(
            center=invertedai.common.Point(x=float(states_np[0, i, 0]),
                                           y=float(states_np[0, i, 1])),
            orientation=float(states_np[0, i, 2]),
            speed=float(states_np[0, i, 3])) for i in present_idx]
        agent_attributes = [invertedai.common.AgentAttributes(
            length=float(sizes_np[0, i, 0]), width=float(sizes_np[0, i, 1]),
            rear_axis_offset=float(sizes_np[0, i, 0]) * 0.4) for i in present_idx]
        # condition on the exposed (ego) agents as well
        if simulator is not None:
            ego = np.asarray(simulator.get_state())
            ego_size = np.asarray(simulator.get_agent_size())
            for a in range(ego.shape[1]):
                agent_states.append(invertedai.common.AgentState(
                    center=invertedai.common.Point(x=float(ego[0, a, 0]),
                                                   y=float(ego[0, a, 1])),
                    orientation=float(ego[0, a, 2]), speed=float(ego[0, a, 3])))
                agent_attributes.append(invertedai.common.AgentAttributes(
                    length=float(ego_size[0, a, 0]),
                    width=float(ego_size[0, a, 1]),
                    rear_axis_offset=float(ego_size[0, a, 0]) * 0.4))

        large = len(agent_states) >= self.LARGE_AGENT_THRESHOLD
        response = iai_drive(self.location, agent_states, agent_attributes,
                             self.recurrent_states,
                             traffic_lights_states=lights, large=large)
        self.recurrent_states = response.recurrent_states

        new_states = states_np.copy()
        for slot, pred in zip(present_idx, response.agent_states):
            new_states[0, slot] = [pred.center.x, pred.center.y,
                                   pred.orientation, pred.speed]
        state = jnp.asarray(new_states)
        return self.spawn_controller.apply(state, npc_present_mask, time)
