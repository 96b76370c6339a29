"""
Simulator orchestration: world state, stepping, observation, infractions.

Re-design of the reference `torchdrivesim/simulator.py` around an immutable
state PyTree:

* :class:`SimulatorState` carries everything that changes during simulation
  (agent/NPC states, presence, traffic-control states, waypoint progress,
  time). It is a flax PyTree, so ``jax.lax.scan`` rollouts, ``jax.grad``,
  orbax checkpointing, vmap, and sharding all apply directly.
* :class:`Simulator` is a thin stateful facade with the reference's API
  (~40 methods: step / set_state / render / render_egocentric /
  compute_offroad / compute_collision / extend / select_batch_elements /
  copy / to / get_*). It owns the static parameters (meshes, sizes, kinematic
  params, controls, renderer) and delegates every mutation to pure functions.
* ``functional_step`` / ``functional_observe`` / ``functional_metrics``
  expose the pure core directly for jit/scan hot loops (the facade's
  ``step`` uses the same functions).

The reference's per-agent collision loop (`simulator.py:1186-1192`), host
FSM ticking and CPU round-trips are all replaced by batched on-device ops.
"""
from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchdrivesim_tpu.goals import (
    WaypointGoal, WaypointGoalState, gather_current, init_waypoint_state,
    step_waypoints,
)
from torchdrivesim_tpu.infractions import (
    compute_agent_collisions_metric, compute_agent_collisions_metric_pytorch3d,
    compute_collision_matrix, lanelet_orientation_loss, offroad_infraction_loss,
)
from torchdrivesim_tpu.kinematic import KinematicModel
from torchdrivesim_tpu.map_grids import (
    MapGrids, offroad_loss_from_grid, wrong_way_loss_from_grid,
)
from torchdrivesim_tpu.mesh import BirdviewMesh
from torchdrivesim_tpu.observation_noise import ObservationNoise, ObservationNoiseConfig
from torchdrivesim_tpu.rendering import (
    BirdviewRenderer, RendererConfig, renderer_from_config,
)
from torchdrivesim_tpu.scene_mesh import BirdviewRGBMeshGenerator
from torchdrivesim_tpu.traffic_controls import BaseTrafficControl
from torchdrivesim_tpu.utils import (
    Resolution, as_batch_index, assert_equal, host_repeat,
    is_inside_polygon, relative, time_slice)

logger = logging.getLogger(__name__)


class CollisionMetric(Enum):
    """Collision computation method (ref: `simulator.py:27-34`)."""
    iou = 'iou'
    discs = 'discs'
    nograd = 'nograd'
    nograd_pytorch3d = 'nograd-pytorch3d'


@dataclass
class TorchDriveConfig:
    """Top-level simulator configuration (fields of `simulator.py:38-51`)."""
    renderer: RendererConfig = field(default_factory=RendererConfig)
    single_agent_rendering: bool = False
    collision_metric: CollisionMetric = field(
        default_factory=lambda: CollisionMetric.discs)
    offroad_threshold: float = 0.5
    left_handed_coordinates: bool = False
    wrong_way_angle_threshold: float = float(np.pi / 2)
    lanelet_inclusion_tolerance: float = 1.0
    waypoint_removal_threshold: float = 2.0


@struct.dataclass
class SimulatorState:
    """Everything that changes during simulation, as one PyTree."""
    agent_state: jnp.ndarray                 #: BxAx4 (x, y, psi, v)
    present_mask: jnp.ndarray                #: BxA bool
    npc_state: jnp.ndarray                   #: BxNpcx4
    npc_present_mask: jnp.ndarray            #: BxNpc bool
    traffic_control_state: Dict[str, jnp.ndarray]  #: per control type, BxN int
    waypoint_state: Optional[WaypointGoalState]
    time: jnp.ndarray                        #: scalar int32 step counter
    npc_time: jnp.ndarray                    #: scalar int32 controller clock

    @property
    def batch_size(self) -> int:
        return self.agent_state.shape[0]


# ----------------------------------------------------------------------------
# NPC controllers (ref: `simulator.py:54-277`, `behavior/replay.py:46`)
# ----------------------------------------------------------------------------

class SpawnController:
    """
    Spawning/despawning of NPCs (ref: `simulator.py:54-124`): despawn outside
    the exit boundary; spawn from timed spawn tables. The advance is a pure
    function of (npc_state, mask, time).

    Args:
        exit_boundary: BxNx2 polygon vertices.
        spawn_states: BxAxTx4; spawn_masks: BxAxT.
    """
    def __init__(self, exit_boundary: Optional[jnp.ndarray] = None,
                 spawn_states: Optional[jnp.ndarray] = None,
                 spawn_masks: Optional[jnp.ndarray] = None):
        self.exit_boundary = exit_boundary
        self.spawn_states = spawn_states
        self.spawn_masks = spawn_masks

    def apply(self, npc_state: jnp.ndarray, npc_present_mask: jnp.ndarray,
              time) -> tuple:
        """Pure spawn/despawn update; ``time`` may be traced."""
        if self.exit_boundary is not None:
            inside = is_inside_polygon(npc_state[..., :2], self.exit_boundary)
            npc_present_mask = npc_present_mask & inside
        if self.spawn_states is not None and self.spawn_masks is not None:
            mask_t = time_slice(self.spawn_masks, time, axis=-1)
            state_t = time_slice(self.spawn_states, time, axis=-2)
            to_spawn = mask_t & ~npc_present_mask
            npc_present_mask = npc_present_mask | to_spawn
            npc_state = jnp.where(to_spawn[..., None], state_t, npc_state)
        return npc_state, npc_present_mask

    def to(self, device=None):
        return self

    def copy(self):
        return self.__class__(self.exit_boundary, self.spawn_states, self.spawn_masks)

    def _map(self, f):
        out = self.copy()
        for name in ('exit_boundary', 'spawn_states', 'spawn_masks'):
            v = getattr(out, name)
            if v is not None:
                setattr(out, name, f(v))
        return out

    def extend(self, n, in_place=True):
        out = self._map(lambda x: host_repeat(x, n))
        if in_place:
            self.__dict__.update(out.__dict__)
            return self
        return out

    def select_batch_elements(self, idx, in_place=True):
        idx = as_batch_index(idx)
        out = self._map(lambda x: x[idx])
        if in_place:
            self.__dict__.update(out.__dict__)
            return self
        return out


class NPCController:
    """
    Base NPC controller: leaves NPC states unchanged apart from
    spawn/despawn (ref: `simulator.py:128-203`). Holds static attributes;
    the dynamic NPC state lives in :class:`SimulatorState`.
    """
    def __init__(self, npc_size: jnp.ndarray, npc_state: jnp.ndarray,
                 npc_present_mask: Optional[jnp.ndarray] = None,
                 npc_types: Optional[jnp.ndarray] = None,
                 agent_type_names: Optional[List[str]] = None,
                 spawn_controller: Optional[SpawnController] = None):
        def _as(x):
            return x if isinstance(x, jnp.ndarray) else np.asarray(x)
        self.npc_size = _as(npc_size)
        self.initial_npc_state = _as(npc_state)
        xp = np if isinstance(self.initial_npc_state, np.ndarray) else jnp
        self.initial_npc_present_mask = (
            _as(npc_present_mask) if npc_present_mask is not None
            else xp.ones_like(self.initial_npc_state[..., 0], dtype=bool))
        self.npc_types = (_as(npc_types) if npc_types is not None
                          else xp.zeros_like(self.initial_npc_present_mask,
                                             dtype=xp.int32))
        self.agent_type_names = agent_type_names or ['vehicle']
        self.spawn_controller = spawn_controller or SpawnController()

    # --- pure advance (used inside jit) ---------------------------------------

    def advance(self, npc_state: jnp.ndarray, npc_present_mask: jnp.ndarray,
                time, simulator: Optional["Simulator"] = None) -> tuple:
        """
        Pure NPC update: (state, mask, time) -> (state, mask).
        ``time`` is the controller clock (traced ok).
        """
        return self.spawn_controller.apply(npc_state, npc_present_mask, time)

    # --- legacy attribute views / mutating conveniences ------------------------

    def advance_npcs(self, simulator: "Simulator") -> None:
        """Mutating convenience matching the reference flow
        (`simulator.py:166`): advances NPC state inside the simulator."""
        s = simulator.state
        npc_state, npc_mask = self.advance(
            s.npc_state, s.npc_present_mask, s.npc_time + 1, simulator)
        simulator.state = s.replace(npc_state=npc_state,
                                    npc_present_mask=npc_mask,
                                    npc_time=s.npc_time + 1)

    def spawn_despawn_npcs(self, simulator: "Simulator") -> None:
        """Apply only the spawn controller (ref: `simulator.py:162`)."""
        s = simulator.state
        npc_state, npc_mask = self.spawn_controller.apply(
            s.npc_state, s.npc_present_mask, s.npc_time)
        simulator.state = s.replace(npc_state=npc_state,
                                    npc_present_mask=npc_mask)

    def get_npc_state(self):
        """The controller's initial NPC states; live states are on
        `SimulatorState.npc_state`."""
        return self.initial_npc_state

    def get_npc_present_mask(self):
        return self.initial_npc_present_mask

    def get_npc_size(self):
        return self.npc_size

    def get_npc_types(self):
        return self.npc_types

    def to(self, device=None):
        return self

    def copy(self):
        return self.__class__(self.npc_size, self.initial_npc_state,
                              self.initial_npc_present_mask, self.npc_types,
                              self.agent_type_names, self.spawn_controller.copy())

    def _array_fields(self):
        return ('npc_size', 'initial_npc_state', 'initial_npc_present_mask',
                'npc_types')

    def extend(self, n, in_place=True):
        target = self if in_place else self.copy()
        for name in target._array_fields():
            setattr(target, name, host_repeat(getattr(self, name), n))
        target.spawn_controller = self.spawn_controller.extend(n, in_place=False)
        return target

    def select_batch_elements(self, idx, in_place=True):
        target = self if in_place else self.copy()
        idx = as_batch_index(idx)
        for name in target._array_fields():
            setattr(target, name, getattr(self, name)[idx])
        target.spawn_controller = self.spawn_controller.select_batch_elements(
            idx, in_place=False)
        return target

    @classmethod
    def empty(cls, batch_size: int, agent_type_names: Optional[List[str]] = None):
        return cls(npc_size=np.zeros((batch_size, 0, 2), np.float32),
                   npc_state=np.zeros((batch_size, 0, 4), np.float32),
                   npc_present_mask=np.zeros((batch_size, 0), dtype=bool),
                   npc_types=np.zeros((batch_size, 0), dtype=np.int32),
                   agent_type_names=agent_type_names)


class ReplayController(NPCController):
    """
    NPCs replayed from recorded trajectories (ref: `behavior/replay.py:46`):
    the controller clock indexes a BxNpcxTx4 table, wrapping at the end.
    """
    def __init__(self, npc_size, npc_states, npc_present_masks=None, time: int = 0,
                 npc_types=None, agent_type_names=None, spawn_controller=None):
        self.npc_states = jnp.asarray(npc_states)              # B x Npc x T x 4
        self.npc_present_masks = (
            jnp.asarray(npc_present_masks) if npc_present_masks is not None
            else jnp.ones_like(self.npc_states[..., 0], dtype=bool))
        self.start_time = time
        super().__init__(npc_size, self.npc_states[..., time, :],
                         self.npc_present_masks[..., time], npc_types,
                         agent_type_names, spawn_controller)

    def advance(self, npc_state, npc_present_mask, time, simulator=None):
        t_total = self.npc_states.shape[-2]
        t = jnp.mod(jnp.asarray(time) + self.start_time, t_total)
        state = time_slice(self.npc_states, t, axis=-2)
        mask = time_slice(self.npc_present_masks, t, axis=-1)
        return self.spawn_controller.apply(state, mask, time)

    def copy(self):
        return self.__class__(self.npc_size, self.npc_states,
                              self.npc_present_masks, self.start_time,
                              self.npc_types, self.agent_type_names,
                              self.spawn_controller.copy())

    def _array_fields(self):
        return super()._array_fields() + ('npc_states', 'npc_present_masks')


class CompoundNPCController(NPCController):
    """
    Routes each NPC slot to one of several controllers by index
    (ref: `simulator.py:206-277`), merged with ``jnp.where`` selection.
    """
    def __init__(self, controllers: List[NPCController],
                 controller_indices: jnp.ndarray):
        self.controllers = controllers
        self.controller_indices = jnp.asarray(controller_indices)
        base = controllers[0]
        state = base.initial_npc_state
        mask = base.initial_npc_present_mask
        for i, c in enumerate(controllers):
            sel = (self.controller_indices == i)
            state = jnp.where(sel[..., None], c.initial_npc_state, state)
            mask = jnp.where(sel, c.initial_npc_present_mask, mask)
        size = base.npc_size
        types = base.npc_types
        for i, c in enumerate(controllers):
            sel = (self.controller_indices == i)
            size = jnp.where(sel[..., None], c.npc_size, size)
            types = jnp.where(sel, c.npc_types, types)
        super().__init__(size, state, mask, types, base.agent_type_names)

    def advance(self, npc_state, npc_present_mask, time, simulator=None):
        out_state, out_mask = npc_state, npc_present_mask
        for i, c in enumerate(self.controllers):
            s, m = c.advance(npc_state, npc_present_mask, time, simulator)
            sel = (self.controller_indices == i)
            out_state = jnp.where(sel[..., None], s, out_state)
            out_mask = jnp.where(sel, m, out_mask)
        return out_state, out_mask

    def gather_npc_states(self):
        """No-op kept for API familiarity (ref: `simulator.py:229`): the
        functional `advance` merges sub-controller outputs directly."""
        return None

    def copy(self):
        return self.__class__([c.copy() for c in self.controllers],
                              self.controller_indices)

    def extend(self, n, in_place=True):
        target = self if in_place else self.copy()
        NPCController.extend(target, n, in_place=True)
        target.controller_indices = host_repeat(self.controller_indices, n)
        target.controllers = [c.extend(n, in_place=False) for c in self.controllers]
        return target

    def select_batch_elements(self, idx, in_place=True):
        target = self if in_place else self.copy()
        NPCController.select_batch_elements(target, idx, in_place=True)
        idx = as_batch_index(idx)
        target.controller_indices = self.controller_indices[idx]
        target.controllers = [c.select_batch_elements(idx, in_place=False)
                              for c in self.controllers]
        return target


# ----------------------------------------------------------------------------
# The simulator
# ----------------------------------------------------------------------------

class Simulator:
    """
    Stateful facade over the pure simulation core, with the reference's
    constructor signature and method surface (`simulator.py:280-1194`).

    Args:
        road_mesh: drivable-area mesh (batch B).
        kinematic_model: action space + constraints; must hold the initial
            agent states.
        agent_size: BxAx2 (length, width).
        initial_present_mask: BxA bool.
        cfg: configuration options.
    """
    def __init__(self, road_mesh: BirdviewMesh, kinematic_model: KinematicModel,
                 agent_size: jnp.ndarray, initial_present_mask: jnp.ndarray,
                 cfg: TorchDriveConfig, renderer: Optional[BirdviewRenderer] = None,
                 lanelet_map: Optional[List] = None,
                 recenter_offset: Optional[jnp.ndarray] = None,
                 birdview_mesh_generator: Optional[BirdviewRGBMeshGenerator] = None,
                 internal_time: int = 0,
                 traffic_controls: Optional[Dict[str, BaseTrafficControl]] = None,
                 waypoint_goals: Optional[WaypointGoal] = None,
                 agent_types: Optional[jnp.ndarray] = None,
                 agent_type_names: Optional[List[str]] = None,
                 npc_controller: Optional[NPCController] = None,
                 agent_lr: Optional[jnp.ndarray] = None,
                 lane_features=None,
                 observation_noise_model: Optional[ObservationNoise] = None,
                 action_model_extras: Optional[Dict[str, Any]] = None,
                 map_grids: Optional[MapGrids] = None):
        self.road_mesh = road_mesh
        self.lanelet_map = lanelet_map
        self.recenter_offset = recenter_offset
        self.kinematic_model = kinematic_model
        # host inputs stay host: these become jit closure CONSTANTS, and a
        # device-array constant forces a device->host fetch at lowering,
        # which permanently degrades dispatch latency on tunneled backends
        self.agent_size = agent_size if isinstance(agent_size, jnp.ndarray) \
            else np.asarray(agent_size)
        self.action_model_extras = action_model_extras
        self.lane_features = lane_features
        self.map_grids = map_grids
        self.warned_no_lanelet = False

        if not isinstance(initial_present_mask, jnp.ndarray):
            initial_present_mask = np.asarray(initial_present_mask)
        xp = np if isinstance(initial_present_mask, np.ndarray) else jnp
        if not agent_type_names:
            agent_type_names = ['vehicle']
        if agent_types is None:
            agent_types = xp.zeros_like(initial_present_mask, dtype=xp.int32)
        if agent_types.shape[0] == 1:
            xpt = np if isinstance(agent_types, np.ndarray) else jnp
            agent_types = xpt.broadcast_to(agent_types,
                                           initial_present_mask.shape)
        if agent_lr is None:
            agent_lr = xp.zeros_like(initial_present_mask,
                                     dtype=self.agent_size.dtype)
        if agent_lr.shape[0] == 1:
            xpl = np if isinstance(agent_lr, np.ndarray) else jnp
            agent_lr = xpl.broadcast_to(agent_lr, initial_present_mask.shape)

        self._agent_types = agent_type_names
        self._batch_size = road_mesh.batch_size
        self.agent_type = agent_types
        self.agent_lr = agent_lr

        self.npc_controller = npc_controller or NPCController.empty(
            self._batch_size, agent_type_names)

        self.cfg = cfg
        if renderer is None:
            cfg.renderer.left_handed_coordinates = cfg.left_handed_coordinates
            self.renderer = renderer_from_config(cfg.renderer)
        else:
            self.renderer = renderer

        self.traffic_controls = traffic_controls
        self.waypoint_goals = waypoint_goals
        if cfg.left_handed_coordinates and hasattr(self.kinematic_model, 'left_handed'):
            self.kinematic_model.left_handed = cfg.left_handed_coordinates

        if birdview_mesh_generator is None:
            self.birdview_mesh_generator = BirdviewRGBMeshGenerator(
                background_mesh=self.road_mesh,
                color_map=self.renderer.color_map,
                rendering_levels=self.renderer.rendering_levels)
            self.birdview_mesh_generator.initialize_actors_mesh(
                self.get_all_agent_size(), self.get_all_agent_type(),
                self._agent_types)
            if self.traffic_controls is not None:
                self.birdview_mesh_generator.initialize_traffic_controls_mesh(
                    self.traffic_controls)
        else:
            self.birdview_mesh_generator = birdview_mesh_generator

        self.observation_noise_model = observation_noise_model or \
            ObservationNoise(ObservationNoiseConfig())
        self.check_prim_budget()

        # assemble the dynamic state PyTree
        self.state = SimulatorState(
            agent_state=self.kinematic_model.get_state(),
            present_mask=initial_present_mask,
            npc_state=self.npc_controller.initial_npc_state,
            npc_present_mask=self.npc_controller.initial_npc_present_mask,
            traffic_control_state={
                k: v.state for k, v in (self.traffic_controls or {}).items()},
            waypoint_state=(self.waypoint_goals._state
                            if self.waypoint_goals is not None else None),
            time=jnp.asarray(internal_time, jnp.int32),
            npc_time=jnp.asarray(0, jnp.int32),
        )
        self.validate_agent_types()
        self.validate_tensor_shapes()

    # --- properties -------------------------------------------------------------

    @property
    def agent_types(self) -> Optional[List[str]]:
        return self._agent_types

    @property
    def action_size(self) -> int:
        return self.kinematic_model.action_size

    @property
    def batch_size(self) -> int:
        return self._batch_size

    @property
    def agent_count(self) -> int:
        return self.agent_size.shape[-2]

    @property
    def npc_count(self) -> int:
        return self.npc_controller.npc_size.shape[-2]

    @property
    def internal_time(self) -> int:
        return int(self.state.time)

    @property
    def present_mask(self) -> jnp.ndarray:
        return self.state.present_mask

    # --- validation ---------------------------------------------------------------

    def validate_agent_types(self):
        return

    def validate_tensor_shapes(self):
        assert_equal(len(self.state.agent_state.shape), 3)
        assert_equal(len(self.agent_size.shape), 3)
        assert_equal(len(self.agent_type.shape), 2)
        assert_equal(len(self.agent_lr.shape), 2)
        assert_equal(len(self.state.present_mask.shape), 2)
        b = self.batch_size
        assert_equal(self.road_mesh.batch_size, b)
        assert_equal(self.state.agent_state.shape[0], b)
        assert_equal(self.agent_size.shape[0], b)
        a = self.agent_count
        assert_equal(self.state.agent_state.shape[-2], a)
        assert_equal(self.agent_type.shape[-1], a)
        assert_equal(self.agent_lr.shape[-1], a)
        assert_equal(self.state.present_mask.shape[-1], a)

    # --- pure core ---------------------------------------------------------------

    def functional_step(self, state: SimulatorState, agent_action: jnp.ndarray
                        ) -> SimulatorState:
        """
        One pure simulation step (the jit/scan-friendly core of
        `simulator.py:841-861`): NPC advance, kinematic step, traffic-control
        advance, waypoint advance.
        """
        time = state.time + 1
        npc_time = state.npc_time + 1
        with jax.named_scope('npc_advance'):
            npc_state, npc_mask = self.npc_controller.advance(
                state.npc_state, state.npc_present_mask, npc_time, self)
        km = self.kinematic_model
        from torchdrivesim_tpu import kinematic as K
        model_ids = getattr(km, 'model_assignments', None)
        with jax.named_scope('kinematic_step'):
            agent_state = K.step(
                state.agent_state, agent_action, km.params,
                model_ids=model_ids,
                single_model=None if model_ids is not None else km.model_id)
        with jax.named_scope('traffic_controls'):
            # one code path with the facade's step(): the control's pure
            # advance() (replay -> compute_state (e.g. baked FSM schedule)
            # -> hold); subclass overrides work identically under jit
            tc_state = {}
            for kind, control in (self.traffic_controls or {}).items():
                tc_state[kind] = control.advance(
                    state.traffic_control_state[kind], time)
        wp_state = state.waypoint_state
        if self.waypoint_goals is not None and wp_state is not None:
            with jax.named_scope('waypoint_goals'):
                wp_state = step_waypoints(
                    self.waypoint_goals.waypoints, wp_state, agent_state,
                    threshold=self.cfg.waypoint_removal_threshold)
        return SimulatorState(
            agent_state=agent_state, present_mask=state.present_mask,
            npc_state=npc_state, npc_present_mask=npc_mask,
            traffic_control_state=tc_state, waypoint_state=wp_state,
            time=time, npc_time=npc_time)

    # --- mutating facade -----------------------------------------------------------

    def step(self, agent_action: jnp.ndarray) -> None:
        """Advance one step (ref: `simulator.py:841-861`)."""
        agent_action = jnp.asarray(agent_action)
        assert_equal(len(agent_action.shape), 3)
        assert_equal(agent_action.shape[0], self.batch_size)
        assert_equal(agent_action.shape[-2], self.agent_count)
        self.state = self.functional_step(self.state, agent_action)
        self._sync_legacy_state()

    def _sync_legacy_state(self):
        """Keep object-attribute views coherent with the state PyTree."""
        self.kinematic_model.set_state(self.state.agent_state)
        for kind, control in (self.traffic_controls or {}).items():
            control.state = self.state.traffic_control_state[kind]
        if self.waypoint_goals is not None and self.state.waypoint_state is not None:
            self.waypoint_goals._state = self.state.waypoint_state

    def set_state(self, agent_state: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None) -> None:
        """Directly overwrite (part of) the agent states (ref: `simulator.py:863`)."""
        agent_state = jnp.asarray(agent_state)
        if mask is None:
            mask = jnp.ones_like(agent_state[..., 0], dtype=bool)
        assert_equal(len(agent_state.shape), 3)
        assert_equal(agent_state.shape[0], self.batch_size)
        assert_equal(agent_state.shape[-2], self.agent_count)
        current = self.state.agent_state
        if agent_state.shape[-1] < current.shape[-1]:
            agent_state = jnp.concatenate(
                [agent_state, current[..., agent_state.shape[-1]:]], axis=-1)
        new_state = jnp.where(mask[..., None], agent_state, current)
        self.state = self.state.replace(agent_state=new_state)
        self.kinematic_model.set_state(new_state)

    def update_present_mask(self, present_mask: jnp.ndarray) -> None:
        assert_equal(present_mask.shape, self.state.present_mask.shape)
        self.state = self.state.replace(present_mask=jnp.asarray(present_mask))

    def fit_action(self, future_state: jnp.ndarray,
                   current_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.kinematic_model.fit_action(
            future_state=future_state,
            current_state=current_state if current_state is not None
            else self.state.agent_state)

    # --- copies / batch ops ----------------------------------------------------------

    def to(self, device=None) -> "Simulator":
        return self

    def copy(self) -> "Simulator":
        other = self.__class__(
            road_mesh=self.road_mesh, kinematic_model=self.kinematic_model.copy(),
            agent_size=self.agent_size, initial_present_mask=self.state.present_mask,
            cfg=self.cfg, renderer=self.renderer.copy(), lanelet_map=self.lanelet_map,
            birdview_mesh_generator=self.birdview_mesh_generator.copy(),
            recenter_offset=self.recenter_offset, internal_time=self.internal_time,
            traffic_controls={k: v.copy() for k, v in self.traffic_controls.items()}
            if self.traffic_controls is not None else None,
            waypoint_goals=self.waypoint_goals.copy()
            if self.waypoint_goals is not None else None,
            agent_types=self.agent_type, agent_type_names=self._agent_types,
            agent_lr=self.agent_lr, npc_controller=self.npc_controller.copy(),
            lane_features=self.lane_features.copy()
            if self.lane_features is not None else None,
            observation_noise_model=self.observation_noise_model,
            map_grids=self.map_grids,
        )
        other.state = self.state
        other._sync_legacy_state()
        return other

    def extend(self, n: int, in_place: bool = True) -> "Simulator":
        """Multiply the batch dimension (ref: `simulator.py:444-478`)."""
        if not in_place:
            other = self.copy()
            other.extend(n, in_place=True)
            return other
        enlarge = lambda x: host_repeat(x, n)
        self.road_mesh = self.road_mesh.expand(n)
        self.agent_size = enlarge(self.agent_size)
        self.agent_type = enlarge(self.agent_type)
        self.agent_lr = enlarge(self.agent_lr)
        self.recenter_offset = enlarge(self.recenter_offset) \
            if self.recenter_offset is not None else None
        self.lanelet_map = [m for m in self.lanelet_map for _ in range(n)] \
            if self.lanelet_map is not None else None
        self.lane_features = self.lane_features.extend(n) \
            if self.lane_features is not None else None
        self.kinematic_model.extend(n)
        self._batch_size *= n
        self.birdview_mesh_generator = self.birdview_mesh_generator.expand(n)
        if self.traffic_controls is not None:
            self.traffic_controls = {k: v.extend(n, in_place=False)
                                     for k, v in self.traffic_controls.items()}
        if self.waypoint_goals is not None:
            self.waypoint_goals = self.waypoint_goals.extend(n, in_place=False)
        self.npc_controller = self.npc_controller.extend(n, in_place=False)
        self.state = jax.tree.map(
            lambda x: enlarge(x) if hasattr(x, 'ndim') and x.ndim > 0 else x,
            self.state)
        return self

    def select_batch_elements(self, idx, in_place: bool = True) -> "Simulator":
        """Pick batch elements (ref: `simulator.py:480-511`)."""
        if not in_place:
            other = self.copy()
            other.select_batch_elements(idx, in_place=True)
            return other
        idx = as_batch_index(idx)
        sel = lambda x: x[idx]
        self.road_mesh = self.road_mesh[idx]
        self.agent_size = sel(self.agent_size)
        self.agent_type = sel(self.agent_type)
        self.agent_lr = sel(self.agent_lr)
        self.recenter_offset = sel(self.recenter_offset) \
            if self.recenter_offset is not None else None
        self.lanelet_map = [self.lanelet_map[int(i)] for i in np.asarray(idx)] \
            if self.lanelet_map is not None else None
        self.lane_features = self.lane_features.select_batch_elements(idx) \
            if self.lane_features is not None else None
        self.kinematic_model.select_batch_elements(idx)
        self._batch_size = int(idx.shape[0])
        self.birdview_mesh_generator = \
            self.birdview_mesh_generator.select_batch_elements(idx)
        if self.traffic_controls is not None:
            self.traffic_controls = {
                k: v.select_batch_elements(idx, in_place=False)
                for k, v in self.traffic_controls.items()}
        if self.waypoint_goals is not None:
            self.waypoint_goals = self.waypoint_goals.select_batch_elements(
                idx, in_place=False)
        self.npc_controller = self.npc_controller.select_batch_elements(
            idx, in_place=False)
        self.state = jax.tree.map(
            lambda x: x[idx] if hasattr(x, 'ndim') and x.ndim > 0 else x,
            self.state)
        return self

    def __getitem__(self, item) -> "Simulator":
        return self.select_batch_elements(item, in_place=False)

    # --- getters -----------------------------------------------------------------

    def get_world_center(self) -> jnp.ndarray:
        return self.birdview_mesh_generator.world_center

    def get_state(self) -> jnp.ndarray:
        return self.state.agent_state

    def get_waypoints(self, count: int = 1):
        if self.waypoint_goals is None:
            return None
        return gather_current(self.waypoint_goals.waypoints,
                              self.state.waypoint_state, count)[0]

    def get_waypoints_state(self):
        return self.state.waypoint_state.state \
            if self.state.waypoint_state is not None else None

    def get_waypoints_mask(self, count: int = 1):
        if self.waypoint_goals is None:
            return None
        return gather_current(self.waypoint_goals.waypoints,
                              self.state.waypoint_state, count)[1]

    def get_agent_size(self) -> jnp.ndarray:
        return self.agent_size

    def get_agent_type(self) -> jnp.ndarray:
        return self.agent_type

    def get_agent_type_names(self) -> List[str]:
        return self._agent_types

    def get_agent_lr(self) -> jnp.ndarray:
        return self.agent_lr

    def get_present_mask(self) -> jnp.ndarray:
        return self.state.present_mask

    def get_npc_state(self) -> jnp.ndarray:
        return self.state.npc_state

    def get_npc_size(self) -> jnp.ndarray:
        return self.npc_controller.npc_size

    def get_npc_present_mask(self) -> jnp.ndarray:
        return self.state.npc_present_mask

    def get_npc_types(self) -> jnp.ndarray:
        return self.npc_controller.npc_types

    def get_all_agent_state(self) -> jnp.ndarray:
        return jnp.concatenate([self.get_state(), self.get_npc_state()], axis=-2)

    @staticmethod
    def _cat(arrays, axis):
        # host inputs stay host so derived tables embed as host jit constants
        xp = np if all(isinstance(a, np.ndarray) for a in arrays) else jnp
        return xp.concatenate(arrays, axis=axis)

    def get_all_agent_size(self) -> jnp.ndarray:
        return self._cat([self.agent_size, self.get_npc_size()], axis=-2)

    def get_all_agent_present_mask(self) -> jnp.ndarray:
        return self._cat(
            [self.get_present_mask(), self.get_npc_present_mask()], axis=-1)

    def get_all_agent_type(self) -> jnp.ndarray:
        return self._cat([self.agent_type, self.get_npc_types()], axis=-1)

    def get_all_agents_absolute(self) -> jnp.ndarray:
        """Bx(A+Npc)x6: x, y, psi, length, width, present (ref: `simulator.py:730`)."""
        agent = jnp.concatenate([
            self.get_state()[..., :3], self.agent_size,
            self.get_present_mask()[..., None].astype(self.agent_size.dtype)],
            axis=-1)
        npc = jnp.concatenate([
            self.get_npc_state()[..., :3], self.get_npc_size(),
            self.get_npc_present_mask()[..., None].astype(self.agent_size.dtype)],
            axis=-1)
        return jnp.concatenate([agent, npc], axis=-2)

    def get_all_agents_relative(self, exclude_self: bool = True) -> jnp.ndarray:
        """Per-agent relative views of all agents (ref: `simulator.py:748-782`)."""
        abs_pos = self.get_all_agents_absolute()
        return _relative_views(abs_pos, self.agent_count, self.npc_count,
                               exclude_self)

    def get_traffic_controls(self) -> Optional[Dict[str, BaseTrafficControl]]:
        return self.traffic_controls

    def set_light_schedule(self, schedule) -> None:
        """
        Drive the 'traffic_light' control from a baked FSM schedule
        (:class:`~torchdrivesim_tpu.traffic_lights.BakedLightSchedule`):
        ``functional_step`` then advances light states from the schedule
        (replay -> schedule -> hold), and render / red-light violations see
        FSM-driven lights with no per-consumer wiring. ``dt`` is taken from
        the kinematic model. Mirrors the reference's per-step controller
        tick (`behavior/iai.py:130-136`) as a pure time lookup.
        """
        control = (self.traffic_controls or {}).get('traffic_light')
        assert control is not None, "no 'traffic_light' control to schedule"
        control.set_schedule(schedule, dt=float(self.kinematic_model.dt))
        # apply the schedule at the CURRENT time too: a render or violation
        # check before the first step must already see FSM-driven lights,
        # not the control's default state (the advance only runs in step)
        current = self.state.traffic_control_state.get('traffic_light')
        if current is not None and schedule is not None:
            # replay -> schedule order holds at setup time too
            now = control.advance(current, self.internal_time)
            self.state = dataclasses.replace(
                self.state, traffic_control_state={
                    **self.state.traffic_control_state,
                    'traffic_light': now})
            control.state = now

    def get_traffic_light_state(self) -> Optional[jnp.ndarray]:
        return self.state.traffic_control_state.get('traffic_light')

    def get_action_model_extras(self) -> Dict[str, Any]:
        if self.action_model_extras is None:
            return {}
        out = {}
        for k, v in self.action_model_extras.items():
            if k == 'target_speeds' and v is not None:
                out['target_speed'] = v.reshape(-1, *v.shape[2:])[:, 0]
            elif k == 'target_speeds_mask' and v is not None:
                out['target_speed_mask'] = v.reshape(-1, *v.shape[2:])[:, 0]
            else:
                out[k] = v
        return out

    # --- noisy observation passthroughs (ref: `simulator.py:663-679,829-839`) ----

    def get_noisy_state(self):
        return self.observation_noise_model.get_noisy_state(self)

    def get_noisy_agent_size(self):
        return self.observation_noise_model.get_noisy_agent_size(self)

    def get_noisy_present_mask(self):
        return self.observation_noise_model.get_noisy_present_mask(self)

    def get_noisy_all_agents_absolute(self):
        return jnp.concatenate([
            self.get_noisy_state()[..., :3], self.get_noisy_agent_size(),
            self.get_noisy_present_mask()[..., None].astype(self.agent_size.dtype),
        ], axis=-1)

    def get_noisy_all_agents_relative(self, exclude_self: bool = True):
        abs_pos = self.get_noisy_all_agents_absolute()  # BxAx(A+Npc)x6
        a = self.agent_count
        idx = jnp.arange(a)
        own = abs_pos[:, idx, idx, :]
        xy, psi = own[..., :2], own[..., 2:3]
        rel_xy, rel_psi = relative(origin_xy=xy[:, :, None],
                                   origin_psi=psi[:, :, None],
                                   target_xy=abs_pos[..., :2],
                                   target_psi=abs_pos[..., 2:3])
        rel = jnp.concatenate([rel_xy, rel_psi, abs_pos[..., 3:]], axis=-1)
        if exclude_self:
            rel = _drop_self(rel, a)
        return rel

    def get_noisy_lane_features(self):
        return self.observation_noise_model.get_noisy_lane_features(self)

    def get_noisy_road_mesh(self):
        return self.observation_noise_model.get_noisy_road_mesh(self)

    def get_noisy_background_mesh(self):
        return self.observation_noise_model.get_noisy_background_mesh(self)

    def get_noisy_traffic_controls(self):
        return self.observation_noise_model.get_noisy_traffic_controls(self)

    # --- rendering -----------------------------------------------------------------

    def check_prim_budget(self, waypoint_count: Optional[int] = None,
                          strict: bool = False) -> None:
        """
        Guard the banded-cull prim budget at scenario-construction time,
        where content counts are static: the typed-prim fast path keeps at
        most ``min(max(8, band_budget), 56)`` view-nearest prims PER TYPE
        per camera (`rendering/jax_renderer.py`), so a scene whose
        simultaneously-visible content exceeds that cap would drop prims
        silently mid-rollout. Absent agents contribute degenerate prims
        that the view cull discards first (ref: `mesh.py:1083-1089`), so
        the worst case here is every agent + light + waypoint visible in
        one camera at once.

        Args:
            waypoint_count: rendered waypoints per camera; defaults to one
                per agent when waypoint goals are configured.
            strict: raise ``ValueError`` instead of logging a warning.
        """
        budget = getattr(getattr(self.renderer, 'cfg', None),
                         'band_budget', None)
        if budget is None or self.birdview_mesh_generator is None:
            return
        cap = min(max(8, int(budget)), 56)
        if waypoint_count is None:
            waypoint_count = (self.agent_count
                              if self.waypoint_goals is not None else 0)
        quads, tris = self.birdview_mesh_generator.worst_case_prim_counts(
            waypoint_count)
        if quads <= cap and tris <= cap:
            return
        msg = (
            f"scene content can exceed the renderer's per-camera prim "
            f"budget: worst case {quads} quads / {tris} triangles vs "
            f"band_budget cap {cap} (per type). Frames where more than "
            f"{cap} prims of one type are visible in a single camera will "
            f"drop the farthest ones. Reduce agents/lights/waypoints per "
            f"scene or raise JaxRendererConfig.band_budget (hard max 56).")
        if strict:
            raise ValueError(msg)
        logger.warning(msg)

    def render(self, camera_xy: jnp.ndarray, camera_psi: jnp.ndarray,
               res: Optional[Resolution] = None,
               rendering_mask: Optional[jnp.ndarray] = None,
               fov: Optional[float] = None,
               waypoints: Optional[jnp.ndarray] = None,
               waypoints_rendering_mask: Optional[jnp.ndarray] = None,
               custom_agent_colors: Optional[jnp.ndarray] = None,
               noisy_perception: bool = False) -> jnp.ndarray:
        """
        Bird's-eye-view render from arbitrary cameras
        (ref: `simulator.py:920-992`).

        Returns:
            BxNcxCxHxW float images in [0, 255].
        """
        camera_sc = jnp.concatenate(
            [jnp.sin(camera_psi), jnp.cos(camera_psi)], axis=-1)
        if camera_xy.ndim == 2:
            camera_xy = camera_xy[:, None]
            camera_sc = camera_sc[:, None]
        n_cameras = camera_xy.shape[-2]
        present = self.get_all_agent_present_mask()
        present = jnp.broadcast_to(
            present[:, None], (present.shape[0], n_cameras, present.shape[-1]))
        rendering_mask = present if rendering_mask is None \
            else present & rendering_mask

        generator = self.birdview_mesh_generator
        if noisy_perception:
            generator = self._noisy_mesh_generator()

        light_state = self.state.traffic_control_state.get('traffic_light')
        res_used = res or self.renderer.res
        n_all = self.agent_count + self.npc_count

        # gather-free fast path: face soup + Pallas raster over the baked
        # background (no custom colors / noisy perception support there)
        fast = (hasattr(self.renderer, 'render_prims_chw')
                and getattr(self.renderer, 'background_texture', None) is not None
                and custom_agent_colors is None and not noisy_perception)
        if fast:
            from torchdrivesim_tpu.rendering.base import Cameras
            states_flat = jnp.broadcast_to(
                self.get_all_agent_state()[:, None],
                (self.batch_size, n_cameras, n_all, 4)
            ).reshape(self.batch_size * n_cameras, n_all, 4)
            masks_flat = rendering_mask.reshape(
                self.batch_size * n_cameras, n_all)
            lights_flat = None
            if light_state is not None:
                lights_flat = jnp.broadcast_to(
                    light_state[:, None],
                    (self.batch_size, n_cameras) + light_state.shape[1:]
                ).reshape((self.batch_size * n_cameras,) + light_state.shape[1:])
            wps_flat = waypoints.reshape(self.batch_size * n_cameras,
                                         *waypoints.shape[2:]) \
                if waypoints is not None else None
            wpm_flat = waypoints_rendering_mask.reshape(
                self.batch_size * n_cameras, -1) \
                if waypoints_rendering_mask is not None else None
            quads, qz, qcol, tris, tz, tcol = generator.generate_prims(
                states_flat, present_mask=masks_flat,
                traffic_light_state=lights_flat, waypoints=wps_flat,
                waypoints_rendering_mask=wpm_flat)
            scale = (2.0 / fov) if fov is not None else self.renderer.scale
            image = self.renderer.render_prims_chw(
                quads, qz, qcol, tris, tz, tcol, res_used,
                Cameras(camera_xy.reshape(-1, 2), camera_sc.reshape(-1, 2),
                        scale))
            return image.reshape(self.batch_size, n_cameras, 3,
                                 res_used.height, res_used.width)

        include_background = getattr(self.renderer, 'background_texture', None) is None
        agent_state = jnp.broadcast_to(
            self.get_all_agent_state()[:, None],
            (self.batch_size, n_cameras, n_all, 4))
        rgb_mesh = generator.generate(
            n_cameras, agent_state=agent_state, present_mask=rendering_mask,
            traffic_light_state=light_state, waypoints=waypoints,
            waypoints_rendering_mask=waypoints_rendering_mask,
            custom_agent_colors=custom_agent_colors,
            include_background=include_background)
        image = self.renderer.render_frame(rgb_mesh, camera_xy, camera_sc,
                                           res=res, fov=fov)
        return image.reshape(self.batch_size, n_cameras, 3,
                             res_used.height, res_used.width)

    def _noisy_mesh_generator(self) -> BirdviewRGBMeshGenerator:
        """Rebuild the scene generator with noisy map/controls
        (ref: `simulator.py:951-978`)."""
        generator = self.birdview_mesh_generator.copy()
        noisy_bg = self.get_noisy_background_mesh()
        if isinstance(noisy_bg, BirdviewMesh):
            generator.initialize_background_mesh(noisy_bg)
        noisy_lf = self.get_noisy_lane_features()
        if noisy_lf is not None and noisy_lf.dense_lane_features is not None:
            from torchdrivesim_tpu.mesh import BaseMesh
            from torchdrivesim_tpu.utils import rotate
            markers = noisy_lf.dense_lane_features
            mask = noisy_lf.dense_lane_features_mask
            width = markers[..., 3]
            tri = jnp.stack([
                jnp.stack([jnp.zeros_like(width), -width / 2], axis=-1),
                jnp.stack([jnp.zeros_like(width), width / 2], axis=-1),
                jnp.stack([jnp.ones_like(width), jnp.zeros_like(width)], axis=-1),
            ], axis=-2)
            verts = rotate(tri, markers[..., None, 2:3]) + markers[..., None, :2]
            verts = jnp.where(mask[..., None, None], verts, 0.0)
            n_markers = markers.shape[-2]
            faces = (np.asarray([[0, 1, 2]], dtype=np.int32)
                     + 3 * np.arange(n_markers, dtype=np.int32)[:, None])
            faces = jnp.broadcast_to(jnp.asarray(faces),
                                     verts.shape[:-3] + (n_markers, 3))
            verts = verts.reshape(verts.shape[:-3] + (n_markers * 3, 2))
            from torchdrivesim_tpu.mesh import BirdviewMesh as BVM
            dense = BVM.set_properties(BaseMesh(verts=verts, faces=faces),
                                       category='stop_sign')
            generator.add_static_meshes([dense])
        noisy_controls = self.get_noisy_traffic_controls()
        if noisy_controls is not None:
            generator.initialize_traffic_controls_mesh(noisy_controls)
        return generator

    def render_egocentric(self, ego_rotate: bool = True,
                          res: Optional[Resolution] = None,
                          fov: Optional[float] = None,
                          visibility_matrix: Optional[jnp.ndarray] = None,
                          custom_agent_colors: Optional[jnp.ndarray] = None,
                          n_subsequent_waypoints: int = 1,
                          noisy_perception: bool = False) -> jnp.ndarray:
        """
        One camera per agent (ref: `simulator.py:994-1033`).

        Returns:
            BxAxCxHxW float images.
        """
        camera_xy = self.get_state()[..., :2]
        camera_psi = self.get_state()[..., 2:3]
        waypoints = self.get_waypoints(count=n_subsequent_waypoints)
        waypoints_mask = self.get_waypoints_mask(count=n_subsequent_waypoints) \
            if waypoints is not None else None
        if not ego_rotate:
            camera_psi = jnp.full_like(camera_psi, np.pi / 2)
        rendering_mask = visibility_matrix
        if self.cfg.single_agent_rendering:
            a = self.agent_count
            eye = jnp.eye(a, dtype=bool)
            pad = jnp.ones((a, self.npc_count), dtype=bool)
            rendering_mask = jnp.broadcast_to(
                jnp.concatenate([eye, pad], axis=-1)[None],
                (self.batch_size, a, a + self.npc_count))
        bv = self.render(camera_xy, camera_psi, rendering_mask=rendering_mask,
                         res=res, fov=fov, waypoints=waypoints,
                         waypoints_rendering_mask=waypoints_mask,
                         custom_agent_colors=custom_agent_colors,
                         noisy_perception=noisy_perception)
        return bv

    # --- infractions ----------------------------------------------------------------

    def compute_offroad(self) -> jnp.ndarray:
        """Offroad metric (ref: `simulator.py:1035-1044`); uses the baked
        distance field when available, else the exact mesh distance."""
        if self.map_grids is not None:
            loss = offroad_loss_from_grid(
                self.map_grids, self.get_state(), self.agent_size,
                threshold=self.cfg.offroad_threshold)
        else:
            loss = offroad_infraction_loss(
                self.get_state(), self.agent_size, self.road_mesh,
                threshold=self.cfg.offroad_threshold)
        return loss * self.get_present_mask()

    def compute_wrong_way(self) -> jnp.ndarray:
        """Wrong-way metric (ref: `simulator.py:607-630`); grid-based when
        baked grids are available, else host lanelet queries."""
        if self.map_grids is not None and self.map_grids.direction is not None:
            state = self.get_state()
            if self.recenter_offset is not None:
                state = state.at[..., :2].add(self.recenter_offset[:, None])
            return wrong_way_loss_from_grid(
                self.map_grids, state,
                angle_threshold=self.cfg.wrong_way_angle_threshold
            ) * self.get_present_mask()
        if self.lanelet_map is not None:
            b, a = self.get_state().shape[:2]
            if b * a > 64 and not getattr(self, '_warned_host_wrong_way', False):
                logger.warning(
                    "compute_wrong_way is using the HOST lanelet path, which "
                    "is O(batch x agents) Python (%d x %d here) -- ~1000x "
                    "slower than the baked grid path. Bake direction grids "
                    "(map_grids / MapConfig.grids()) for on-device lookups.",
                    b, a)
                self._warned_host_wrong_way = True
            return lanelet_orientation_loss(
                self.lanelet_map, self.get_state(), self.recenter_offset,
                direction_angle_threshold=self.cfg.wrong_way_angle_threshold,
                lanelet_dist_tolerance=self.cfg.lanelet_inclusion_tolerance,
            ) * self.get_present_mask()
        if not self.warned_no_lanelet:
            logger.debug("No lanelet map provided; wrong_way losses are zero.")
            self.warned_no_lanelet = True
        return jnp.zeros(self.get_state().shape[:2])

    def compute_traffic_lights_violations(self) -> jnp.ndarray:
        """Red-light violations (ref: `simulator.py:1046-1062`)."""
        state = self.get_state()
        controls = self.traffic_controls or {}
        if 'traffic_light' in controls:
            control = controls['traffic_light']
            boxes = jnp.concatenate(
                [state[..., :2], self.agent_size[..., :2], state[..., 2:3]],
                axis=-1)
            from torchdrivesim_tpu.traffic_controls import red_light_violations
            v = red_light_violations(
                boxes, control.corners,
                self.state.traffic_control_state['traffic_light'],
                red_index=control.allowed_states.index('red'))
            return v & self.get_present_mask()
        return jnp.zeros(state.shape[:2], dtype=bool)

    def compute_collision(self, agent_types: Optional[List[str]] = None
                          ) -> jnp.ndarray:
        """
        Per-agent collision metric (ref: `simulator.py:1161-1194`), computed
        as one batched matrix op instead of the reference's per-agent loop.
        """
        metric = self.cfg.collision_metric
        states = self.get_state()
        sizes = self.agent_size
        if metric in (CollisionMetric.nograd, CollisionMetric.nograd_pytorch3d):
            assert agent_types is None, \
                'agent_types unsupported by the selected collision metric'
            boxes = jnp.concatenate(
                [states[..., :2], sizes, states[..., 2:3]], axis=-1)
            if metric == CollisionMetric.nograd:
                return compute_agent_collisions_metric(
                    boxes, self.get_present_mask(), self.get_present_mask())
            return compute_agent_collisions_metric_pytorch3d(
                boxes, self.get_present_mask())
        all_states = self.get_all_agent_state()
        all_sizes = self.get_all_agent_size()
        mask = self.get_all_agent_present_mask()
        if agent_types is not None:
            allowed = jnp.asarray([self._agent_types.index(t)
                                   for t in agent_types if t in self._agent_types])
            mask = mask & jnp.isin(self.get_all_agent_type(), allowed)
        all_boxes = jnp.concatenate(
            [all_states[..., :2], all_sizes, all_states[..., 2:3]], axis=-1)
        collisions = compute_collision_matrix(
            all_boxes, mask, metric=metric.value)
        return collisions[..., :self.agent_count]


def _relative_views(abs_pos: jnp.ndarray, agent_count: int, npc_count: int,
                    exclude_self: bool) -> jnp.ndarray:
    """Relative-frame agent views (math of `simulator.py:756-782`)."""
    xy = abs_pos[..., :agent_count, :2]
    psi = abs_pos[..., :agent_count, 2:3]
    all_xy = abs_pos[..., :2]
    all_psi = abs_pos[..., 2:3]
    rel_xy, rel_psi = relative(origin_xy=xy[..., :, None, :],
                               origin_psi=psi[..., :, None, :],
                               target_xy=all_xy[..., None, :, :],
                               target_psi=all_psi[..., None, :, :])
    rel_state = jnp.concatenate([rel_xy, rel_psi], axis=-1)
    info = jnp.broadcast_to(abs_pos[..., None, :, 3:],
                            rel_state.shape[:-1] + (abs_pos.shape[-1] - 3,))
    rel = jnp.concatenate([rel_state, info], axis=-1)
    if exclude_self:
        rel = _drop_self(rel, agent_count)
    return rel


def _drop_self(rel: jnp.ndarray, agent_count: int) -> jnp.ndarray:
    """Remove each agent's own entry from its relative view
    (ref: `simulator.py:767-782`)."""
    if agent_count == 1:
        return rel[..., 1:, :]
    total = rel.shape[-2]
    keep = ~np.eye(agent_count, total, dtype=bool)
    out = []
    for i in range(agent_count):
        out.append(rel[..., i, keep[i], :])
    return jnp.stack(out, axis=-3)
