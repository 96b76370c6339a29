"""
Per-ego noisy observations of the world.

Mirrors the reference's observation-noise hierarchy
(`torchdrivesim/observation_noise.py`): the base model broadcasts exact
world state to each ego's viewpoint (BxAx(A+Npc)x...); StandardSensing adds
distance-tiered Gaussian position noise and occlusion culling via
segment-circle tests; MapObservationNoiseFromLog replays logged noisy
map/lane/controls by timestep.

Randomness is explicit: pass a ``jax.random`` key to the noisy model (or let
it maintain a split-per-call key for facade convenience).
"""
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torchdrivesim_tpu.utils import (
    line_circle_intersection, line_circle_intersection_xy)


@dataclass
class ObservationNoiseConfig:
    _type_: str = 'base'


@dataclass
class StandardSensingObservationNoiseConfig:
    _type_: str = 'standard_sensing'


@dataclass
class MapObservationNoiseFromLogConfig:
    _type_: str = 'map_observation_noise_from_log'


class ObservationNoise:
    """Exact broadcast views, no noise (ref: `observation_noise.py:32-66`)."""
    def __init__(self, cfg: ObservationNoiseConfig, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _next_key(self):
        self.rng, key = jax.random.split(self.rng)
        return key

    def get_noisy_state(self, simulator):
        a = simulator.agent_count
        return jnp.concatenate([
            jnp.broadcast_to(simulator.get_state()[:, None],
                             (simulator.batch_size, a, a, 4)),
            jnp.broadcast_to(simulator.get_npc_state()[:, None],
                             (simulator.batch_size, a, simulator.npc_count, 4)),
        ], axis=-2)

    def get_noisy_present_mask(self, simulator):
        a = simulator.agent_count
        return jnp.concatenate([
            jnp.broadcast_to(simulator.get_present_mask()[:, None],
                             (simulator.batch_size, a, a)),
            jnp.broadcast_to(simulator.get_npc_present_mask()[:, None],
                             (simulator.batch_size, a, simulator.npc_count)),
        ], axis=-1)

    def get_noisy_agent_size(self, simulator):
        a = simulator.agent_count
        return jnp.concatenate([
            jnp.broadcast_to(simulator.get_agent_size()[:, None],
                             (simulator.batch_size, a, a, 2)),
            jnp.broadcast_to(simulator.get_npc_size()[:, None],
                             (simulator.batch_size, a, simulator.npc_count, 2)),
        ], axis=-2)

    def get_noisy_lane_features(self, simulator):
        return simulator.lane_features

    def get_noisy_background_mesh(self, simulator):
        return simulator.birdview_mesh_generator.background_mesh

    def get_noisy_traffic_controls(self, simulator):
        return simulator.traffic_controls

    def get_noisy_road_mesh(self, simulator):
        return simulator.road_mesh


class StandardSensingObservationNoise(ObservationNoise):
    """
    Distance-tiered Gaussian position noise + occlusion culling
    (ref: `observation_noise.py:69-132`).
    """
    def __init__(self, cfg: StandardSensingObservationNoiseConfig,
                 rng: Optional[jax.Array] = None):
        super().__init__(cfg, rng)

    def get_noisy_state(self, simulator, key: Optional[jax.Array] = None):
        if key is None:
            key = self._next_key()
        exposed = simulator.get_state()
        all_states = super().get_noisy_state(simulator)
        dist = jnp.linalg.norm(
            exposed[..., None, :2] - all_states[..., :2], axis=-1)
        deviation = jnp.max(jnp.stack([
            0.19 * (dist > 0.5), 1.6 * (dist > 25),
            3.2 * (dist > 50), 3.83 * (dist > 100),
        ], axis=-1), axis=-1, keepdims=True)
        noise = jax.random.normal(key, all_states.shape, all_states.dtype)
        return all_states + noise * deviation

    def get_noisy_present_mask(self, simulator):
        base_mask = super().get_noisy_present_mask(simulator)
        states = super().get_noisy_state(simulator)       # B,A,E,4
        sizes = super().get_noisy_agent_size(simulator)   # B,A,E,2
        b, a, e = base_mask.shape
        idx = jnp.arange(a)
        ego_pos = states[:, idx, idx, :2]                 # B,A,2
        # x/y component planes so the (B, A, E, E) pair grid never carries a
        # trailing size-2 dim (64x vreg-lane padding); identical math
        ego_x = ego_pos[..., 0][:, :, None, None]         # B,A,1,1
        ego_y = ego_pos[..., 1][:, :, None, None]
        tgt_x = states[..., 0][:, :, :, None]             # B,A,E,1
        tgt_y = states[..., 1][:, :, :, None]
        occ_x = states[..., 0][:, :, None, :]             # B,A,1,E
        occ_y = states[..., 1][:, :, None, :]
        radius = sizes[..., 1][:, :, None, :] / 2         # B,A,1,E
        occluding = line_circle_intersection_xy(
            ego_x, ego_y, tgt_x, tgt_y, occ_x, occ_y, radius)
        # entities don't occlude themselves (ref: `observation_noise.py:118`)
        eye = jnp.eye(e, dtype=bool)[None, None]
        occluding = occluding & ~eye
        # the ego never acts as an occluder in its own view: the ray from the
        # ego starts inside its own circle (ref: `observation_noise.py:121-124`)
        ego_as_occluder = (jnp.arange(e)[None, :] == idx[:, None])[None, :, None, :]
        occluding = occluding & ~ego_as_occluder
        occluded = jnp.any(occluding, axis=-1)
        return base_mask & ~occluded


class MapObservationNoiseFromLog(ObservationNoise):
    """Replay logged noisy map observations by timestep
    (ref: `observation_noise.py:135-178`)."""
    def __init__(self, cfg, noisy_lane_features: Optional[List] = None,
                 noisy_background_mesh: Optional[List] = None,
                 noisy_traffic_controls: Optional[List[Dict]] = None,
                 noisy_crosswalk_features: Optional[List[Tuple]] = None):
        super().__init__(cfg)
        self.noisy_lane_features = noisy_lane_features
        self.noisy_background_mesh = noisy_background_mesh
        self.noisy_traffic_controls = noisy_traffic_controls
        self.noisy_crosswalk_features = noisy_crosswalk_features

    def _pick(self, log, simulator, default):
        t = simulator.internal_time
        if log is not None and t < len(log):
            return log[t]
        return default

    def get_noisy_lane_features(self, simulator):
        return self._pick(self.noisy_lane_features, simulator,
                          simulator.lane_features)

    def get_noisy_background_mesh(self, simulator):
        mesh = self._pick(self.noisy_background_mesh, simulator, None)
        if mesh is None:
            return simulator.birdview_mesh_generator.background_mesh
        if not hasattr(mesh, 'categories'):
            return mesh
        # Fill missing per-category colors/z-levels from the generator's
        # defaults (ref: `observation_noise.py:156-157`), keeping the
        # BirdviewMesh type so the simulator's noisy-render path can rebuild
        # its scene generator from it.
        import dataclasses
        from torchdrivesim_tpu.mesh import tensor_color
        gen = simulator.birdview_mesh_generator
        colors = dict(mesh.colors)
        zs = dict(mesh.zs)
        for k in mesh.categories:
            if k not in colors:
                colors[k] = tensor_color(gen.color_map[k])
            if k not in zs:
                zs[k] = gen.rendering_levels[k]
        return dataclasses.replace(mesh, colors=colors, zs=zs)

    def get_noisy_road_mesh(self, simulator):
        return self._pick(self.noisy_background_mesh, simulator,
                          simulator.road_mesh)

    def get_noisy_traffic_controls(self, simulator):
        return self._pick(self.noisy_traffic_controls, simulator,
                          simulator.traffic_controls)

    def get_noisy_crosswalk_features(self, simulator):
        return self._pick(self.noisy_crosswalk_features, simulator, None)


def observation_noise_from_config(cfg) -> ObservationNoise:
    """Factory keyed on the config's ``_type_`` field."""
    kind = getattr(cfg, '_type_', 'base')
    if kind == 'standard_sensing':
        return StandardSensingObservationNoise(cfg)
    if kind == 'map_observation_noise_from_log':
        return MapObservationNoiseFromLog(cfg)
    return ObservationNoise(cfg)
