"""
Map registry: metadata, lazy asset loading, and per-map baked grids.

Mirrors the reference's map metadata model (`torchdrivesim/map.py`): each map
folder carries ``metadata.json`` (a :class:`MapConfig`), a Lanelet2 ``.osm``,
a serialized birdview mesh, stoplines, and a traffic-light controller
definition (format documented in SURVEY.md §2.4). Maps are looked up by name
through ``TDS_RESOURCE_PATH`` plus the bundled ``resources/maps``.

TPU-native addition: :meth:`MapConfig.grids` bakes (and caches on disk) the
distance field and lane-direction field that replace runtime mesh-distance
and lanelet queries in the hot path (SURVEY.md §2.3).
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from functools import cached_property
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import torchdrivesim_tpu
from torchdrivesim_tpu.mesh import BirdviewMesh
from torchdrivesim_tpu.traffic_controls import (
    BaseTrafficControl, StopSignControl, TrafficLightControl, YieldControl,
)
from torchdrivesim_tpu.traffic_lights import TrafficLightController
from torchdrivesim_tpu.utils import normalize_angle


@dataclass
class Stopline:
    """One stopline entry from ``*_stoplines.json`` (ref: `map.py:20-35`)."""
    actor_id: int
    agent_type: str
    x: float
    y: float
    length: float
    width: float
    orientation: float

    def __post_init__(self):
        aliases = {'traffic-light': 'traffic_light', 'stop-sign': 'stop_sign',
                   'yield-sign': 'yield_sign', 'yield': 'yield_sign'}
        self.agent_type = aliases.get(self.agent_type, self.agent_type)


@dataclass
class MapConfig:
    """Map metadata; file paths may be relative to the map folder."""
    name: str
    left_handed_coordinates: bool = False
    center: Optional[Tuple[float, float]] = None

    lanelet_path: Optional[str] = None
    lanelet_map_origin: Tuple[float, float] = (0, 0)
    mesh_path: Optional[str] = None
    stoplines_path: Optional[str] = None
    traffic_light_controller_path: Optional[str] = None

    iai_location_name: Optional[str] = None
    note: Optional[str] = None

    @property
    def lanelet_map(self):
        """Parsed Lanelet2 map (pure-Python OSM parser), or None."""
        if self.lanelet_path is None or not os.path.exists(self.lanelet_path):
            return None
        from torchdrivesim_tpu.lanelet2 import load_lanelet_map
        return load_lanelet_map(self.lanelet_path, origin=self.lanelet_map_origin)

    @cached_property
    def road_mesh(self) -> Optional[BirdviewMesh]:
        """
        The drivable-surface mesh: loaded from the serialized mesh when
        available, otherwise triangulated from the Lanelet2 map
        (ref: `map.py:62-75`).
        """
        if self.mesh_path is not None and os.path.exists(self.mesh_path):
            return BirdviewMesh.load(self.mesh_path)
        lanelet_map = self.lanelet_map
        if lanelet_map is None:
            return None
        from torchdrivesim_tpu.lanelet2 import (
            lanelet_map_to_lane_mesh, road_mesh_from_lanelet_map)
        road = BirdviewMesh.set_properties(
            road_mesh_from_lanelet_map(lanelet_map), category='road')
        lanes = lanelet_map_to_lane_mesh(lanelet_map, left_handed=False)
        return lanes.merge(road)

    @property
    def stoplines(self) -> List[Stopline]:
        if self.stoplines_path is None or not os.path.exists(self.stoplines_path):
            return []
        with open(self.stoplines_path, 'r') as f:
            return [Stopline(**d) for d in json.load(f)]

    @property
    def traffic_light_controller(self) -> Optional[TrafficLightController]:
        if self.traffic_light_controller_path is None or \
                not os.path.exists(self.traffic_light_controller_path):
            return None
        return TrafficLightController.from_json(self.traffic_light_controller_path)

    # --- TPU-native baked grids ----------------------------------------------

    def grids_cache_path(self) -> Optional[str]:
        base = self.mesh_path or self.lanelet_path
        if base is None:
            return None
        return os.path.join(os.path.dirname(base), f'{self.name}_tpu_grids_v2.npz')

    def grids(self, cell_size: float = 0.4, bake_if_missing: bool = True):
        """
        Load (or bake and cache) this map's :class:`MapGrids`: the
        distance-to-road field used for offroad and the lane-direction field
        used for wrong-way (replaces per-step lanelet queries,
        `infractions.py:263-295`).
        """
        from torchdrivesim_tpu.map_grids import MapGrids, bake_map_grids, load_map_grids
        cache = self.grids_cache_path()
        if cache and os.path.exists(cache):
            return load_map_grids(cache)
        if not bake_if_missing:
            return None
        grids = bake_map_grids(self, cell_size=cell_size)
        if grids is not None and cache:
            try:
                grids.save(cache)
            except OSError:
                pass
        return grids


_PATH_FIELDS = ('lanelet_path', 'mesh_path', 'stoplines_path',
                'traffic_light_controller_path')


def _filename_defaults(name: str) -> Dict[str, str]:
    return dict(
        lanelet_path=f'{name}.osm',
        mesh_path=f'{name}_mesh.json',
        stoplines_path=f'{name}_stoplines.json',
        traffic_light_controller_path=f'{name}_traffic_light_controller.json',
    )


def resolve_paths_to_absolute(cfg: MapConfig, root: str) -> MapConfig:
    """Resolve relative asset paths against the map folder (ref: `map.py:101`)."""
    resolved = {}
    for field, default in _filename_defaults(cfg.name).items():
        existing = getattr(cfg, field) or default
        if os.path.isabs(existing):
            continue
        candidate = os.path.join(root, existing)
        if os.path.exists(candidate):
            resolved[field] = candidate
    return dataclasses.replace(cfg, **resolved)


def load_map_config(json_path: str, resolve_paths: bool = True) -> MapConfig:
    with open(json_path, 'r') as f:
        cfg = MapConfig(**json.load(f))
    if resolve_paths:
        cfg = resolve_paths_to_absolute(cfg, os.path.dirname(json_path))
    return cfg


def store_map_config(cfg: MapConfig, json_path: str,
                     store_absolute_paths: bool = False) -> None:
    if not store_absolute_paths:
        cfg = dataclasses.replace(cfg, **{
            f: os.path.basename(getattr(cfg, f)) if getattr(cfg, f) else None
            for f in _PATH_FIELDS
        })
    with open(json_path, 'w') as f:
        json.dump(dataclasses.asdict(cfg), f, indent=4)


def find_map_config(map_name: str, resolve_paths: bool = True) -> Optional[MapConfig]:
    """
    Locate a map by name across ``TDS_RESOURCE_PATH`` directories and the
    bundled resources (ref: `map.py:134-157`). Map names must be unique.
    """
    for root in torchdrivesim_tpu._resource_path:
        map_path = os.path.join(root, map_name)
        if os.path.exists(map_path):
            break
    else:
        return None
    metadata_path = os.path.join(map_path, 'metadata.json')
    if os.path.exists(metadata_path):
        cfg = load_map_config(metadata_path)
    else:
        cfg = MapConfig(name=map_name)
    if resolve_paths:
        cfg = resolve_paths_to_absolute(cfg, root=map_path)
    return cfg


def list_available_maps() -> List[str]:
    """Names of all maps visible through the resource path."""
    names = []
    for root in torchdrivesim_tpu._resource_path:
        if os.path.isdir(root):
            names += [d for d in sorted(os.listdir(root))
                      if os.path.isdir(os.path.join(root, d))]
    return sorted(set(names))


def download_iai_map(location_name: str, save_path: str) -> None:
    """
    Fetch map data through the Inverted AI API and store it in this package's
    on-disk format (ref: `map.py:160-200`). Requires the optional
    ``invertedai`` client and IAI_API_KEY.
    """
    try:
        from invertedai import location_info
    except ImportError as e:
        raise ImportError("download_iai_map requires the invertedai package") from e
    info = location_info(location_name, include_map_source=True)
    os.makedirs(save_path, exist_ok=True)
    map_name = os.path.basename(save_path)
    defaults = _filename_defaults(map_name)
    lanelet_path = os.path.join(save_path, defaults['lanelet_path'])
    info.osm_map.save_osm_file(lanelet_path)
    stoplines_path = os.path.join(save_path, defaults['stoplines_path'])
    stoplines = [dataclasses.asdict(Stopline(
        actor_id=sa.actor_id, agent_type=sa.agent_type, x=sa.center.x,
        y=sa.center.y, length=sa.length, width=sa.width,
        orientation=sa.orientation)) for sa in info.static_actors]
    with open(stoplines_path, 'w') as f:
        json.dump(stoplines, f, indent=4)
    cfg = MapConfig(
        name=map_name, center=(info.map_center.x, info.map_center.y),
        lanelet_map_origin=(info.osm_map.origin.x, info.osm_map.origin.y),
        iai_location_name=location_name,
        left_handed_coordinates=location_name.split(':')[0] == 'carla',
        lanelet_path=os.path.abspath(lanelet_path),
        stoplines_path=os.path.abspath(stoplines_path),
    )
    mesh_path = os.path.join(save_path, defaults['mesh_path'])
    cfg.road_mesh.save(mesh_path)
    cfg.mesh_path = os.path.abspath(mesh_path)
    store_map_config(cfg, os.path.join(save_path, 'metadata.json'))


def traffic_controls_from_map_config(cfg: MapConfig) -> Dict[str, BaseTrafficControl]:
    """Build traffic-control objects from stoplines (ref: `map.py:203-229`)."""
    by_type: Dict[str, list] = {'traffic_light': [], 'stop_sign': [], 'yield_sign': []}
    ids_by_type: Dict[str, list] = {k: [] for k in by_type}
    for sl in cfg.stoplines:
        if sl.agent_type not in by_type:
            continue
        by_type[sl.agent_type].append([sl.x, sl.y, sl.length, sl.width, sl.orientation])
        ids_by_type[sl.agent_type].append(sl.actor_id)
    classes = {'traffic_light': TrafficLightControl, 'stop_sign': StopSignControl,
               'yield_sign': YieldControl}
    controls = {}
    for kind, rows in by_type.items():
        if rows:
            control = classes[kind](np.asarray(rows, dtype=np.float32)[None])
            control.actor_ids = ids_by_type[kind]
            controls[kind] = control
    return controls


def find_wrong_way_stoplines(map_cfg: MapConfig,
                             angle_threshold: float = np.pi / 6) -> List[int]:
    """
    Map QA: stoplines oriented against their lanelet's direction
    (ref: `map.py:232-242`).
    """
    lanelet_map = map_cfg.lanelet_map
    if lanelet_map is None:
        return []
    from torchdrivesim_tpu.lanelet2 import find_lanelet_directions
    wrong = []
    for sl in map_cfg.stoplines:
        directions = find_lanelet_directions(lanelet_map, sl.x, sl.y,
                                             lanelet_dist_tolerance=0)
        if directions and not any(
                abs(normalize_angle(psi - sl.orientation)) < angle_threshold
                for psi in directions):
            wrong.append(sl.actor_id)
    return wrong
