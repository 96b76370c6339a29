"""
Per-map baked grids: distance-to-road and lane-direction fields.

This is the TPU-native answer to the reference's two per-step geometric
queries (SURVEY.md §2.3):

* offroad distance, computed there against the full road mesh every step
  (`infractions.py:176-229`), becomes a bilinear sample of a baked distance
  field -- differentiable, O(1) per agent corner;
* wrong-way direction, computed there with a per-agent Python loop into the
  lanelet2 C++ library (`infractions.py:263-295`), becomes a gather from a
  K-layer direction grid holding up to K candidate lane directions per cell
  (multiple layers cover overlapping lanelets at intersections; the loss
  takes the min over candidates like `infractions.py:282-288`).

Baking runs once per map (accelerated via the exact point-to-triangle op)
and is cached to ``<map>_tpu_grids.npz``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchdrivesim_tpu.ops.grids import (
    Grid2D, RowPackedGrid, bilinear_sample, bilinear_sample_quad,
    bilinear_sample_quad_rows, nearest_sample, nearest_sample_rows,
    pack_bilinear_quad, pack_rows)

if TYPE_CHECKING:
    from torchdrivesim_tpu.map import MapConfig

DIRECTION_LAYERS = 4


#: sentinel byte marking an empty direction layer in the packed grid
DIRECTION_INVALID = 255


@struct.dataclass
class MapGrids:
    """Baked fields for one map (batchable by stacking as PyTree leaves)."""
    distance: Grid2D              #: (H, W, 1) distance to road surface, meters
    direction: Optional[Grid2D]   #: (H, W, 1) int32: 4 packed 8-bit angles
        # (byte k = layer k; 0..254 quantize [-pi, pi); 255 = invalid) --
        # one gather per wrong-way query instead of a 12-float slice
    #: (H, W, 2) int32 bilinear-quad repack of ``distance`` (bf16 corners):
    #: ONE gather per offroad query instead of four (see pack_bilinear_quad)
    distance_quad: Optional[Grid2D] = None
    #: row-major repacks served by XLA row gathers (~3.6x cheaper than the
    #: scattered 2D gathers at benchmark query counts; see RowPackedGrid)
    distance_rows: Optional[RowPackedGrid] = None
    direction_rows: Optional[RowPackedGrid] = None

    def with_quad(self) -> "MapGrids":
        out = self
        if out.distance_quad is None:
            out = out.replace(distance_quad=pack_bilinear_quad(out.distance))
        if out.distance_rows is None:
            out = out.replace(distance_rows=pack_rows(out.distance_quad))
        if out.direction_rows is None and out.direction is not None:
            out = out.replace(direction_rows=pack_rows(out.direction))
        return out

    def save(self, path: str):
        arrays = {
            'distance': np.asarray(self.distance.data, dtype=np.float16),
            'distance_origin': np.asarray(self.distance.origin, dtype=np.float64),
            'distance_cell': np.asarray(self.distance.cell_size),
        }
        if self.direction is not None:
            arrays.update({
                'direction': np.asarray(self.direction.data, dtype=np.int32),
                'direction_origin': np.asarray(self.direction.origin, dtype=np.float64),
                'direction_cell': np.asarray(self.direction.cell_size),
            })
        np.savez_compressed(path, **arrays)


def load_map_grids(path: str) -> MapGrids:
    with np.load(path) as data:
        distance = Grid2D(
            data=data['distance'].astype(np.float32),
            origin=data['distance_origin'].astype(np.float32),
            cell_size=float(data['distance_cell']))
        direction = None
        if 'direction' in data:
            direction = Grid2D(
                data=data['direction'].astype(np.int32),
                origin=data['direction_origin'].astype(np.float32),
                cell_size=float(data['direction_cell']))
    return MapGrids(distance=distance, direction=direction).with_quad()


# ----------------------------------------------------------------------------
# Sampling (hot path, jittable, differentiable where it matters)
# ----------------------------------------------------------------------------

def sample_offroad_distance(grids: MapGrids, points: jnp.ndarray) -> jnp.ndarray:
    """
    Distance (meters) from world points to the road surface; differentiable
    through bilinear interpolation. Out-of-bounds points read as far away.

    Args:
        points: (..., 2).
    Returns:
        (...) distances.
    """
    if grids.distance_rows is not None:
        return bilinear_sample_quad_rows(grids.distance_rows, points,
                                         fill_value=100.0)
    if grids.distance_quad is not None:
        return bilinear_sample_quad(grids.distance_quad, points,
                                    fill_value=100.0)
    return bilinear_sample(grids.distance, points, fill_value=100.0)[..., 0]


def sample_lane_directions(grids: MapGrids, points: jnp.ndarray):
    """
    Candidate lane directions at world points: ONE int32 gather per point,
    unpacked to K quantized angles (1.4-degree resolution, far below the
    pi/2 wrong-way threshold).

    Returns:
        (cos (..., K), sin (..., K), valid (..., K) bool); all-invalid when
        the map has no direction grid.
    """
    if grids.direction is None:
        shape = points.shape[:-1] + (DIRECTION_LAYERS,)
        z = jnp.zeros(shape)
        return z, z, jnp.zeros(shape, dtype=bool)
    all_invalid = jnp.asarray(np.uint32(
        sum(DIRECTION_INVALID << (8 * k) for k in range(DIRECTION_LAYERS))
    ).astype(np.int32))
    if grids.direction_rows is not None:
        packed = nearest_sample_rows(grids.direction_rows, points,
                                     fill_value=all_invalid)
    else:
        packed = nearest_sample(grids.direction, points,
                                fill_value=all_invalid)[..., 0]
    shifts = jnp.asarray([8 * k for k in range(DIRECTION_LAYERS)],
                         dtype=jnp.int32)
    q = (packed[..., None] >> shifts) & 0xFF
    valid = q != DIRECTION_INVALID
    angle = q.astype(jnp.float32) / 254.0 * (2 * jnp.pi) - jnp.pi
    return jnp.cos(angle), jnp.sin(angle), valid


def wrong_way_loss_from_grid(grids: MapGrids, agent_states: jnp.ndarray,
                             angle_threshold: float = math.pi / 2) -> jnp.ndarray:
    """
    Wrong-way loss per agent (semantics of `infractions.py:232-304`):
    ``-cos(delta)`` against the best-matching candidate lane direction, zero
    when within ``angle_threshold`` or when no lanelet contains the agent.

    Args:
        agent_states: (..., >=3) with (x, y, psi, ...).
    Returns:
        (...) losses in [0, 1].
    """
    cos_l, sin_l, valid = sample_lane_directions(grids, agent_states[..., :2])
    psi = agent_states[..., 2:3]
    # cos(delta) = cos(dir - psi)
    cos_delta = cos_l * jnp.cos(psi) + sin_l * jnp.sin(psi)
    cos_delta = jnp.clip(cos_delta, -1.0, 1.0)
    delta = jnp.arccos(cos_delta)  # |delta| in [0, pi]
    loss = -cos_delta * (delta > angle_threshold)
    loss = jnp.where(valid, loss, jnp.inf)
    best = jnp.min(loss, axis=-1)
    return jnp.where(jnp.isfinite(best), best, 0.0)


def offroad_loss_from_grid(grids: MapGrids, agent_states: jnp.ndarray,
                           lenwid: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """
    Offroad loss per agent (semantics of `infractions.py:176-229`): sum over
    the 4 box corners of the thresholded squared distance to the road.

    Args:
        agent_states: (..., A, >=3); lenwid: (..., A, 2).
    Returns:
        (..., A) losses.
    """
    from torchdrivesim_tpu.ops.box import box2corners
    boxes = jnp.concatenate([
        agent_states[..., :2], lenwid, agent_states[..., 2:3]], axis=-1)
    corners = box2corners(boxes)                    # (..., A, 4, 2)
    d = sample_offroad_distance(grids, corners)     # (..., A, 4)
    d2 = d * d
    d2 = jnp.where(d2 > threshold, d2, 0.0)
    return jnp.sum(d2, axis=-1)


# ----------------------------------------------------------------------------
# Baking (offline)
# ----------------------------------------------------------------------------

def bake_map_grids(cfg: "MapConfig", cell_size: float = 0.4,
                   margin: float = 15.0,
                   tolerance: float = 1.0) -> Optional[MapGrids]:
    """
    Bake both fields for a map. The distance field needs the road mesh; the
    direction field additionally needs the Lanelet2 map (skipped if absent).
    """
    mesh = cfg.road_mesh
    if mesh is None:
        return None
    # distance to the driving surface: use road-category faces when tagged
    try:
        road = mesh.separate_by_category().get('road', mesh) \
            if hasattr(mesh, 'separate_by_category') else mesh
    except Exception:
        road = mesh
    verts = np.asarray(road.verts)[0]
    faces = np.asarray(road.faces)[0]
    distance = _bake_distance(verts, faces, cell_size, margin)

    direction = None
    lanelet_map = cfg.lanelet_map
    if lanelet_map is not None:
        direction = _bake_direction(lanelet_map, distance, cell_size, tolerance)
    return MapGrids(distance=distance, direction=direction).with_quad()


def _bake_distance(verts: np.ndarray, faces: np.ndarray, cell_size: float,
                   margin: float) -> Grid2D:
    from torchdrivesim_tpu.ops.grids import bake_distance_field
    return bake_distance_field(verts, faces, cell_size=cell_size, margin=margin)


def _bake_direction(lanelet_map, distance: Grid2D, cell_size: float,
                    tolerance: float) -> Grid2D:
    """
    Rasterize each lanelet's footprint (dilated by ``tolerance``) and write
    its centerline direction into the first free layer of every covered cell.
    Vectorized per lanelet on the host.
    """
    origin = np.asarray(distance.origin, dtype=np.float64)
    h, w = distance.data.shape[0], distance.data.shape[1]
    k = DIRECTION_LAYERS

    # C++ fast path (same semantics, validated cell-for-cell in tests);
    # the numpy loop below is the always-available fallback
    from torchdrivesim_tpu.native import bake_direction_native
    packed_native = bake_direction_native(lanelet_map, origin, cell_size,
                                          h, w, tolerance, k)
    if packed_native is not None:
        return Grid2D(data=packed_native[..., None],
                      origin=np.asarray(origin, dtype=np.float32),
                      cell_size=float(cell_size))

    cos_arr = np.zeros((h, w, k), dtype=np.float32)
    sin_arr = np.zeros((h, w, k), dtype=np.float32)
    valid = np.zeros((h, w, k), dtype=np.float32)
    count = np.zeros((h, w), dtype=np.int32)

    for ll in lanelet_map.laneletLayer:
        poly = ll.polygon()
        lo = np.floor((poly.min(axis=0) - origin - tolerance) / cell_size).astype(int)
        hi = np.ceil((poly.max(axis=0) - origin + tolerance) / cell_size).astype(int) + 1
        x0, y0 = max(lo[0], 0), max(lo[1], 0)
        x1, y1 = min(hi[0], w), min(hi[1], h)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = origin[0] + np.arange(x0, x1) * cell_size
        ys = origin[1] + np.arange(y0, y1) * cell_size
        gx, gy = np.meshgrid(xs, ys)
        cells = np.stack([gx, gy], axis=-1).reshape(-1, 2)

        covered = _points_near_polygon(cells, poly, tolerance)
        if not covered.any():
            continue
        pts = cells[covered]
        dirs = _polyline_directions_at(ll.centerline.coords(), pts)

        iy, ix = np.nonzero(covered.reshape(y1 - y0, x1 - x0))
        iy = iy + y0
        ix = ix + x0
        slot = count[iy, ix]
        ok = slot < k
        iy, ix, slot, dirs = iy[ok], ix[ok], slot[ok], dirs[ok]
        cos_arr[iy, ix, slot] = np.cos(dirs)
        sin_arr[iy, ix, slot] = np.sin(dirs)
        valid[iy, ix, slot] = 1.0
        count[iy, ix] += 1

    # pack the K layers into one int32 per cell (byte k = layer k)
    angles = np.arctan2(sin_arr, cos_arr)
    q = np.round((angles + np.pi) / (2 * np.pi) * 254.0).astype(np.int64)
    q = np.clip(q, 0, 254)
    q = np.where(valid > 0.5, q, DIRECTION_INVALID)
    packed = np.zeros(q.shape[:2], dtype=np.int64)
    for layer in range(k):
        packed |= q[..., layer] << (8 * layer)
    data = packed.astype(np.int32)[..., None]
    return Grid2D(data=data,
                  origin=np.asarray(origin, dtype=np.float32),
                  cell_size=float(cell_size))


def _points_near_polygon(points: np.ndarray, poly: np.ndarray,
                         tolerance: float, chunk: int = 2048) -> np.ndarray:
    """Vectorized: inside the polygon (even-odd) or within tolerance of it.

    Points are processed in chunks: the unchunked (points x edges) float64
    temporaries on a long rural lanelet (60k bbox cells x 800 boundary
    verts) reached several GB and thrashed memory -- one such lanelet cost
    429 s of the Town07 bake; chunked it is ~2 s."""
    if len(points) > chunk:
        return np.concatenate([
            _points_near_polygon(points[s:s + chunk], poly, tolerance, chunk)
            for s in range(0, len(points), chunk)])
    points = np.asarray(points, np.float64)
    x = points[:, 0][:, None]
    y = points[:, 1][:, None]
    x1 = poly[:, 0][None]
    y1 = poly[:, 1][None]
    x2 = np.roll(poly[:, 0], -1)[None]
    y2 = np.roll(poly[:, 1], -1)[None]
    # even-odd crossing test
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide='ignore', invalid='ignore'):
        x_cross = (x2 - x1) * (y - y1) / (y2 - y1) + x1
    crossings = np.sum(cond & (x < x_cross), axis=1)
    inside = crossings % 2 == 1
    # distance to boundary segments
    a = np.stack([x1, y1], axis=-1)
    b = np.stack([x2, y2], axis=-1)
    ab = b - a
    l2 = np.sum(ab * ab, axis=-1)
    p = points[:, None, :]
    t = np.clip(np.sum((p - a) * ab, axis=-1) / np.maximum(l2, 1e-12), 0, 1)
    proj = a + t[..., None] * ab
    d = np.min(np.linalg.norm(p - proj, axis=-1), axis=1)
    return inside | (d <= tolerance)


def _polyline_directions_at(polyline: np.ndarray, points: np.ndarray,
                            chunk: int = 2048) -> np.ndarray:
    """Direction of the polyline segment nearest to each query point.
    Chunked over points for the same memory reason as
    :func:`_points_near_polygon`."""
    if len(points) > chunk:
        return np.concatenate([
            _polyline_directions_at(polyline, points[s:s + chunk], chunk)
            for s in range(0, len(points), chunk)])
    a = polyline[:-1][None]
    b = polyline[1:][None]
    ab = b - a
    l2 = np.sum(ab * ab, axis=-1)
    p = points[:, None, :]
    t = np.clip(np.sum((p - a) * ab, axis=-1) / np.maximum(l2, 1e-12), 0, 1)
    proj = a + t[..., None] * ab
    seg = np.argmin(np.linalg.norm(p - proj, axis=-1), axis=1)
    d = polyline[seg + 1] - polyline[seg]
    return np.arctan2(d[:, 1], d[:, 0])
