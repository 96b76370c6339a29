"""
Infraction metrics: offroad, wrong-way, collisions, traffic-light violations.

Composes the batched ops (`ops/`, `map_grids`) into the metric functions the
simulator exposes, with the same semantics as the reference
(`torchdrivesim/infractions.py`) but no per-agent Python loops, no CPU
round-trips, and no native-library calls in the hot path:

* offroad: exact point-to-triangle path for parity/tests, baked
  distance-field path for the jitted hot loop;
* wrong-way: host lanelet-query path for parity, baked direction-field path
  for the hot loop;
* collisions: all four reference metrics (`simulator.py:27-34`), with the
  exact IoU computed on-device by the polygon-clipping pipeline instead of
  shapely/pytorch3d.
"""
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.mesh import BaseMesh
from torchdrivesim_tpu.ops.box import (
    box2corners, iou_differentiable as _iou_pairwise, iou_non_differentiable,
)
from torchdrivesim_tpu.ops.collision import (
    bbox2discs, collision_detection_with_discs, collision_matrix_with_discs,
)
from torchdrivesim_tpu.ops.point_mesh import point_to_triangles_distance_sq_chunked
from torchdrivesim_tpu.utils import normalize_angle



def rectangle_vertices(cx, cy, w, h, angle):
    """
    Corners of rotated rectangles from center, size and yaw
    (ref: `infractions.py:477-500`, same corner order). Works on numpy or
    jax inputs of shape (B, 1) each; returns (B, 4, 2).
    """
    xp = np if all(isinstance(a, np.ndarray) for a in (cx, cy, w, h, angle)) \
        else jnp
    dx = w / 2
    dy = h / 2
    dxcos = dx * xp.cos(angle)
    dxsin = dx * xp.sin(angle)
    dycos = dy * xp.cos(angle)
    dysin = dy * xp.sin(angle)
    center = xp.concatenate([cx, cy], axis=-1)
    return xp.stack([
        center + xp.concatenate([-dxcos + dysin, -dxsin - dycos], axis=-1),
        center + xp.concatenate([dxcos + dysin, dxsin - dycos], axis=-1),
        center + xp.concatenate([dxcos - dysin, dxsin + dycos], axis=-1),
        center + xp.concatenate([-dxcos - dysin, -dxsin + dycos], axis=-1),
    ], axis=1)

LANELET_TAGS_TO_EXCLUDE = ['parking']


# ----------------------------------------------------------------------------
# Offroad
# ----------------------------------------------------------------------------

def offroad_infraction_loss(agent_states: jnp.ndarray, lenwid: jnp.ndarray,
                            driving_surface_mesh: BaseMesh,
                            threshold: float = 0) -> jnp.ndarray:
    """
    Exact offroad loss (semantics of `infractions.py:176-229`): per agent,
    the sum over its 4 box corners of the thresholded SQUARED distance to
    the driving-surface mesh.

    Args:
        agent_states: BxAx4 (x, y, psi, v).
        lenwid: BxAx2 or Bx2 agent dimensions.
        driving_surface_mesh: batch of B meshes.
    Returns:
        BxA losses.
    """
    batch_size, num_agents = agent_states.shape[:2]
    if num_agents == 0 or driving_surface_mesh.faces_count == 0:
        return jnp.zeros_like(agent_states[..., 0])
    if lenwid.ndim == 2:
        lenwid = jnp.broadcast_to(lenwid[:, None], (batch_size, num_agents, 2))
    boxes = jnp.concatenate(
        [agent_states[..., :2], lenwid, agent_states[..., 2:3]], axis=-1)
    corners = box2corners(boxes).reshape(batch_size, num_agents * 4, 2)
    verts = driving_surface_mesh.verts[..., :2]
    tris = jnp.take_along_axis(
        verts[:, :, None, :],
        driving_surface_mesh.faces.astype(jnp.int32)[..., None], axis=1)
    d2 = point_to_triangles_distance_sq_chunked(corners, tris)  # B x A*4
    d2 = jnp.where(d2 > threshold, d2, 0.0)
    return d2.reshape(batch_size, num_agents, 4).sum(axis=-1)


# ----------------------------------------------------------------------------
# Wrong-way
# ----------------------------------------------------------------------------

def lanelet_orientation_loss(lanelet_maps: List, agents_state: jnp.ndarray,
                             recenter_offset: Optional[jnp.ndarray] = None,
                             direction_angle_threshold: float = np.pi / 2,
                             lanelet_dist_tolerance: float = 1.0) -> jnp.ndarray:
    """
    Host-side wrong-way loss using per-agent lanelet queries (exact
    semantics of `infractions.py:232-304`). Use the grid path
    (`map_grids.wrong_way_loss_from_grid`) inside jitted loops.
    """
    from torchdrivesim_tpu.lanelet2 import LaneletError, find_lanelet_directions
    assert direction_angle_threshold >= np.pi / 2, \
        'direction_angle_threshold smaller than pi / 2 will produce false positives'
    states = np.asarray(agents_state)
    offsets = np.asarray(recenter_offset) if recenter_offset is not None else None
    batch, agents = states.shape[:2]
    out = np.zeros((batch, agents), dtype=np.float32)
    for b in range(batch):
        lanelet_map = lanelet_maps[b]
        if lanelet_map is None:
            continue
        for a in range(agents):
            x, y, psi = states[b, a, 0], states[b, a, 1], states[b, a, 2]
            if offsets is not None:
                x = x + offsets[b, 0]
                y = y + offsets[b, 1]
            try:
                directions = find_lanelet_directions(
                    lanelet_map, float(x), float(y),
                    tags_to_exclude=LANELET_TAGS_TO_EXCLUDE,
                    lanelet_dist_tolerance=lanelet_dist_tolerance)
            except LaneletError:
                continue
            if not directions:
                continue
            deltas = normalize_angle(np.asarray(directions) - psi)
            losses = -np.cos(deltas) * (np.abs(deltas) > direction_angle_threshold)
            out[b, a] = losses.min()
    return jnp.asarray(out)


# ----------------------------------------------------------------------------
# Collisions
# ----------------------------------------------------------------------------

def iou_differentiable(box1: jnp.ndarray, box2: jnp.ndarray,
                       fast: bool = True) -> jnp.ndarray:
    """Differentiable oriented-box IoU (ref: `infractions.py:307-324`)."""
    del fast  # single implementation; already the fast shoelace pipeline
    return _iou_pairwise(box1, box2)


def compute_agent_collisions_metric(all_rects, collision_masks, present_masks):
    """
    Exact (non-differentiable) collision counts per agent
    (semantics of `infractions.py:352-375`), computed on-device via the
    polygon-clipping IoU rather than shapely polygons on CPU.

    Args:
        all_rects: BxAx5 boxes; collision_masks / present_masks: BxA bools.
    Returns:
        BxA collision counts.
    """
    boxes = jnp.asarray(all_rects)
    collision_masks = jnp.asarray(collision_masks)
    present_masks = jnp.asarray(present_masks)
    iou = iou_non_differentiable(boxes)                   # BxAxA
    iou = jnp.nan_to_num(iou, nan=0.0)
    intersects = (iou > 0.0) & (iou <= 1.0)
    a = boxes.shape[-2]
    eye = jnp.eye(a, dtype=bool)
    pair_mask = (present_masks[..., None, :] & present_masks[..., :, None]
                 & collision_masks[..., None] & ~eye)
    counts = jnp.sum((intersects & pair_mask), axis=-1).astype(boxes.dtype)
    return counts * present_masks


def compute_agent_collisions_metric_pytorch3d(all_rects: jnp.ndarray,
                                              masks: jnp.ndarray) -> jnp.ndarray:
    """
    Collision counts matching the reference's pytorch3d metric
    (`infractions.py:327-349`): pairwise exact IoU > 0 summed over the
    transposed mask with the diagonal removed.
    """
    iou = iou_non_differentiable(all_rects)
    iou = jnp.nan_to_num(iou, nan=0.0)
    intersects = ((iou > 0.0) & (iou <= 1.0)).astype(all_rects.dtype)
    a = all_rects.shape[-2]
    eye = jnp.eye(a, dtype=all_rects.dtype)
    masks_t = jnp.broadcast_to(masks[..., None, :], iou.shape).astype(all_rects.dtype)
    masks_t = masks_t * (1 - eye)
    masks_t = jnp.swapaxes(masks_t, -1, -2)
    return jnp.sum(intersects * masks_t, axis=-1)


def compute_collision_matrix(all_boxes: jnp.ndarray, mask: jnp.ndarray,
                             metric: str = 'discs') -> jnp.ndarray:
    """
    Differentiable per-agent collision values against all other agents in one
    batched op -- the TPU replacement for the reference's per-agent loop
    (`simulator.py:1186-1192`). Self-overlap is excluded via the diagonal
    (equivalent to the reference's subtract-the-max at `simulator.py:1108`,
    since self-overlap is always the maximum).

    Args:
        all_boxes: Bx(A+Npc)x5; mask: Bx(A+Npc) presence flags.
        metric: 'discs' or 'iou'.
    Returns:
        Bx(A+Npc) summed collision values per agent.
    """
    boxes = jnp.nan_to_num(all_boxes, nan=0.0)
    if metric == 'discs':
        overlap = collision_matrix_with_discs(boxes)
    elif metric == 'iou':
        n = boxes.shape[-2]
        b1 = jnp.broadcast_to(boxes[..., :, None, :], boxes.shape[:-2] + (n, n, 5))
        b2 = jnp.broadcast_to(boxes[..., None, :, :], boxes.shape[:-2] + (n, n, 5))
        overlap = _iou_pairwise(b1, b2)
    else:
        raise ValueError(f"Unrecognized collision metric: {metric}")
    overlap = jnp.nan_to_num(overlap, nan=0.0)
    n = boxes.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    overlap = jnp.where(eye, 0.0, overlap)
    overlap = overlap * mask[..., None, :].astype(overlap.dtype)
    return jnp.sum(overlap, axis=-1)


# ----------------------------------------------------------------------------
# Reference-shaped host/parity helpers
# ----------------------------------------------------------------------------

def point_mesh_face_distance(mesh: BaseMesh, points: jnp.ndarray,
                             reduction: str = 'sum', weighted: bool = False,
                             threshold: float = 0.0) -> jnp.ndarray:
    """
    Distance between a batch of point clouds and a batch of meshes: squared
    L2 from each point to its closest face, reduced across points. The JAX
    analogue of the reference's pytorch3d wrapper (`infractions.py:24-83`),
    with padded (B, P, D) points standing in for packed Pointclouds and a
    `BaseMesh` for Meshes.

    Args:
        mesh: batch of B meshes (2D or 3D vertices).
        points: (B, P, 2) or (B, P, 3) query points.
        reduction: 'none' | 'sum' | 'mean' | 'min' | 'max'.
        weighted: divide each point's distance by the cloud size P.
        threshold: distances <= this are zeroed (torch ``F.threshold``
            semantics, applied after weighting, as in the reference).
    Returns:
        (B, P) squared distances if reduction is 'none', else (B, 1).
    """
    batch_size, num_points = points.shape[:2]
    dim = points.shape[-1]
    if num_points == 0 or mesh.faces_count == 0:
        d2 = jnp.zeros((batch_size, num_points), points.dtype)
    else:
        verts = mesh.verts[..., :dim]
        tris = jnp.take_along_axis(
            verts[:, :, None, :],
            mesh.faces.astype(jnp.int32)[..., None], axis=1)
        if dim == 2:
            d2 = point_to_triangles_distance_sq_chunked(points, tris)
        else:
            d2 = jax.vmap(point_to_mesh_distance_pt,
                          in_axes=(1, None), out_axes=1)(points, tris)[..., 0]
    if weighted:
        d2 = d2 / max(num_points, 1)
    d2 = jnp.nan_to_num(d2, nan=0.0)
    d2 = jnp.where(d2 > threshold, d2, 0.0)
    if reduction == 'none':
        return d2
    if reduction == 'sum':
        return d2.sum(axis=-1, keepdims=True)
    if reduction == 'mean':
        return d2.mean(axis=-1, keepdims=True)
    if reduction == 'min':
        return d2.min(axis=-1, keepdims=True)
    if reduction == 'max':
        return d2.max(axis=-1, keepdims=True)
    raise ValueError(f"unknown reduction: {reduction!r}")


def point_to_mesh_distance_pt(points: jnp.ndarray, tris: jnp.ndarray,
                              threshold: float = 0.0) -> jnp.ndarray:
    """
    3D squared point-to-mesh distance with the reference's exact shapes and
    math (`infractions.py:86-173`): plane-projection distance inside a
    (non-degenerate) face, min squared edge distance outside, min over
    faces. Values <= ``threshold`` are zeroed (torch ``F.threshold``
    semantics). The framework's own offroad path is the specialized 2D op
    `ops.point_mesh.point_to_triangles_distance_sq`; this wrapper exists for
    code written against the reference signature.

    Args:
        points: (B, 3); tris: (B, F, 3, 3).
    Returns:
        (B, 1) squared distances.
    """
    p = points[:, None, :]                                   # (B, 1, 3)
    v0, v1, v2 = tris[..., 0, :], tris[..., 1, :], tris[..., 2, :]
    cross = jnp.cross(v2 - v0, v1 - v0)                      # (B, F, 3)
    norm_normal = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    normal = cross / (norm_normal + 1e-8)
    t = jnp.sum((v0 - p) * normal, axis=-1, keepdims=True)   # (B, F, 1)
    p_proj = p + t * normal

    def bary(q, a, b, c, eps=1e-8):
        p0, p1, p2 = b - a, c - a, q - a
        d00 = jnp.sum(p0 * p0, -1, keepdims=True)
        d01 = jnp.sum(p0 * p1, -1, keepdims=True)
        d11 = jnp.sum(p1 * p1, -1, keepdims=True)
        d20 = jnp.sum(p2 * p0, -1, keepdims=True)
        d21 = jnp.sum(p2 * p1, -1, keepdims=True)
        denom = d00 * d11 - d01 * d01 + eps
        w1 = (d11 * d20 - d01 * d21) / denom
        w2 = (d00 * d21 - d01 * d20) / denom
        return 1.0 - w1 - w2, w1, w2

    w0, w1, w2 = bary(p_proj, v0, v1, v2)
    inside = ((0.0 <= w0) & (w0 <= 1.0) & (0.0 <= w1) & (w1 <= 1.0)
              & (0.0 <= w2) & (w2 <= 1.0))
    area = norm_normal / 2.0
    inside = inside & (area >= 5e-3)                        # min_triangle_area

    def edge_d2(q, a, b):
        ab = b - a
        l2 = jnp.sum(ab * ab, -1, keepdims=True)
        tt = jnp.clip(jnp.sum(ab * (q - a), -1, keepdims=True) / (l2 + 1e-8),
                      0.0, 1.0)
        proj = a + tt * ab
        d2 = jnp.sum((q - proj) ** 2, -1, keepdims=True)
        d2_end = jnp.sum((q - b) ** 2, -1, keepdims=True)
        return jnp.where(l2 <= 1e-8, d2_end, d2)

    dist = jnp.minimum(jnp.minimum(edge_d2(p, v0, v1), edge_d2(p, v0, v2)),
                       edge_d2(p, v1, v2))
    cond = inside & (norm_normal > 1e-8)
    dist = jnp.where(cond, t * t, dist)
    dist = jnp.min(dist, axis=-2)                           # (B, 1)
    dist = jnp.nan_to_num(dist, nan=0.0)
    return jnp.where(dist > threshold, dist, 0.0)


def get_all_intersections(rects: np.ndarray,
                          ego_idx: Optional[int] = None) -> np.ndarray:
    """
    Binary rectangle-intersection matrix, reference-shaped
    (`infractions.py:429-474`): strictly-positive-area overlap of rotated
    rectangles, exact. The reference builds shapely polygons in a Python
    double loop (with an rtree index past 100 agents); here all pairs run
    through the batched masked-shoelace pipeline in one shot — no spatial
    index needed.

    Args:
        rects: (M, 5) x, y, length, width, yaw.
        ego_idx: if given, only intersections against this rectangle.
    Returns:
        (M, M) float upper-triangular 0/1 matrix, or (M-1,) for ego mode.
    """
    import contextlib

    from torchdrivesim_tpu.ops.box import oriented_box_intersection_area
    rects = np.asarray(rects, dtype=np.float32)
    m = len(rects)
    # host-facing oracle: pin the math to the CPU backend so the fetches
    # below never touch the (tunneled) accelerator client -- a first D2H
    # fetch would flip it into slow synchronous dispatch (CLAUDE.md)
    try:
        ctx = jax.default_device(jax.devices('cpu')[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        corners = np.asarray(box2corners(jnp.asarray(rects)))  # (M, 4, 2)
        if ego_idx is None:
            c1 = jnp.asarray(corners)[:, None]                 # (M, 1, 4, 2)
            c2 = jnp.asarray(corners)[None, :]                 # (1, M, 4, 2)
            area = np.asarray(oriented_box_intersection_area(
                jnp.broadcast_to(c1, (m, m, 4, 2)),
                jnp.broadcast_to(c2, (m, m, 4, 2))))
            hit = (area > 1e-9).astype(np.float64)
            return np.triu(hit, k=1)
        others = np.delete(corners, ego_idx, axis=0)           # (M-1, 4, 2)
        ego = np.broadcast_to(corners[ego_idx], others.shape)
        area = np.asarray(oriented_box_intersection_area(
            jnp.asarray(ego), jnp.asarray(others)))
        return (area > 1e-9).astype(np.float64)
