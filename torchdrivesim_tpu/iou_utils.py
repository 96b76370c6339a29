"""
Reference-shaped oriented-box IoU surface (`_iou_utils.py` in the reference,
vendored there from Rotated_IoU, MIT).

``torchdrivesim_tpu.ops.box`` is the TPU-native pipeline this framework uses
internally (fixed-shape masked shoelace, no data-dependent control flow).
This module exists for API parity: every public function of the reference's
`_iou_utils.py:35-367` with the same names, shapes and return conventions,
implemented in jnp and jittable. Downstream code written against the
reference (`from torchdrivesim._iou_utils import ...`) can switch imports
without further changes.

The one semantic re-derivation is `sort_indices` (`_iou_utils.py:161-228`):
the reference dedups near-coincident vertices with a data-dependent Python
while-loop; here the same one-removal-per-round rule runs as a fixed
16-round `lax.fori_loop` (24 candidate vertices, at most 8 distinct, so 16
rounds always suffice) with `where`-guarded updates.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.ops.box import (  # noqa: F401  (re-exported)
    box2corners, box2corners_with_rear_factor, iou_non_differentiable,
)

EPSILON = 1e-8  #: same constant as `_iou_utils.py:35`


def precision_rounding(x: jnp.ndarray, n_digits: int = 6) -> jnp.ndarray:
    """Round to ``n_digits`` decimals (`_iou_utils.py:38-39`)."""
    scale = 10.0 ** n_digits
    return jnp.round(x * scale) / scale


def box2corners_th(box: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 5) x,y,w,h,alpha -> (B, N, 4, 2) corners (`_iou_utils.py:270`)."""
    return box2corners(box)


def box_intersection_th(corners1: jnp.ndarray, corners2: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Pairwise edge-edge intersection points of two rectangles
    (`_iou_utils.py:42-84`). Collinear edges yield no intersection.

    Args:
        corners1: (B, N, 4, 2); corners2: (B, N, 4, 2).
    Returns:
        (intersections (B, N, 4, 4, 2), mask (B, N, 4, 4) bool).
    """
    nxt = [1, 2, 3, 0]
    line1 = jnp.concatenate([corners1, corners1[:, :, nxt, :]], axis=3)
    line2 = jnp.concatenate([corners2, corners2[:, :, nxt, :]], axis=3)
    l1 = line1[:, :, :, None, :]    # (B, N, 4, 1, 4)
    l2 = line2[:, :, None, :, :]    # (B, N, 1, 4, 4)
    x1, y1, x2, y2 = l1[..., 0], l1[..., 1], l1[..., 2], l1[..., 3]
    x3, y3, x4, y4 = l2[..., 0], l2[..., 1], l2[..., 2], l2[..., 3]
    num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    near_parallel = jnp.abs(num) < 1e-4
    den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
    t_mask = jnp.where(near_parallel, -1.0, den_t / jnp.where(near_parallel, 1.0, num))
    mask_t = (t_mask > 0) & (t_mask < 1)
    den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
    u = jnp.where(near_parallel, -1.0, -den_u / jnp.where(near_parallel, 1.0, num))
    mask_u = (u > 0) & (u < 1)
    mask = mask_t & mask_u
    t = den_t / (num + EPSILON)   # EPSILON form for gradient stability
    inter = jnp.stack([x1 + t * (x2 - x1), y1 + t * (y2 - y1)], axis=-1)
    inter = inter * mask[..., None].astype(inter.dtype)
    return inter, mask


def box1_in_box2(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """
    Per-corner containment of box1's corners in box2, corners-on-edge count
    as inside (`_iou_utils.py:87-114`).

    Args: corners1, corners2: (B, N, 4, 2). Returns: (B, N, 4) bool.
    """
    a = corners2[:, :, 0:1, :]
    b = corners2[:, :, 1:2, :]
    d = corners2[:, :, 3:4, :]
    ab = b - a
    am = corners1 - a
    ad = d - a
    p_ab = jnp.sum(ab * am, axis=-1)
    norm_ab = jnp.sum(ab * ab, axis=-1)
    p_ad = jnp.sum(ad * am, axis=-1)
    norm_ad = jnp.sum(ad * ad, axis=-1)
    cond1 = precision_rounding(p_ab / norm_ab)
    cond1 = (cond1 > -1e-6) & (cond1 < 1 + 1e-6)
    cond2 = precision_rounding(p_ad / norm_ad)
    cond2 = (cond2 > -1e-6) & (cond2 < 1 + 1e-6)
    return cond1 & cond2


def box_in_box_th(corners1: jnp.ndarray, corners2: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual corner containment (`_iou_utils.py:117-131`)."""
    return box1_in_box2(corners1, corners2), box1_in_box2(corners2, corners1)


def build_vertices(corners1: jnp.ndarray, corners2: jnp.ndarray,
                   c1_in_2: jnp.ndarray, c2_in_1: jnp.ndarray,
                   inters: jnp.ndarray, mask_inter: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Stack the 24 candidate vertices of the intersection polygon
    (`_iou_utils.py:134-158`): 4+4 contained corners + 16 edge intersections.

    Returns: (vertices (B, N, 24, 2), mask (B, N, 24) bool).
    """
    B, N = corners1.shape[:2]
    vertices = jnp.concatenate(
        [corners1, corners2, inters.reshape(B, N, -1, 2)], axis=2)
    mask = jnp.concatenate(
        [c1_in_2, c2_in_1, mask_inter.reshape(B, N, -1)], axis=2)
    return vertices, mask


def _remove_one_duplicate(vertices_flat, angles_flat, mask_flat, num_valid):
    """One round of the reference's dedup rule (`_iou_utils.py:188-214`):
    for rows still reporting >8 valid vertices, drop the vertex whose
    sorted-by-angle neighbor is nearest (they are near-coincident)."""
    inds_sorted = jnp.argsort(jnp.where(mask_flat, angles_flat, jnp.inf), axis=1)
    sorted_verts = jnp.take_along_axis(vertices_flat, inds_sorted[..., None], axis=1)
    dist = jnp.linalg.norm(sorted_verts[:, :-1] - sorted_verts[:, 1:], axis=-1)
    pos = jnp.arange(dist.shape[1])[None, :]
    dist = jnp.where(pos >= (num_valid - 1)[:, None], jnp.inf, dist)
    j = jnp.take_along_axis(inds_sorted, dist.argmin(axis=-1)[:, None], axis=1)[:, 0]
    remove = num_valid > 8
    onehot = jax.nn.one_hot(j, mask_flat.shape[1], dtype=bool) & remove[:, None]
    return mask_flat & ~onehot


def sort_indices(vertices: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """
    Counter-clockwise ordering of the valid intersection-polygon vertices
    as 9 indices into the 24 candidates — first index repeated after the
    last valid one, invalid slots pointing at a zero-masked candidate
    (`_iou_utils.py:161-228`). The reference's data-dependent dedup
    while-loop runs here as a fixed 16-round loop (see module docstring).

    Args: vertices (B, N, 24, 2) float, mask (B, N, 24) bool.
    Returns: (B, N, 9) int32.
    """
    B, N = vertices.shape[:2]
    verts = vertices.reshape(-1, 24, 2)
    msk = mask.reshape(-1, 24)
    num_valid0 = jnp.sum(msk, axis=1)
    center = (jnp.sum(verts * msk[..., None], axis=1, keepdims=True)
              / num_valid0[:, None, None])
    rel = verts - center
    r = jnp.sqrt(jnp.sum(rel ** 2, axis=-1))
    cosang = jnp.arccos(jnp.clip(rel[..., 0] / r, -1.0, 1.0))
    angles = jnp.where(rel[..., 1] > 0, cosang, 2 * np.pi - cosang)

    def round_fn(_, m):
        nv = jnp.sum(m, axis=1)
        return _remove_one_duplicate(verts, angles, m, nv)

    msk = jax.lax.fori_loop(0, 16, round_fn, msk)
    num_valid = jnp.sum(msk, axis=1)
    inds_sorted = jnp.argsort(jnp.where(msk, angles, jnp.inf), axis=1)
    index = inds_sorted[:, :9]
    # first invalid candidate among the 16 intersection slots: zero-valued,
    # zero-gradient padding target (same choice as the reference)
    pad_values = jnp.argmin(msk[:, 8:].astype(jnp.float32), axis=-1) + 8
    pos = jnp.arange(9)[None, :]
    index = jnp.where(num_valid[:, None] < 3, pad_values[:, None], index)
    index = jnp.where((pos >= num_valid[:, None]) & (num_valid[:, None] >= 3),
                      pad_values[:, None], index)
    # repeat the first vertex right after the last valid one (closes the ring)
    first = index[:, 0]
    close_ring = (pos == num_valid[:, None]) & (num_valid[:, None] >= 3)
    index = jnp.where(close_ring, first[:, None], index)
    return index.reshape(B, N, 9).astype(jnp.int32)


def calculate_area(idx_sorted: jnp.ndarray, vertices: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Shoelace area over the selected ring (`_iou_utils.py:230-247`).

    Args: idx_sorted (B, N, 9), vertices (B, N, 24, 2).
    Returns: (area (B, N), selected (B, N, 9, 2)).
    """
    selected = jnp.take_along_axis(vertices, idx_sorted[..., None], axis=2)
    total = (selected[:, :, :-1, 0] * selected[:, :, 1:, 1]
             - selected[:, :, :-1, 1] * selected[:, :, 1:, 0])
    area = jnp.abs(jnp.sum(total, axis=2)) / 2
    return area, selected


def oriented_box_intersection_2d(corners1: jnp.ndarray, corners2: jnp.ndarray
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Intersection area of 2D rectangles with the polygon-vertex byproduct
    (`_iou_utils.py:250-267`).

    Args: corners1, corners2: (B, N, 4, 2).
    Returns: (area (B, N), selected (B, N, 9, 2)).
    """
    inters, mask_inter = box_intersection_th(corners1, corners2)
    c12, c21 = box_in_box_th(corners1, corners2)
    vertices, mask = build_vertices(corners1, corners2, c12, c21,
                                    inters, mask_inter)
    sorted_indices = sort_indices(vertices, mask)
    return calculate_area(sorted_indices, vertices)


def iou_differentiable_fast(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """
    Differentiable IoU of (B, N, 5) x,y,w,h,alpha boxes via the shoelace
    pipeline (`_iou_utils.py:344-367`).
    """
    corners1 = box2corners_th(box1)
    corners2 = box2corners_th(box2)
    inter_area, _ = oriented_box_intersection_2d(corners1, corners2)
    area1 = box1[:, :, 2] * box1[:, :, 3]
    area2 = box2[:, :, 2] * box2[:, :, 3]
    u = area1 + area2 - inter_area
    return inter_area / u
