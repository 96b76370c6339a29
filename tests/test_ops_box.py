import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.ops.box import (
    box2corners, box2corners_with_rear_factor, iou_differentiable,
    iou_non_differentiable, oriented_box_intersection_area,
)


def _box(x, y, l, w, a):
    return jnp.asarray([[[x, y, l, w, a]]], dtype=jnp.float32)


def test_box2corners_axis_aligned():
    corners = np.asarray(box2corners(_box(0, 0, 4, 2, 0)))[0, 0]
    expected = np.array([[2, 1], [-2, 1], [-2, -1], [2, -1]])
    np.testing.assert_allclose(corners, expected, atol=1e-6)


def test_box2corners_rotated():
    corners = np.asarray(box2corners(_box(1, 1, 2, 2, np.pi / 2)))[0, 0]
    # rotating a square by 90 degrees permutes corners
    expected = np.array([[0, 2], [0, 0], [2, 0], [2, 2]])
    np.testing.assert_allclose(corners, expected, atol=1e-5)


def test_rear_factor_corners():
    corners = np.asarray(box2corners_with_rear_factor(_box(0, 0, 4, 2, 0), 0.5))[0, 0]
    # rear half of the box: x in [-2, 0]
    assert corners[:, 0].max() <= 1e-5
    assert corners[:, 0].min() >= -2 - 1e-5
    full = np.asarray(box2corners_with_rear_factor(_box(0, 0, 4, 2, 0), 1.0))[0, 0]
    np.testing.assert_allclose(full, np.asarray(box2corners(_box(0, 0, 4, 2, 0)))[0, 0], atol=1e-5)


@pytest.mark.parametrize("case,expected", [
    # identical boxes: intersection = full area
    ((0, 0, 4, 2, 0, 0, 0, 4, 2, 0), 8.0),
    # half-overlapping axis-aligned
    ((0, 0, 4, 2, 0, 2, 0, 4, 2, 0), 4.0),
    # disjoint
    ((0, 0, 4, 2, 0, 10, 0, 4, 2, 0), 0.0),
    # one box inside the other
    ((0, 0, 10, 10, 0, 0, 0, 2, 2, 0), 4.0),
    # rotated 45 degrees unit squares, same center
    ((0, 0, 2, 2, 0, 0, 0, 2, 2, np.pi / 4), 8 * (np.sqrt(2) - 1)),
])
def test_intersection_area(case, expected):
    b1 = _box(*case[:5])
    b2 = _box(*case[5:])
    area = float(oriented_box_intersection_area(box2corners(b1), box2corners(b2))[0, 0])
    np.testing.assert_allclose(area, expected, atol=1e-4)


def test_intersection_area_many_random_vs_shapely_style_reference():
    # brute-force polygon clipping reference in numpy (Sutherland-Hodgman)
    def clip_poly(subject, clip):
        def inside(p, a, b):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0
        def isect(p1, p2, a, b):
            dc = (a[0] - b[0], a[1] - b[1])
            dp = (p1[0] - p2[0], p1[1] - p2[1])
            n1 = a[0] * b[1] - a[1] * b[0]
            n2 = p1[0] * p2[1] - p1[1] * p2[0]
            d = dc[0] * dp[1] - dc[1] * dp[0]
            return ((n1 * dp[0] - n2 * dc[0]) / d, (n1 * dp[1] - n2 * dc[1]) / d)
        out = list(subject)
        a = clip[-1]
        for b in clip:
            src = out
            out = []
            if not src:
                break
            s = src[-1]
            for p in src:
                if inside(p, a, b):
                    if not inside(s, a, b):
                        out.append(isect(s, p, a, b))
                    out.append(p)
                elif inside(s, a, b):
                    out.append(isect(s, p, a, b))
                s = p
            a = b
        return out

    def poly_area(poly):
        if len(poly) < 3:
            return 0.0
        s = 0.0
        for i in range(len(poly)):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % len(poly)]
            s += x1 * y2 - x2 * y1
        return abs(s) / 2

    def corners_np(box):
        x, y, l, w, a = box
        cx = np.array([0.5, -0.5, -0.5, 0.5]) * l
        cy = np.array([0.5, 0.5, -0.5, -0.5]) * w
        c, s = np.cos(a), np.sin(a)
        return list(zip(cx * c - cy * s + x, cx * s + cy * c + y))

    rng = np.random.RandomState(42)
    boxes1, boxes2, expected = [], [], []
    for _ in range(64):
        b1 = [rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 5),
              rng.uniform(1, 3), rng.uniform(-np.pi, np.pi)]
        b2 = [rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 5),
              rng.uniform(1, 3), rng.uniform(-np.pi, np.pi)]
        # box2corners emits counterclockwise corners, as the clipping
        # reference requires
        c1 = corners_np(b1)
        c2 = corners_np(b2)
        expected.append(poly_area(clip_poly(c1, c2)))
        boxes1.append(b1)
        boxes2.append(b2)
    b1 = jnp.asarray(boxes1, dtype=jnp.float32)[None]
    b2 = jnp.asarray(boxes2, dtype=jnp.float32)[None]
    area = np.asarray(oriented_box_intersection_area(box2corners(b1), box2corners(b2)))[0]
    np.testing.assert_allclose(area, expected, atol=2e-3)


def test_iou_values():
    b1 = _box(0, 0, 4, 2, 0)
    np.testing.assert_allclose(float(iou_differentiable(b1, b1)[0, 0]), 1.0, atol=1e-5)
    b2 = _box(2, 0, 4, 2, 0)
    np.testing.assert_allclose(float(iou_differentiable(b1, b2)[0, 0]), 4 / 12, atol=1e-4)


def test_iou_gradient_flows():
    def f(offset):
        b1 = jnp.asarray([[[0., 0., 4., 2., 0.]]])
        b2 = jnp.asarray([[[0., 0., 4., 2., 0.]]]) + jnp.pad(
            offset[None, None, None], ((0, 0), (0, 0), (0, 4)))
        return iou_differentiable(b1, b2)[0, 0]

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    assert float(g) < 0  # moving away decreases IoU
    eps = 1e-3
    fd = (f(jnp.asarray(1.0 + eps)) - f(jnp.asarray(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-2)


def test_self_iou_at_large_coordinates():
    # float32 regression: boxes far from the origin must still self-overlap
    # exactly (guards the recentering in oriented_box_intersection_area)
    for xy in [34.0, 180.0, 400.0, -350.0]:
        b = jnp.asarray([[[xy, -xy, 3.83, 1.94, -0.776]]], dtype=jnp.float32)
        np.testing.assert_allclose(float(iou_differentiable(b, b)[0, 0]), 1.0, atol=1e-4)


def test_iou_matrix_nograd():
    boxes = jnp.asarray([[
        [0., 0., 4., 2., 0.],
        [2., 0., 4., 2., 0.],
        [100., 0., 4., 2., 0.],
    ]])
    iou = np.asarray(iou_non_differentiable(boxes))[0]
    assert iou.shape == (3, 3)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 4 / 12, atol=1e-4)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(iou, iou.T, atol=1e-5)


def test_boxes_overlap_sat_cross_matches_broadcast():
    """The unrolled all-pairs SAT must be bit-identical to broadcasting the
    generic op over the pair grid, including touching-edge (no overlap) and
    map-scale-coordinate cases."""
    from torchdrivesim_tpu.ops.box import (
        box2corners, boxes_overlap_sat, boxes_overlap_sat_cross)
    rng = np.random.RandomState(7)
    b, a, n = 3, 6, 5
    boxes1 = np.stack([
        rng.uniform(-30, 30, (b, a)) + 400.0,
        rng.uniform(-30, 30, (b, a)) - 250.0,
        rng.uniform(1, 6, (b, a)),
        rng.uniform(1, 3, (b, a)),
        rng.uniform(-np.pi, np.pi, (b, a)),
    ], axis=-1).astype(np.float32)
    boxes2 = np.stack([
        rng.uniform(-30, 30, (b, n)) + 400.0,
        rng.uniform(-30, 30, (b, n)) - 250.0,
        rng.uniform(2, 12, (b, n)),
        rng.uniform(1, 4, (b, n)),
        rng.uniform(-np.pi, np.pi, (b, n)),
    ], axis=-1).astype(np.float32)
    # force some exact touches and exact overlaps
    boxes2[0, 0] = boxes1[0, 0]
    boxes2[0, 1] = boxes1[0, 1] + np.asarray([boxes1[0, 1, 2], 0, 0, 0, 0],
                                             np.float32)
    boxes2[0, 1, 4] = boxes1[0, 1, 4] = 0.0
    c1 = box2corners(jnp.asarray(boxes1))
    c2 = box2corners(jnp.asarray(boxes2))
    got = np.asarray(boxes_overlap_sat_cross(c1, c2))
    want = np.asarray(boxes_overlap_sat(
        jnp.broadcast_to(c1[:, :, None], (b, a, n, 4, 2)),
        jnp.broadcast_to(c2[:, None], (b, a, n, 4, 2))))
    assert got.shape == (b, a, n)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0, 0]            # identical boxes overlap
    assert not got[0, 1, 1]        # exactly touching edges do not
