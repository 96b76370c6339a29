import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.ops.collision import (
    bbox2discs, collision_detection_with_discs, collision_matrix_with_discs,
)
from torchdrivesim_tpu.ops.point_mesh import (
    point_to_triangles_distance_sq, point_to_triangles_distance_sq_chunked,
)


def test_bbox2discs_geometry():
    box = jnp.asarray([[0., 0., 5., 2., 0.]])
    centers, r = bbox2discs(box)
    centers = np.asarray(centers)[0]
    assert centers.shape == (5, 2)
    np.testing.assert_allclose(float(r[0, 0]), 1.0)
    # discs span the length axis: from -(l/2 - r) to +(l/2 - r)
    np.testing.assert_allclose(centers[:, 0], [-1.5, -0.75, 0, 0.75, 1.5], atol=1e-6)
    np.testing.assert_allclose(centers[:, 1], 0, atol=1e-6)
    # wide box: major axis is y
    box_w = jnp.asarray([[0., 0., 2., 5., 0.]])
    centers_w = np.asarray(bbox2discs(box_w)[0])[0]
    np.testing.assert_allclose(centers_w[:, 1], [-1.5, -0.75, 0, 0.75, 1.5], atol=1e-6)


def test_collision_detection_with_discs_values():
    b1 = jnp.asarray([[[0., 0., 4., 2., 0.]]])
    # identical boxes collide with value 1
    np.testing.assert_allclose(
        float(collision_detection_with_discs(b1, b1)[0, 0]), 1.0, atol=1e-6)
    # far away: no collision
    b2 = jnp.asarray([[[10., 0., 4., 2., 0.]]])
    np.testing.assert_allclose(
        float(collision_detection_with_discs(b1, b2)[0, 0]), 0.0, atol=1e-6)
    # touching at disc distance = r1 + r2: value 0, closer: positive
    b3 = jnp.asarray([[[0., 2.0, 4., 2., 0.]]])
    v = float(collision_detection_with_discs(b1, b3)[0, 0])
    assert v == 0.0
    b4 = jnp.asarray([[[0., 1.5, 4., 2., 0.]]])
    v4 = float(collision_detection_with_discs(b1, b4)[0, 0])
    np.testing.assert_allclose(v4, 1 - 1.5 / 2, atol=1e-5)


def test_collision_matrix_matches_pairwise():
    rng = np.random.RandomState(3)
    boxes = np.stack([
        rng.uniform(-10, 10, (6,)), rng.uniform(-10, 10, (6,)),
        rng.uniform(2, 5, (6,)), rng.uniform(1, 2.5, (6,)),
        rng.uniform(-np.pi, np.pi, (6,)),
    ], axis=-1).astype(np.float32)
    boxes = jnp.asarray(boxes)[None]
    mat = np.asarray(collision_matrix_with_discs(boxes))[0]
    for i in range(6):
        for j in range(6):
            v = float(collision_detection_with_discs(
                boxes[:, i:i + 1], boxes[:, j:j + 1])[0, 0])
            np.testing.assert_allclose(mat[i, j], v, atol=1e-4)
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-5)


def test_collision_gradient():
    def f(dy):
        b1 = jnp.asarray([[[0., 0., 4., 2., 0.]]])
        b2 = jnp.asarray([[[0., 0., 4., 2., 0.]]]).at[0, 0, 1].add(dy)
        return collision_detection_with_discs(b1, b2)[0, 0]
    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) < 0


def test_point_to_triangles_distance():
    tris = jnp.asarray([[[0., 0.], [2., 0.], [0., 2.]],
                        [[10., 10.], [12., 10.], [10., 12.]]])
    pts = jnp.asarray([[0.5, 0.5],   # inside first triangle
                       [3., 0.],     # 1 m from vertex (2,0)
                       [11., 9.]])   # 1 m below second triangle edge
    d2 = np.asarray(point_to_triangles_distance_sq(pts, tris))
    np.testing.assert_allclose(d2, [0., 1., 1.], atol=1e-5)
    d2c = np.asarray(point_to_triangles_distance_sq_chunked(pts, tris, chunk=1))
    np.testing.assert_allclose(d2c, d2, atol=1e-6)


def test_point_to_triangles_gradient():
    tris = jnp.asarray([[[0., 0.], [2., 0.], [0., 2.]]])
    def f(x):
        pts = jnp.stack([x, jnp.asarray(-1.0)])[None]
        return point_to_triangles_distance_sq(pts, tris)[0]
    g = jax.grad(f)(jnp.asarray(1.0))
    # distance to the bottom edge does not change with x inside the edge span
    np.testing.assert_allclose(float(g), 0.0, atol=1e-5)
    g2 = jax.grad(lambda y: point_to_triangles_distance_sq(
        jnp.stack([jnp.asarray(1.0), y])[None], tris)[0])(jnp.asarray(-1.0))
    np.testing.assert_allclose(float(g2), -2.0, atol=1e-4)  # d/dy of y^2 at -1
