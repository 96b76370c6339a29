import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.utils import (
    is_inside_polygon, line_circle_intersection, normalize_angle, relative,
    rotate, rotation_matrix, transform, merge_dicts,
)


def test_normalize_angle():
    assert np.isclose(normalize_angle(np.pi + 0.1), -np.pi + 0.1)
    assert np.isclose(normalize_angle(-np.pi - 0.1), np.pi - 0.1)
    x = np.linspace(-10, 10, 101)
    n = normalize_angle(x)
    assert np.all(n >= -np.pi) and np.all(n < np.pi)
    np.testing.assert_allclose(np.cos(n), np.cos(x), atol=1e-6)
    np.testing.assert_allclose(np.sin(n), np.sin(x), atol=1e-6)


def test_rotation_matrix_and_rotate():
    theta = jnp.array([[np.pi / 2]])
    m = rotation_matrix(theta)
    np.testing.assert_allclose(np.asarray(m)[0], [[0, -1], [1, 0]], atol=1e-6)
    v = jnp.array([[1.0, 0.0]])
    r = rotate(v, theta)
    np.testing.assert_allclose(np.asarray(r), [[0.0, 1.0]], atol=1e-6)
    # batched broadcast
    v = jnp.ones((3, 5, 2))
    a = jnp.zeros((3, 5, 1))
    assert rotate(v, a).shape == (3, 5, 2)


def test_relative_roundtrip():
    rng = np.random.RandomState(0)
    origin_xy = jnp.asarray(rng.randn(4, 2))
    origin_psi = jnp.asarray(rng.randn(4, 1))
    target_xy = jnp.asarray(rng.randn(4, 2))
    target_psi = jnp.asarray(rng.randn(4, 1))
    rel_xy, rel_psi = relative(origin_xy, origin_psi, target_xy, target_psi)
    # forward transform recovers the target position
    back = rotate(rel_xy, origin_psi) + origin_xy
    np.testing.assert_allclose(np.asarray(back), np.asarray(target_xy), atol=1e-5)
    np.testing.assert_allclose(
        np.cos(np.asarray(rel_psi + origin_psi)), np.cos(np.asarray(target_psi)), atol=1e-5)


def test_transform():
    points = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    pose = jnp.array([[2.0, 3.0, np.pi / 2]])
    out = np.asarray(transform(points, pose))
    np.testing.assert_allclose(out, [[[2.0, 4.0], [1.0, 3.0]]], atol=1e-6)


def test_is_inside_polygon():
    square = jnp.array([[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]])
    pts = jnp.array([[[0.5, 0.5], [1.5, 0.5], [-0.1, 0.0], [0.99, 0.99]]])
    res = np.asarray(is_inside_polygon(pts, square))
    assert res.tolist() == [[True, False, False, True]]
    # clockwise winding also works
    square_cw = square[:, ::-1]
    res_cw = np.asarray(is_inside_polygon(pts, square_cw))
    assert res_cw.tolist() == [[True, False, False, True]]


def test_line_circle_intersection():
    p1 = jnp.array([[0.0, 0.0]])
    p2 = jnp.array([[2.0, 0.0]])
    center = jnp.array([[1.0, 0.5]])
    r_hit = jnp.array([[0.6]])
    r_miss = jnp.array([[0.4]])
    assert bool(line_circle_intersection(p1, p2, center, r_hit)[0, 0])
    assert not bool(line_circle_intersection(p1, p2, center, r_miss)[0, 0])
    # segment ends before the circle
    p2_short = jnp.array([[0.2, 0.0]])
    assert not bool(line_circle_intersection(p1, p2_short, center, r_hit)[0, 0])


def test_merge_dicts_later_wins():
    assert merge_dicts([{'a': 1}, {'a': 2, 'b': 3}]) == {'a': 2, 'b': 3}


def test_line_circle_intersection_xy_matches_generic():
    """The component-plane variant must agree with the reference-shaped op
    on random segments/circles including degenerate (point) segments."""
    import jax.numpy as jnp
    from torchdrivesim_tpu.utils import (
        line_circle_intersection, line_circle_intersection_xy)
    rng = np.random.RandomState(3)
    p1 = rng.uniform(-50, 50, (64, 2)).astype(np.float32)
    p2 = rng.uniform(-50, 50, (64, 2)).astype(np.float32)
    p2[:8] = p1[:8]                       # degenerate point segments
    c = rng.uniform(-50, 50, (64, 2)).astype(np.float32)
    r = rng.uniform(0.1, 10, (64, 1)).astype(np.float32)
    want = np.asarray(line_circle_intersection(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(c), jnp.asarray(r)))[..., 0]
    got = np.asarray(line_circle_intersection_xy(
        jnp.asarray(p1[:, 0]), jnp.asarray(p1[:, 1]),
        jnp.asarray(p2[:, 0]), jnp.asarray(p2[:, 1]),
        jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]), jnp.asarray(r[:, 0])))
    np.testing.assert_array_equal(got, want)
    assert want.any() and not want.all()
