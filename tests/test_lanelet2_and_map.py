import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.lanelet2 import (
    Lanelet, LaneletMap, LaneletPoint, Linestring, find_direction,
    find_lanelet_directions, lanelet_map_to_lane_mesh, line_segments_to_mesh,
    load_lanelet_map, pick_random_point_and_orientation, road_mesh_from_lanelet_map,
)
from torchdrivesim_tpu.map import (
    MapConfig, find_map_config, list_available_maps, load_map_config,
    traffic_controls_from_map_config,
)

TOWN01 = 'carla_Town01'
RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'torchdrivesim_tpu', 'resources', 'maps')


def _straight_lanelet_map(tag=None):
    """Synthetic single straight lanelet along +x, like the reference's
    in-memory test maps (`tests/simulator/test_util.py:13-44`)."""
    def ls(lid, ys, base):
        return Linestring(id=lid, points=[
            LaneletPoint(id=base + i, x=float(x), y=ys) for i, x in enumerate(range(0, 60, 10))])
    left = ls(1, 2.0, 100)
    right = ls(2, -2.0, 200)
    attrs = {tag: 'yes'} if tag else {}
    return LaneletMap(left.points + right.points, [left, right],
                      [Lanelet(id=10, left_bound=left, right_bound=right, attributes=attrs)])


def test_find_lanelet_directions_synthetic():
    m = _straight_lanelet_map()
    dirs = find_lanelet_directions(m, 25.0, 0.0)
    assert len(dirs) == 1
    np.testing.assert_allclose(dirs[0], 0.0, atol=1e-6)
    # outside the lanelet and beyond tolerance
    assert find_lanelet_directions(m, 25.0, 10.0) == []
    # inside tolerance band
    assert len(find_lanelet_directions(m, 25.0, 2.5, lanelet_dist_tolerance=1.0)) == 1


def test_excluded_tag_clears_result():
    m = _straight_lanelet_map(tag='parking')
    assert find_lanelet_directions(m, 25.0, 0.0, tags_to_exclude=['parking']) == []
    assert len(find_lanelet_directions(m, 25.0, 0.0)) == 1


def test_pick_random_point_on_lane():
    m = _straight_lanelet_map()
    x, y, ori = pick_random_point_and_orientation(m)
    assert 0 <= x <= 50
    assert abs(y) < 1e-6
    np.testing.assert_allclose(ori, 0.0, atol=1e-6)


def test_road_mesh_from_synthetic_map():
    m = _straight_lanelet_map()
    mesh = road_mesh_from_lanelet_map(m)
    assert mesh.faces_count == 10  # 6+6-2 zipper faces
    # total area = 50 x 4 rectangle
    v = np.asarray(mesh.verts)[0]
    f = np.asarray(mesh.faces)[0]
    tri = v[f]
    area = np.abs(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])).sum() / 2
    np.testing.assert_allclose(area, 200.0, atol=1e-3)


def test_line_segments_to_mesh_shapes():
    segs = jnp.asarray([[[[0., 0.], [10., 0.]], [[0., 5.], [10., 5.]]]])
    mesh = line_segments_to_mesh(segs, line_width=0.3)
    assert mesh.verts.shape == (1, 12, 2)
    assert mesh.faces.shape == (1, 8, 3)


def test_lane_mesh_synthetic():
    m = _straight_lanelet_map()
    lane_mesh = lanelet_map_to_lane_mesh(m)
    assert set(lane_mesh.categories) >= {'left_lane', 'right_lane'}
    assert lane_mesh.faces_count == 2 * 5 * 4  # 5 segments per side, 4 faces each


@pytest.mark.integration
class TestTown01:
    @pytest.fixture(scope='class')
    def lanelet_map(self):
        path = os.path.join(RES, TOWN01, f'{TOWN01}.osm')
        if not os.path.exists(path):
            pytest.skip('Town01 OSM not bundled')
        return load_lanelet_map(path, origin=(0.0, 0.0))

    def test_projection_matches_reference_mesh(self, lanelet_map):
        # the shipped mesh was produced by the C++ lanelet2 UTM projector;
        # our projector must land on the same coordinates
        mesh_path = os.path.join(RES, TOWN01, f'{TOWN01}_mesh.json')
        with open(mesh_path) as f:
            ref_verts = np.asarray(json.load(f)['verts'])[0]
        pts = np.asarray([[p.x, p.y] for p in lanelet_map.pointLayer])
        # each OSM point should appear (nearly exactly) among reference verts
        sample = pts[::101]
        d = np.min(np.linalg.norm(ref_verts[None] - sample[:, None], axis=-1), axis=-1)
        assert float(np.median(d)) < 1e-5
        assert float(d.max()) < 1e-4

    def test_road_mesh_generation(self, lanelet_map):
        mesh = road_mesh_from_lanelet_map(lanelet_map)
        assert mesh.faces_count > 5000
        assert mesh.verts_count == len(lanelet_map.pointLayer)

    def test_stopline_directions(self, lanelet_map):
        stoplines_path = os.path.join(RES, TOWN01, f'{TOWN01}_stoplines.json')
        with open(stoplines_path) as f:
            stoplines = json.load(f)
        sl = stoplines[0]
        dirs = find_lanelet_directions(lanelet_map, sl['x'], sl['y'],
                                       lanelet_dist_tolerance=1.0)
        assert dirs, "stopline should sit on a lanelet"
        diff = min(abs((d - sl['orientation'] + np.pi) % (2 * np.pi) - np.pi)
                   for d in dirs)
        assert diff < 0.05


class TestMapRegistry:
    def test_list_and_find(self):
        maps = list_available_maps()
        assert TOWN01 in maps and 'carla_Town03' in maps
        cfg = find_map_config(TOWN01)
        assert cfg is not None
        assert cfg.left_handed_coordinates
        assert cfg.mesh_path and os.path.isabs(cfg.mesh_path)

    def test_missing_map(self):
        assert find_map_config('no_such_map_xyz') is None

    def test_road_mesh_loads_from_json(self):
        cfg = find_map_config('carla_Town02')
        mesh = cfg.road_mesh
        assert mesh is not None
        assert 'road' in mesh.categories
        assert mesh.verts_count > 1000

    def test_traffic_controls_from_config(self):
        cfg = find_map_config('carla_Town03')  # stoplines present, mesh stripped
        controls = traffic_controls_from_map_config(cfg)
        assert 'traffic_light' in controls
        tl = controls['traffic_light']
        assert tl.pos.shape[0] == 1 and tl.pos.shape[1] > 10
        assert hasattr(tl, 'actor_ids') and len(tl.actor_ids) == tl.pos.shape[1]

    def test_traffic_light_controller_loads(self):
        cfg = find_map_config('carla_Town03')
        ctrl = cfg.traffic_light_controller
        assert ctrl is not None
        assert ctrl.get_number_of_light_groups() > 0
        states = ctrl.current_state_with_name
        assert all(v in ('red', 'yellow', 'green', 'none') for v in states.values())


class TestMapGrids:
    def test_bake_and_sample_synthetic(self, tmp_path):
        from torchdrivesim_tpu.map_grids import (
            MapGrids, bake_map_grids, load_map_grids, offroad_loss_from_grid,
            wrong_way_loss_from_grid)
        import torchdrivesim_tpu.map as tmap

        # synthetic map config: straight lanelet along +x as both mesh and map
        m = _straight_lanelet_map()
        cfg = MapConfig(name='synthetic')
        road = road_mesh_from_lanelet_map(m)
        from torchdrivesim_tpu.mesh import BirdviewMesh
        cfg.__dict__['road_mesh'] = BirdviewMesh.set_properties(road, 'road')
        grids = bake_map_grids_with(cfg, m, cell_size=0.5)

        # distance: zero on the road, grows off it
        from torchdrivesim_tpu.map_grids import sample_offroad_distance
        pts = jnp.asarray([[25.0, 0.0], [25.0, 6.0], [25.0, 1.9]])
        d = np.asarray(sample_offroad_distance(grids, pts))
        assert d[0] < 0.3
        np.testing.assert_allclose(d[1], 4.0, atol=0.5)

        # wrong way: agent along lane -> 0; against lane -> ~1
        agents = jnp.asarray([[[25., 0., 0.0, 0.], [25., 0., np.pi, 0.],
                               [25., 20., np.pi, 0.]]])
        loss = np.asarray(wrong_way_loss_from_grid(grids, agents))
        np.testing.assert_allclose(loss[0, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(loss[0, 1], 1.0, atol=1e-3)
        np.testing.assert_allclose(loss[0, 2], 0.0, atol=1e-6)  # off-map

        # offroad loss: on-road agent 0, off-road agent positive
        states = jnp.asarray([[[25., 0., 0., 0.], [25., 10., 0., 0.]]])
        lenwid = jnp.full((1, 2, 2), 2.0)
        off = np.asarray(offroad_loss_from_grid(grids, states, lenwid, threshold=0.5))
        assert off[0, 0] == 0.0
        assert off[0, 1] > 50

        # save/load round trip
        p = os.path.join(tmp_path, 'g.npz')
        grids.save(p)
        g2 = load_map_grids(p)
        d2 = np.asarray(sample_offroad_distance(g2, pts))
        np.testing.assert_allclose(d2, d, atol=0.05)

    def test_quad_sampling_matches_bilinear(self):
        """The one-gather bf16 quad path must agree with plain bilinear
        sampling (to bf16 precision) and stay differentiable."""
        import jax
        from torchdrivesim_tpu.map_grids import (
            MapGrids, sample_offroad_distance)
        from torchdrivesim_tpu.ops.grids import Grid2D

        rng = np.random.RandomState(0)
        data = jnp.asarray(np.abs(rng.randn(64, 48, 1)).astype(np.float32) * 5)
        plain = MapGrids(distance=Grid2D(
            data=data, origin=jnp.asarray([3.0, -7.0]), cell_size=0.5),
            direction=None)
        quad = plain.with_quad()
        assert quad.distance_quad.data.shape == (64, 48, 2)

        pts = jnp.asarray(rng.uniform(
            [3.5, -6.5], [3.0 + 0.5 * 46, -7.0 + 0.5 * 62],
            (200, 2)).astype(np.float32))
        want = np.asarray(sample_offroad_distance(plain, pts))
        got = np.asarray(sample_offroad_distance(quad, pts))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.03)

        # far out of bounds reads the fill value on both paths
        far = jnp.asarray([[1e5, 1e5]])
        assert float(sample_offroad_distance(quad, far)[0]) == 100.0

        # differentiable w.r.t. points (piecewise-linear slope)
        g = jax.grad(lambda p: jnp.sum(sample_offroad_distance(quad, p)))(pts)
        g0 = jax.grad(lambda p: jnp.sum(sample_offroad_distance(plain, p)))(pts)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                                   rtol=2e-2, atol=0.05)

    def test_row_packed_sampling_bit_exact(self):
        """The row-gather repack (RowPackedGrid) must reproduce the 2D quad
        and nearest samplers bit-for-bit, including boundary/fill handling
        and gradients."""
        import jax
        from torchdrivesim_tpu.map_grids import (
            MapGrids, sample_lane_directions, sample_offroad_distance)
        from torchdrivesim_tpu.ops.grids import Grid2D

        rng = np.random.RandomState(1)
        h, w = 61, 47                              # deliberately unaligned
        data = np.abs(rng.randn(h, w, 1)).astype(np.float32) * 5
        direction = rng.randint(-2**31, 2**31 - 1,
                                (h, w, 1)).astype(np.int32)
        origin = np.asarray([3.0, -7.0], np.float32)
        base = MapGrids(
            distance=Grid2D(data=data, origin=origin, cell_size=0.5),
            direction=Grid2D(data=direction, origin=origin, cell_size=0.5))
        full = base.with_quad()
        quad_only = full.replace(distance_rows=None, direction_rows=None)
        assert full.distance_rows is not None
        assert full.direction_rows is not None

        # points spanning interior, boundary ring, and far out of bounds
        pts = np.concatenate([
            rng.uniform([2.0, -8.0], [3.0 + 0.5 * w, -7.0 + 0.5 * h],
                        (500, 2)),
            np.asarray([[3.0, -7.0], [3.0 + 0.5 * (w - 1), -7.0 + 0.5 * (h - 1)],
                        [1e5, 1e5], [-1e5, 0.0]]),
        ]).astype(np.float32)
        pts = jnp.asarray(pts)

        want = np.asarray(sample_offroad_distance(quad_only, pts))
        got = np.asarray(sample_offroad_distance(full, pts))
        np.testing.assert_array_equal(got, want)

        want_d = [np.asarray(a) for a in
                  sample_lane_directions(quad_only, pts)]
        got_d = [np.asarray(a) for a in sample_lane_directions(full, pts)]
        for a, b in zip(got_d, want_d):
            np.testing.assert_array_equal(a, b)

        g = jax.grad(lambda p: jnp.sum(sample_offroad_distance(full, p)))(pts)
        g0 = jax.grad(
            lambda p: jnp.sum(sample_offroad_distance(quad_only, p)))(pts)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g0))


def bake_map_grids_with(cfg, lanelet_map, cell_size=0.5):
    """Bake grids with an explicit in-memory lanelet map (test helper)."""
    from torchdrivesim_tpu.map_grids import MapGrids, _bake_direction, _bake_distance
    mesh = cfg.road_mesh
    road = mesh.separate_by_category().get('road', mesh)
    verts = np.asarray(road.verts)[0]
    faces = np.asarray(road.faces)[0]
    distance = _bake_distance(verts, faces, cell_size, margin=15.0)
    direction = _bake_direction(lanelet_map, distance, cell_size, tolerance=1.0)
    return MapGrids(distance=distance, direction=direction)
