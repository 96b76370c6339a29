"""
Map QA (counterpart of the reference `tests/test_maps.py:6-12`): bundled
stoplines must not be oriented against their lanelet's direction.
"""
import pytest

from torchdrivesim_tpu.map import find_map_config, find_wrong_way_stoplines


@pytest.mark.integration
@pytest.mark.parametrize('map_name',
                         ['carla_Town01', 'carla_Town02', 'carla_Town07',
                          'carla_Town10HD'])
def test_no_wrong_way_stoplines(map_name):
    cfg = find_map_config(map_name)
    if cfg is None or cfg.lanelet_map is None:
        pytest.skip(f'{map_name} assets unavailable')
    assert find_wrong_way_stoplines(cfg) == []


@pytest.mark.integration
def test_town10hd_loads_with_baked_assets():
    """carla_Town10HD ships only its .osm upstream; this repo bakes the mesh
    JSON (reference format, `mesh.py:700-709`), grid cache, and texture from
    it. The left-handed map must load fast from those caches with all
    categories and a direction field present."""
    cfg = find_map_config('carla_Town10HD')
    assert cfg is not None and cfg.left_handed_coordinates
    mesh = cfg.road_mesh
    assert mesh is not None and mesh.faces.shape[-2] > 10000
    assert set(mesh.categories) >= {'road', 'left_lane', 'right_lane'}
    grids = cfg.grids(bake_if_missing=False)
    assert grids is not None and grids.direction is not None
    assert grids.distance.data.shape[0] > 500


def test_points_near_polygon_chunking_exact():
    """Chunked evaluation must be bit-identical to unchunked (the chunking
    exists purely to bound the (points x edges) temporaries, which cost one
    Town07 lanelet 429 s of bake time)."""
    import numpy as np
    from torchdrivesim_tpu.map_grids import (_points_near_polygon,
                                             _polyline_directions_at)
    rng = np.random.RandomState(0)
    poly = np.cumsum(rng.uniform(-2, 2, (50, 2)), axis=0)
    pts = rng.uniform(poly.min() - 3, poly.max() + 3, (5000, 2))
    np.testing.assert_array_equal(
        _points_near_polygon(pts, poly, 1.0, chunk=512),
        _points_near_polygon(pts, poly, 1.0, chunk=10 ** 9))
    line = np.cumsum(rng.uniform(0.1, 1.0, (30, 2)), axis=0)
    np.testing.assert_array_equal(
        _polyline_directions_at(line, pts, chunk=512),
        _polyline_directions_at(line, pts, chunk=10 ** 9))
