"""
Native (C++) direction-field baker: semantics must match the Python baker
cell-for-cell (it replaces a numpy loop that cost minutes on large maps --
one Town07 lanelet alone took 429 s unchunked, ~300 s chunked; the native
path bakes the whole map in ~2 s).
"""
import numpy as np
import pytest

from tests.test_lanelet2_and_map import _straight_lanelet_map
from torchdrivesim_tpu.lanelet2 import (Lanelet, LaneletMap, LaneletPoint,
                                        Linestring)
from torchdrivesim_tpu.map_grids import DIRECTION_LAYERS, _bake_direction
from torchdrivesim_tpu.native import _load_library, bake_direction_native
from torchdrivesim_tpu.ops.grids import Grid2D


def _curved_map():
    """Two overlapping lanelets: one straight (+x), one curving up, so some
    cells exercise multi-layer assignment order."""
    def ls(lid, pts, base):
        return Linestring(id=lid, points=[
            LaneletPoint(id=base + i, x=float(x), y=float(y))
            for i, (x, y) in enumerate(pts)])
    s_left = ls(1, [(x, 2.0) for x in range(0, 60, 10)], 100)
    s_right = ls(2, [(x, -2.0) for x in range(0, 60, 10)], 200)
    c_left = ls(3, [(0, 3), (10, 4), (20, 7), (30, 12)], 300)
    c_right = ls(4, [(0, -1), (10, 0), (20, 3), (30, 8)], 400)
    return LaneletMap(
        s_left.points + s_right.points + c_left.points + c_right.points,
        [s_left, s_right, c_left, c_right],
        [Lanelet(id=10, left_bound=s_left, right_bound=s_right),
         Lanelet(id=11, left_bound=c_left, right_bound=c_right)])


def _dist_stub(origin, h, w):
    return Grid2D(data=np.zeros((h, w, 1), np.float32),
                  origin=np.asarray(origin, np.float32), cell_size=0.4)


@pytest.mark.parametrize('make_map', [_straight_lanelet_map, _curved_map])
def test_native_matches_python_baker(make_map, monkeypatch):
    if _load_library() is None:
        pytest.skip('native toolchain unavailable')
    lm = make_map()
    origin = np.asarray([-3.0, -6.0])
    h, w = 50, 160
    native = bake_direction_native(lm, origin, 0.4, h, w, 1.0,
                                   DIRECTION_LAYERS)
    assert native is not None and native.shape == (h, w)

    # force the Python path for the oracle
    monkeypatch.setenv('TDS_NO_NATIVE', '1')
    import torchdrivesim_tpu.native as tn
    monkeypatch.setattr(tn, '_LIB', None)
    monkeypatch.setattr(tn, '_LIB_FAILED', False)
    py = _bake_direction(lm, _dist_stub(origin, h, w), 0.4, 1.0)
    pd = np.asarray(py.data)[..., 0]

    agree = (pd == native).mean()
    assert agree > 0.999, f'native vs python agreement {agree}'
    # any disagreement must be a +-1 quantization bin at a knife edge,
    # never a coverage (valid vs invalid) flip
    diff = pd != native
    if diff.any():
        a = pd[diff].view(np.uint32)
        b = native[diff].view(np.uint32)
        for shift in (0, 8, 16, 24):
            da = ((a >> shift) & 255).astype(int)
            db = ((b >> shift) & 255).astype(int)
            assert not ((da == 255) ^ (db == 255)).any(), 'coverage flip'
            delta = np.minimum(np.abs(da - db), 255 - np.abs(da - db))
            assert delta.max() <= 2, f'quantization delta {delta.max()}'


def test_bake_direction_uses_native_and_falls_back(monkeypatch):
    """_bake_direction must produce equivalent grids with the native path on
    and off (the wiring point in map_grids)."""
    lm = _straight_lanelet_map()
    dist = _dist_stub([-3.0, -6.0], 40, 160)
    with_native = _bake_direction(lm, dist, 0.4, 1.0)

    monkeypatch.setenv('TDS_NO_NATIVE', '1')
    import torchdrivesim_tpu.native as tn
    monkeypatch.setattr(tn, '_LIB', None)
    monkeypatch.setattr(tn, '_LIB_FAILED', False)
    python_only = _bake_direction(lm, dist, 0.4, 1.0)

    a = np.asarray(with_native.data)
    b = np.asarray(python_only.data)
    assert (a == b).mean() > 0.999
    assert with_native.cell_size == python_only.cell_size


def test_native_disabled_returns_none(monkeypatch):
    monkeypatch.setenv('TDS_NO_NATIVE', '1')
    import torchdrivesim_tpu.native as tn
    monkeypatch.setattr(tn, '_LIB', None)
    monkeypatch.setattr(tn, '_LIB_FAILED', False)
    lm = _straight_lanelet_map()
    assert bake_direction_native(lm, np.zeros(2), 0.4, 10, 10, 1.0,
                                 DIRECTION_LAYERS) is None
