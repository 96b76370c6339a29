"""
INTERACTION Dataset v1.2 loading (torchdrivesim_tpu/behavior/interaction.py,
ref: examples/imitation_learning.py:46-189) against a generated fixture:
two locations, mixed vehicle/pedestrian cases, missing pedestrian columns.
"""
import os

import numpy as np
import pytest

from torchdrivesim_tpu.behavior.interaction import INTERACTIONDataset

M_PER_DEG = 111319.49


def _write_osm(path, y_left=4.0, y_right=-4.0):
    nodes, ways = [], []
    nid = 1
    for wid, ys in ((100, y_left), (200, y_right)):
        refs = []
        for i, x in enumerate(range(0, 60, 10)):
            nodes.append(
                f'<node id="{nid}" lat="{ys / M_PER_DEG:.10f}" '
                f'lon="{x / M_PER_DEG:.10f}"/>')
            refs.append(f'<nd ref="{nid}"/>')
            nid += 1
        ways.append(f'<way id="{wid}">{"".join(refs)}</way>')
    rel = ('<relation id="1"><tag k="type" v="lanelet"/>'
           '<member type="way" role="left" ref="100"/>'
           '<member type="way" role="right" ref="200"/></relation>')
    with open(path, 'w') as f:
        f.write('<?xml version="1.0"?><osm>'
                + ''.join(nodes) + ''.join(ways) + rel + '</osm>')


def _write_case_rows(rows, case_id, track_id, agent_type, n_frames,
                     x0=10.0, psi=0.1, missing_cols=False):
    for f in range(1, n_frames + 1):
        rows.append({
            'case_id': case_id, 'track_id': track_id, 'frame_id': f,
            'timestamp_ms': f * 100, 'agent_type': agent_type,
            'x': x0 + 0.3 * f, 'y': 1.0 * track_id,
            'vx': 3.0, 'vy': 4.0,
            'psi_rad': '' if missing_cols else psi,
            'length': '' if missing_cols else 4.6,
            'width': '' if missing_cols else 2.0,
        })


@pytest.fixture
def dataset_root(tmp_path):
    import pandas as pd
    os.makedirs(tmp_path / 'maps')
    os.makedirs(tmp_path / 'train')
    for loc in ('locA', 'locB'):
        _write_osm(tmp_path / 'maps' / f'{loc}.osm')
    rows = []
    # locA case 1: two full vehicle tracks + one partial pedestrian
    _write_case_rows(rows, 1, 1, 'car', 40)
    _write_case_rows(rows, 1, 2, 'vehicle', 40, x0=20.0)
    _write_case_rows(rows, 1, 3, 'pedestrian/bicycle', 25, missing_cols=True)
    # locA case 2: one full vehicle + one short vehicle (not ego-eligible)
    _write_case_rows(rows, 2, 1, 'vehicle', 40)
    _write_case_rows(rows, 2, 4, 'vehicle', 12, x0=30.0)
    pd.DataFrame(rows).to_csv(tmp_path / 'train' / 'locA_train.csv',
                              index=False)
    rows = []
    _write_case_rows(rows, 1, 7, 'car', 40)
    pd.DataFrame(rows).to_csv(tmp_path / 'train' / 'locB_train.csv',
                              index=False)
    return str(tmp_path)


def test_segments_enumerate_full_vehicle_tracks(dataset_root):
    ds = INTERACTIONDataset(dataset_root)
    # locA: case1 -> egos {1, 2}; case2 -> ego {1} (track 4 too short,
    # pedestrian not eligible); locB: case1 -> ego {7}
    assert len(ds) == 4
    assert ds.location_names == ['locA', 'locB']


def test_item_layout_and_fills(dataset_root):
    ds = INTERACTIONDataset(dataset_root)
    # segment with ego track 2 of locA case 1: ego must come FIRST
    seg_idx = next(i for i, s in enumerate(ds.idx2segment)
                   if s['location'] == 'locA' and s['ego_track_id'] == 2)
    item = ds[seg_idx]
    assert item['agent_states'].shape == (3, 40, 4)
    assert item['present_mask'].shape == (3, 40)
    np.testing.assert_array_equal(item['agent_types'], [0, 0, 1])
    # ego (track 2) first: x starts at 20.3
    np.testing.assert_allclose(item['agent_states'][0, 0, 0], 20.3, atol=1e-5)
    # speed = hypot(vx, vy) = 5
    np.testing.assert_allclose(item['agent_states'][0, :, 3], 5.0, atol=1e-5)
    # pedestrian: present only 25 frames, reference fills (psi 0, 1.5 x 1.5)
    assert item['present_mask'][2].sum() == 25
    np.testing.assert_allclose(item['agent_attributes'][2], [1.5, 1.5])
    np.testing.assert_allclose(item['agent_states'][2, 0, 2], 0.0)
    assert item['road_mesh'].faces.shape[-2] > 0


def test_collate_pads_per_type_and_collates_meshes(dataset_root):
    ds = INTERACTIONDataset(dataset_root)
    a = next(i for i, s in enumerate(ds.idx2segment)
             if s['location'] == 'locA' and s['case_id'] == 1)
    b = next(i for i, s in enumerate(ds.idx2segment)
             if s['location'] == 'locB')
    batch = INTERACTIONDataset.collate([ds[a], ds[b]])
    # max vehicles = 2 (locA), max pedestrians = 1 (locA) -> A = 3
    assert batch['agent_states'].shape == (2, 3, 40, 4)
    assert batch['present_mask'].shape == (2, 3, 40)
    np.testing.assert_array_equal(np.asarray(batch['agent_types']), [0, 0, 1])
    # locB has one vehicle: its pad slots are absent everywhere
    assert not np.asarray(batch['present_mask'])[1, 1:].any()
    assert batch['road_mesh'].batch_size == 2
    assert batch['location'] == ['locA', 'locB']


def test_subsample(dataset_root):
    ds = INTERACTIONDataset(dataset_root).subsample(num_segments=2, seed=0)
    assert len(ds) == 2
