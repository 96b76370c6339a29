"""
INTERACTION Dataset v1.2 loading for imitation learning
(counterpart of the reference `examples/imitation_learning.py:46-189`,
promoted into the library so training scripts share one implementation).

A dataset root is laid out as::

    {root}/maps/{location}.osm
    {root}/{split}/{location}_{split}.csv   # case_id / track_id / frame_id rows

Each dataset item is one 40-frame case centered on a vehicle ego track:
dense padded state tensors plus the location's road and lane-marking meshes
(built by our pure-Python lanelet2 ingestion -- no C++ dependency).
``collate`` pads per agent type across the batch and mesh-collates the
per-location meshes, so one batch can mix locations.
"""
import os
from typing import Dict, List, Optional

import numpy as np

from torchdrivesim_tpu.lanelet2 import (
    lanelet_map_to_lane_mesh, load_lanelet_map, road_mesh_from_lanelet_map,
)
from torchdrivesim_tpu.mesh import BirdviewMesh

#: dataset agent types, in tensor order (ref: examples/imitation_learning.py:48)
AGENT_TYPE_NAMES = ['vehicle', 'pedestrian']


class INTERACTIONDataset:
    """
    Map-style dataset of 40-frame ego-centric cases
    (ref: `examples/imitation_learning.py:46-160`). Pedestrian rows with
    missing psi/length/width are filled like the reference (0 / 1.5 / 1.5);
    'car' and 'pedestrian/bicycle' types normalize to 'vehicle' and
    'pedestrian'.
    """
    agent_type_names = AGENT_TYPE_NAMES

    def __init__(self, dataset_path: str,
                 location_names: Optional[List[str]] = None,
                 split: str = 'train'):
        import pandas as pd
        self.split = split
        self.location_names: List[str] = []
        self.road_meshes: Dict[str, BirdviewMesh] = {}
        self.lane_meshes: Dict[str, BirdviewMesh] = {}
        suffix = f'_{split}.csv'
        for fname in sorted(os.listdir(os.path.join(dataset_path, split))):
            if not fname.endswith(suffix):
                continue
            name = fname[:-len(suffix)]
            if location_names is not None and name not in location_names:
                continue
            self.location_names.append(name)
            lanelet_map = load_lanelet_map(
                os.path.join(dataset_path, 'maps', name + '.osm'))
            self.road_meshes[name] = BirdviewMesh.set_properties(
                road_mesh_from_lanelet_map(lanelet_map), 'road')
            self.lane_meshes[name] = lanelet_map_to_lane_mesh(lanelet_map)

        self.idx2segment = []
        self.recording_dfs = []
        for location in self.location_names:
            df = pd.read_csv(
                os.path.join(dataset_path, split, location + suffix))
            df['psi_rad'] = df['psi_rad'].fillna(0)
            df['length'] = df['length'].fillna(1.5)
            df['width'] = df['width'].fillna(1.5)
            df.loc[df['agent_type'] == 'car', 'agent_type'] = 'vehicle'
            df.loc[df['agent_type'] == 'pedestrian/bicycle',
                   'agent_type'] = 'pedestrian'
            self.recording_dfs.append(df)
            for case_id in df['case_id'].unique():
                case_df = df[df['case_id'] == case_id]
                for track_id in case_df['track_id'].unique():
                    track_df = case_df[case_df['track_id'] == track_id]
                    # egos are full-length vehicle tracks (ref line 88)
                    if (track_df['agent_type'].iloc[0] != 'vehicle'
                            or len(track_df) != 40):
                        continue
                    self.idx2segment.append({
                        'location': location,
                        'recording_idx': len(self.recording_dfs) - 1,
                        'case_id': case_id,
                        'ego_track_id': track_id,
                    })

    def subsample(self, num_segments: int = 50, seed: int = 0
                  ) -> "INTERACTIONDataset":
        rng = np.random.default_rng(seed=seed)
        num_segments = min(num_segments, len(self))
        inds = set(rng.choice(len(self), num_segments, replace=False).tolist())
        self.idx2segment = [s for i, s in enumerate(self.idx2segment)
                            if i in inds]
        return self

    def __len__(self) -> int:
        return len(self.idx2segment)

    def __getitem__(self, idx: int) -> dict:
        seg = self.idx2segment[idx]
        df = self.recording_dfs[seg['recording_idx']]
        case = df[df['case_id'] == seg['case_id']]
        frame_ids = sorted(case['frame_id'].unique())
        t = len(frame_ids)
        frame_index = {f: i for i, f in enumerate(frame_ids)}

        # agent order: ego first, then other vehicles, then pedestrians
        # (the reference's role-then-type sort, lines 112-122)
        agent_ids, agent_types = [], []
        for type_i, type_name in enumerate(self.agent_type_names):
            ids = list(case[case['agent_type'] == type_name]
                       ['track_id'].unique())
            if type_name == 'vehicle':
                ids = ([seg['ego_track_id']]
                       + [i for i in ids if i != seg['ego_track_id']])
            agent_ids += ids
            agent_types += [type_i] * len(ids)
        a = len(agent_ids)
        id_index = {aid: i for i, aid in enumerate(agent_ids)}

        states = np.zeros((a, t, 4), dtype=np.float32)
        present = np.zeros((a, t), dtype=bool)
        attrs = np.zeros((a, 2), dtype=np.float32)
        ai = case['track_id'].map(id_index).to_numpy()
        ti = case['frame_id'].map(frame_index).to_numpy()
        states[ai, ti, 0] = case['x'].to_numpy()
        states[ai, ti, 1] = case['y'].to_numpy()
        states[ai, ti, 2] = case['psi_rad'].to_numpy()
        states[ai, ti, 3] = np.hypot(case['vx'].to_numpy(),
                                     case['vy'].to_numpy())
        present[ai, ti] = True
        attrs[ai, 0] = case['length'].to_numpy()
        attrs[ai, 1] = case['width'].to_numpy()

        return {
            'agent_attributes': attrs,
            'agent_states': states,
            'present_mask': present,
            'agent_types': np.asarray(agent_types, dtype=np.int32),
            'location': seg['location'],
            'road_mesh': self.road_meshes[seg['location']],
            'lane_mesh': self.lane_meshes[seg['location']],
        }

    @classmethod
    def collate(cls, items: List[dict]) -> dict:
        """
        Batch items (ref: `examples/imitation_learning.py:168-189`): agent
        tensors pad PER TYPE to the per-type max count and concatenate along
        the agent axis (so type blocks stay contiguous and
        ``batch['agent_types']`` is shared across the batch); per-location
        meshes collate into one padded batch mesh.
        """
        import jax.numpy as jnp
        n_types = len(cls.agent_type_names)
        max_per_type = [
            max(int((item['agent_types'] == i).sum()) for item in items)
            for i in range(n_types)]

        def pad_cat(key):
            rows = []
            for item in items:
                blocks = []
                arr = item[key]
                for i in range(n_types):
                    block = arr[item['agent_types'] == i]
                    pad = max_per_type[i] - block.shape[0]
                    if pad:
                        block = np.concatenate(
                            [block, np.zeros((pad,) + block.shape[1:],
                                             block.dtype)], axis=0)
                    blocks.append(block)
                rows.append(np.concatenate(blocks, axis=0))
            return jnp.asarray(np.stack(rows, axis=0))

        batch = {k: pad_cat(k)
                 for k in ('agent_attributes', 'agent_states', 'present_mask')}
        batch['agent_types'] = jnp.asarray(np.concatenate(
            [np.full(max_per_type[i], i, np.int32) for i in range(n_types)]))
        batch['road_mesh'] = BirdviewMesh.collate(
            [item['road_mesh'] for item in items])
        batch['lane_mesh'] = BirdviewMesh.collate(
            [item['lane_mesh'] for item in items])
        batch['location'] = [item['location'] for item in items]
        return batch
