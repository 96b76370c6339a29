"""
Replay NPCs from the INTERACTION dataset
(semantics of `torchdrivesim/behavior/replay.py`): CSV track files become
dense padded BxAxTx4 state tensors with present masks, consumed by
``ReplayController`` which indexes them by time inside the jitted step.
"""
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.behavior.common import InitializationFailedError
from torchdrivesim_tpu.simulator import ReplayController  # re-export  # noqa: F401

REAR_OFFSET = 1.4  #: fixed rear-axis offset assumed for dataset vehicles


def interaction_replay(location: str, dataset_path: str, initial_frame: int = 1,
                       segment_length: int = 40, recording: int = 0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Load an INTERACTION recording segment as dense tensors.

    Returns:
        (agent_attributes 1xAx3 (length, width, rear_offset),
         agent_states 1xAxTx4 (x, y, psi, speed),
         present_mask 1xAxT bool).
    """
    import pandas as pd
    recording_path = os.path.join(
        dataset_path, 'recorded_trackfiles', location,
        'vehicle_tracks_{:03d}.csv'.format(recording))
    df = pd.read_csv(recording_path)
    final_frame = initial_frame + segment_length - 1
    available = set(df.frame_id.unique())
    for frame in (initial_frame, final_frame):
        if frame not in available:
            raise InitializationFailedError(
                f'Frame {frame} not available in {recording_path}')
    df = df[(df.frame_id >= initial_frame) & (df.frame_id <= final_frame)]
    agent_ids = sorted(df.track_id.unique())
    frame_ids = sorted(df.frame_id.unique())
    a, t = len(agent_ids), len(frame_ids)
    id_index = {aid: i for i, aid in enumerate(agent_ids)}
    frame_index = {fid: i for i, fid in enumerate(frame_ids)}

    states = np.zeros((a, t, 4), dtype=np.float32)
    present = np.zeros((a, t), dtype=bool)
    attrs = np.zeros((a, 3), dtype=np.float32)
    attr_counts = np.zeros((a,), dtype=np.int64)
    ai = df.track_id.map(id_index).to_numpy()
    ti = df.frame_id.map(frame_index).to_numpy()
    states[ai, ti, 0] = df.x.to_numpy()
    states[ai, ti, 1] = df.y.to_numpy()
    states[ai, ti, 2] = df.psi_rad.to_numpy()
    states[ai, ti, 3] = np.hypot(df.vx.to_numpy(), df.vy.to_numpy())
    present[ai, ti] = True
    np.add.at(attrs, ai, np.stack([
        df.length.to_numpy(), df.width.to_numpy(),
        np.full(len(df), REAR_OFFSET)], axis=-1))
    np.add.at(attr_counts, ai, 1)
    attrs = attrs / np.maximum(attr_counts, 1)[:, None]

    return (jnp.asarray(attrs)[None], jnp.asarray(states)[None],
            jnp.asarray(present)[None])
