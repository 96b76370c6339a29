"""MapObservationNoiseFromLog: timestep-indexed replay of logged noisy map
observations (ref: `observation_noise.py:135-178`)."""
import numpy as np

from torchdrivesim_tpu.observation_noise import (
    MapObservationNoiseFromLog, MapObservationNoiseFromLogConfig,
    observation_noise_from_config)


class _FakeSim:
    def __init__(self, t):
        self.internal_time = t
        self.lane_features = 'live-lanes'
        self.road_mesh = 'live-road'
        self.traffic_controls = {'traffic_light': 'live-light'}

        class _Gen:
            background_mesh = 'live-bg'
        self.birdview_mesh_generator = _Gen()


def test_log_replay_indexes_by_timestep():
    noise = MapObservationNoiseFromLog(
        MapObservationNoiseFromLogConfig(),
        noisy_lane_features=['lanes0', 'lanes1'],
        noisy_background_mesh=['bg0', 'bg1'],
        noisy_traffic_controls=[{'traffic_light': 'l0'}],
        noisy_crosswalk_features=[('cw0',)])
    s0, s1, s9 = _FakeSim(0), _FakeSim(1), _FakeSim(9)
    assert noise.get_noisy_lane_features(s0) == 'lanes0'
    assert noise.get_noisy_lane_features(s1) == 'lanes1'
    # past the log horizon: fall back to the live value
    assert noise.get_noisy_lane_features(s9) == 'live-lanes'
    assert noise.get_noisy_background_mesh(s0) == 'bg0'
    assert noise.get_noisy_road_mesh(s1) == 'bg1'
    assert noise.get_noisy_traffic_controls(s0) == {'traffic_light': 'l0'}
    assert noise.get_noisy_traffic_controls(s1) == {'traffic_light': 'live-light'}
    assert noise.get_noisy_crosswalk_features(s0) == ('cw0',)
    assert noise.get_noisy_crosswalk_features(s1) is None


def test_factory_builds_log_replay():
    n = observation_noise_from_config(MapObservationNoiseFromLogConfig())
    assert isinstance(n, MapObservationNoiseFromLog)
