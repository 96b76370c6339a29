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


def test_logged_mesh_gets_default_colors_filled():
    """A logged background mesh missing color/z attributes is filled with the
    generator's defaults (ref: `observation_noise.py:156-157`)."""
    import jax.numpy as jnp
    from torchdrivesim_tpu.mesh import BaseMesh, BirdviewMesh

    bare = BirdviewMesh.set_properties(
        BaseMesh(verts=jnp.zeros((1, 3, 2)),
                 faces=jnp.asarray([[[0, 1, 2]]])),
        category='road')           # no color, no z
    assert 'road' not in bare.colors and 'road' not in bare.zs

    sim = _FakeSim(0)
    sim.birdview_mesh_generator.color_map = {'road': (155, 155, 155)}
    sim.birdview_mesh_generator.rendering_levels = {'road': 15.0}
    noise = MapObservationNoiseFromLog(
        MapObservationNoiseFromLogConfig(), noisy_background_mesh=[bare])
    filled = noise.get_noisy_background_mesh(sim)
    assert isinstance(filled, BirdviewMesh)
    assert float(filled.zs['road']) == 15.0
    np.testing.assert_allclose(np.asarray(filled.colors['road']),
                               np.asarray([155, 155, 155]) / 255.0, atol=1e-6)
    # already-set attributes are preserved, not overwritten
    pre = BirdviewMesh.set_properties(
        BaseMesh(verts=jnp.zeros((1, 3, 2)),
                 faces=jnp.asarray([[[0, 1, 2]]])),
        category='road', color=(1, 2, 3), z=4.0)
    noise2 = MapObservationNoiseFromLog(
        MapObservationNoiseFromLogConfig(), noisy_background_mesh=[pre])
    kept = noise2.get_noisy_background_mesh(sim)
    np.testing.assert_allclose(np.asarray(kept.colors['road']),
                               np.asarray([1, 2, 3]) / 255.0, atol=1e-6)
    assert float(kept.zs['road']) == 4.0
