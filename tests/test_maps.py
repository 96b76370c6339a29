"""
Map QA (counterpart of the reference `tests/test_maps.py:6-12`): bundled
stoplines must not be oriented against their lanelet's direction.
"""
import pytest

from torchdrivesim_tpu.map import find_map_config, find_wrong_way_stoplines


@pytest.mark.integration
@pytest.mark.parametrize('map_name', ['carla_Town01', 'carla_Town02'])
def test_no_wrong_way_stoplines(map_name):
    cfg = find_map_config(map_name)
    if cfg is None or cfg.lanelet_map is None:
        pytest.skip(f'{map_name} assets unavailable')
    assert find_wrong_way_stoplines(cfg) == []
