"""
Scenario initialization demo (counterpart of the reference
`examples/initialize_simulation.py`): place agents on a map with the
heuristic initializer (or the Inverted AI INITIALIZE endpoint when
available) and render the initial frame.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--map', default='carla_Town02')
    parser.add_argument('--agents', type=int, default=10)
    parser.add_argument('--method', choices=['heuristic', 'iai'],
                        default='heuristic')
    parser.add_argument('--out', default='/tmp/initialized.png')
    args = parser.parse_args()

    import imageio
    import jax.numpy as jnp
    import numpy as np

    import torchdrivesim_tpu.kinematic as K
    from torchdrivesim_tpu.map import find_map_config, traffic_controls_from_map_config
    from torchdrivesim_tpu.rendering import JaxRendererConfig
    from torchdrivesim_tpu.simulator import Simulator, TorchDriveConfig
    from torchdrivesim_tpu.utils import Resolution

    cfg_map = find_map_config(args.map)
    if args.method == 'iai':
        from torchdrivesim_tpu.behavior.iai import iai_initialize
        attrs, states, _ = iai_initialize(cfg_map.iai_location_name, args.agents,
                                          center=cfg_map.center or (0, 0))
    else:
        from torchdrivesim_tpu.behavior.heuristic import heuristic_initialize
        attrs, states = heuristic_initialize(cfg_map.lanelet_map, args.agents)

    kin = K.KinematicBicycle(
        dt=0.1, left_handed=bool(cfg_map.left_handed_coordinates))
    kin.set_params(lr=attrs[..., 2])
    kin.set_state(states)
    cfg = TorchDriveConfig(
        left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
    cfg.renderer = JaxRendererConfig(
        left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
    sim = Simulator(road_mesh=cfg_map.road_mesh, kinematic_model=kin,
                    agent_size=attrs[..., :2],
                    initial_present_mask=jnp.ones((1, args.agents), dtype=bool),
                    cfg=cfg,
                    traffic_controls=traffic_controls_from_map_config(cfg_map))
    sim.renderer.res = Resolution(512, 512)
    center = np.asarray(sim.get_world_center())
    fov = 250.0
    img = sim.render(jnp.asarray(center), jnp.zeros((1, 1)), fov=fov,
                     res=Resolution(512, 512))
    imageio.imwrite(args.out,
                    np.asarray(jnp.transpose(img[0, 0], (1, 2, 0))).astype(np.uint8))
    print(f"initialized {args.agents} agents; wrote {args.out}")


if __name__ == '__main__':
    main()
