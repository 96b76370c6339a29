#!/usr/bin/env python
"""
Scenario rollout demo (counterpart of the reference `examples/simulate.py`):
initialize vehicles on a CARLA town, roll the simulator forward, and save an
egocentric bird's-eye-view GIF.

Usage:
    python examples/simulate.py --map carla_Town02 --agents 8 --steps 80 \
        --out /tmp/simulate.gif
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--map', default='carla_Town02')
    parser.add_argument('--agents', type=int, default=8)
    parser.add_argument('--steps', type=int, default=80)
    parser.add_argument('--res', type=int, default=256)
    parser.add_argument('--fov', type=float, default=80.0)
    parser.add_argument('--out', default='/tmp/simulate.gif')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    import random

    import imageio
    import jax.numpy as jnp
    import numpy as np

    import torchdrivesim_tpu.kinematic as K
    from torchdrivesim_tpu.behavior.heuristic import heuristic_initialize
    from torchdrivesim_tpu.benchmark import load_or_bake_texture
    from torchdrivesim_tpu.map import find_map_config, traffic_controls_from_map_config
    from torchdrivesim_tpu.rendering import JaxRendererConfig
    from torchdrivesim_tpu.simulator import Simulator, TorchDriveConfig
    from torchdrivesim_tpu.traffic_lights import BakedLightSchedule
    from torchdrivesim_tpu.utils import Resolution

    random.seed(args.seed)
    cfg_map = find_map_config(args.map)
    if cfg_map is None:
        raise SystemExit(f"map {args.map} not found")
    mesh = cfg_map.road_mesh
    lanelet_map = cfg_map.lanelet_map
    if lanelet_map is None:
        raise SystemExit(f"map {args.map} has no OSM data for initialization")
    controls = traffic_controls_from_map_config(cfg_map)

    attrs, states = heuristic_initialize(lanelet_map, args.agents,
                                         min_speed=1, max_speed=7)
    kin = K.KinematicBicycle(dt=0.1,
                             left_handed=bool(cfg_map.left_handed_coordinates))
    kin.set_params(lr=attrs[..., 2])
    kin.set_state(states)

    cfg = TorchDriveConfig(
        left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
    cfg.renderer = JaxRendererConfig(
        left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
    sim = Simulator(road_mesh=mesh, kinematic_model=kin,
                    agent_size=attrs[..., :2],
                    initial_present_mask=jnp.ones((1, args.agents), dtype=bool),
                    cfg=cfg, traffic_controls=controls,
                    map_grids=cfg_map.grids())
    sim.renderer.res = Resolution(args.res, args.res)
    sim.renderer.scale = 2.0 / args.fov
    sim.renderer.background_texture = load_or_bake_texture(
        cfg_map, sim.renderer.color_map, sim.renderer.rendering_levels)

    controller = cfg_map.traffic_light_controller
    if controller is not None and 'traffic_light' in controls:
        # FSM-driven lights: the schedule plugs into the simulator's own
        # control advance (replay -> schedule -> hold); step()/render()/
        # violations all see it with no per-step wiring
        sim.set_light_schedule(BakedLightSchedule(
            controller, controls['traffic_light'].actor_ids))

    frames = []
    for t in range(args.steps):
        img = sim.render_egocentric()
        frames.append(np.asarray(
            jnp.transpose(img[0, 0], (1, 2, 0))).astype(np.uint8))
        # steady cruising with mild steering noise
        action = jnp.asarray(
            np.random.RandomState(t).uniform(-0.02, 0.02, (1, args.agents, 2)),
            dtype=jnp.float32)
        sim.step(action)
        if t % 20 == 0:
            off = float(sim.compute_offroad().sum())
            col = float(sim.compute_collision().sum())
            print(f"t={t}: offroad={off:.2f} collision={col:.2f}")

    imageio.mimwrite(args.out, frames, duration=0.1)
    print(f"wrote {len(frames)} frames to {args.out}")


if __name__ == '__main__':
    main()
