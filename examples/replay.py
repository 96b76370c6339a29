"""
Replay an INTERACTION recording through the simulator
(counterpart of the reference `examples/replay.py`): all agents are NPCs
driven by the recorded trajectories; the ego view is rendered to a GIF.

Usage:
    python examples/replay.py --dataset-path /path/to/INTERACTION \
        --location DR_USA_Intersection_MA --map-mesh /path/to/mesh.json
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset-path', required=True)
    parser.add_argument('--location', default='DR_USA_Intersection_MA')
    parser.add_argument('--map-mesh', default=None,
                        help='serialized BirdviewMesh JSON for the location')
    parser.add_argument('--segment-length', type=int, default=40)
    parser.add_argument('--initial-frame', type=int, default=1)
    parser.add_argument('--res', type=int, default=256)
    parser.add_argument('--out', default='/tmp/replay.gif')
    args = parser.parse_args()

    import imageio
    import jax.numpy as jnp
    import numpy as np

    import torchdrivesim_tpu.kinematic as K
    from torchdrivesim_tpu.behavior.replay import ReplayController, interaction_replay
    from torchdrivesim_tpu.mesh import BirdviewMesh
    from torchdrivesim_tpu.rendering import JaxRendererConfig
    from torchdrivesim_tpu.simulator import Simulator, TorchDriveConfig
    from torchdrivesim_tpu.utils import Resolution

    attrs, states, present = interaction_replay(
        args.location, args.dataset_path,
        initial_frame=args.initial_frame, segment_length=args.segment_length)
    print(f"loaded {attrs.shape[1]} agents, {states.shape[2]} frames")

    # the first recorded agent becomes the (passive) ego; the rest replay
    ego_state = states[:, :1, 0]
    kin = K.TeleportingKinematicModel(dt=0.1)
    kin.set_state(ego_state)
    npc = ReplayController(npc_size=attrs[:, 1:, :2], npc_states=states[:, 1:],
                           npc_present_masks=present[:, 1:])

    if args.map_mesh and os.path.exists(args.map_mesh):
        road = BirdviewMesh.load(args.map_mesh)
    else:
        road = BirdviewMesh.empty(batch_size=1)
        print("no map mesh provided; rendering agents on a blank background")

    cfg = TorchDriveConfig()
    cfg.renderer = JaxRendererConfig()
    sim = Simulator(road_mesh=road, kinematic_model=kin,
                    agent_size=attrs[:, :1, :2],
                    initial_present_mask=present[:, :1, 0],
                    cfg=cfg, npc_controller=npc)
    sim.renderer.res = Resolution(args.res, args.res)
    sim.renderer.scale = 2.0 / 100

    frames = []
    for t in range(args.segment_length - 1):
        img = sim.render_egocentric()
        frames.append(np.asarray(jnp.transpose(img[0, 0], (1, 2, 0))).astype(np.uint8))
        # ego follows its own recording via teleport actions
        sim.step(states[:, :1, t + 1])
    imageio.mimwrite(args.out, frames, duration=0.1)
    print(f"wrote {len(frames)} frames to {args.out}")


if __name__ == '__main__':
    main()
