"""
Behavior cloning through the differentiable simulator
(counterpart of the reference `examples/imitation_learning.py`).

The training loss is the MSE between ground-truth trajectories and states
produced by rolling the policy through the simulator: gradients flow through
T kinematic steps AND T differentiable BEV renders in one `jax.lax.scan`
(the reference's BPTT hot loop, `imitation_learning.py:279-347`). With
``--synthetic`` a lane-following expert on a synthetic straight-road map is
used instead of the INTERACTION dataset, so the example runs out of the box.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import torchdrivesim_tpu.kinematic as K
from torchdrivesim_tpu.models import BirdviewCNNPolicy
from torchdrivesim_tpu.rendering import JaxRendererConfig
from torchdrivesim_tpu.rendering.base import Cameras
from torchdrivesim_tpu.simulator import Simulator, TorchDriveConfig
from torchdrivesim_tpu.utils import Resolution, il_remat_policy


def build_synthetic_batch(batch_size: int, horizon: int, seed: int = 0):
    """Synthetic straight-road scenario + lane-keeping expert trajectories."""
    from torchdrivesim_tpu.lanelet2 import (
        Lanelet, LaneletMap, LaneletPoint, Linestring, road_mesh_from_lanelet_map)
    from torchdrivesim_tpu.mesh import BirdviewMesh

    def ls(lid, ys, base):
        return Linestring(id=lid, points=[
            LaneletPoint(id=base + i, x=float(x), y=ys)
            for i, x in enumerate(range(0, 220, 10))])
    left, right = ls(1, 4.0, 100), ls(2, -4.0, 200)
    lanelet_map = LaneletMap(left.points + right.points, [left, right],
                             [Lanelet(id=1, left_bound=left, right_bound=right)])
    road = BirdviewMesh.set_properties(
        road_mesh_from_lanelet_map(lanelet_map), 'road')
    road = BirdviewMesh.collate([road] * batch_size)

    rng = np.random.RandomState(seed)
    x0 = rng.uniform(5, 40, (batch_size, 1))
    y0 = rng.uniform(-2.0, 2.0, (batch_size, 1))
    v0 = rng.uniform(3, 7, (batch_size, 1))
    states0 = np.concatenate([x0, y0, np.zeros_like(x0), v0],
                             axis=-1)[:, None, :]  # B x A=1 x 4

    # expert: drive straight at constant speed while centering on y=0
    traj = np.zeros((horizon, batch_size, 1, 4), np.float32)
    s = states0.copy()
    for t in range(horizon):
        s = s.copy()
        s[..., 0] += s[..., 3] * 0.1
        s[..., 1] *= 0.9  # exponential pull toward the lane center
        traj[t] = s
    return road, jnp.asarray(states0, jnp.float32), jnp.asarray(traj)


def make_bc_train_step(sim, policy, tx, res: int, teacher_forcing: bool = False):
    """
    Build the jitted BC training step: gradients flow through T kinematic
    steps AND T differentiable BEV renders in one ``jax.lax.scan`` (the
    reference's BPTT hot loop, `imitation_learning.py:279-347`).

    Returns ``train_step(params, opt_state, state0, expert) ->
    (params, opt_state, loss)`` where ``expert`` is (T, B, A, 4).
    """
    gen = sim.birdview_mesh_generator
    renderer = sim.renderer

    def render_ego(state):
        all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
        present = jnp.concatenate([state.present_mask, state.npc_present_mask], -1)
        mesh = gen.generate(1, agent_state=all_state[:, None],
                            present_mask=present[:, None],
                            include_background=True)
        ego = state.agent_state[:, 0]
        cam_xy = ego[:, :2]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        return renderer.render_rgb_mesh_chw(
            mesh, Resolution(res, res),
            Cameras(cam_xy, cam_sc, renderer.scale))

    def loss_fn(params, state0, expert):
        # rematerialize each step on the backward pass: live activations for
        # the whole horizon (render + CNN) can exceed HBM on long rollouts
        @functools.partial(jax.checkpoint, policy=il_remat_policy())
        def body(state, target):
            image = render_ego(state)
            action = policy.apply(params, image)[:, None, :]  # B x 1 x Ac
            state = sim.functional_step(state, action)
            pred = state.agent_state
            if teacher_forcing:
                state = state.replace(agent_state=target)
            return state, pred
        _, preds = jax.lax.scan(body, state0, expert)
        return jnp.mean((preds[..., :2] - expert[..., :2]) ** 2)

    @jax.jit
    def train_step(params, opt_state, state0, expert):
        loss, grads = jax.value_and_grad(loss_fn)(params, state0, expert)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--synthetic', action='store_true', default=True)
    parser.add_argument('--dataset-path', default=None,
                        help='INTERACTION dataset root (uses real replays)')
    parser.add_argument('--location', default='DR_USA_Intersection_MA')
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--horizon', type=int, default=10)
    parser.add_argument('--res', type=int, default=64)
    parser.add_argument('--steps', type=int, default=30)
    parser.add_argument('--lr', type=float, default=3e-4)
    parser.add_argument('--teacher-forcing', action='store_true')
    args = parser.parse_args()

    npc_controller = None
    if args.dataset_path:
        # INTERACTION v1.2 cases: ego = each case's full vehicle track
        # (controlled), the rest replay their recordings as NPCs (the
        # reference's ego_only_simulator design, `imitation_learning.py:235`);
        # per-location road meshes collate into one padded batch mesh, so a
        # batch can mix locations (`imitation_learning.py:168-189`)
        from torchdrivesim_tpu.behavior.interaction import INTERACTIONDataset
        from torchdrivesim_tpu.behavior.replay import ReplayController
        ds = INTERACTIONDataset(
            args.dataset_path,
            location_names=[args.location] if args.location else None)
        ds.subsample(num_segments=args.batch, seed=0)
        batch = INTERACTIONDataset.collate([ds[i] for i in range(len(ds))])
        gt = batch['agent_states']                          # B x A x T x 4
        present = batch['present_mask']
        b = gt.shape[0]
        args.horizon = min(args.horizon, gt.shape[2] - 1)
        states0 = gt[:, :1, 0]                              # B x 1 x 4
        expert_traj = jnp.transpose(
            gt[:, 0, 1:args.horizon + 1], (1, 0, 2))[:, :, None]
        npc_controller = ReplayController(
            npc_size=batch['agent_attributes'][:, 1:, :2],
            npc_states=gt[:, 1:], npc_present_masks=present[:, 1:])
        road = batch['road_mesh']
    else:
        road, states0, expert_traj = build_synthetic_batch(args.batch,
                                                           args.horizon)
        b = args.batch

    kin = K.SimpleKinematicModel(dt=0.1)
    kin.set_state(states0)
    cfg = TorchDriveConfig()
    cfg.renderer = JaxRendererConfig(differentiable=True)  # soft rasterizer
    sim = Simulator(road_mesh=road, kinematic_model=kin,
                    agent_size=jnp.tile(jnp.asarray([[[4.6, 2.0]]]), (b, 1, 1)),
                    initial_present_mask=jnp.ones((b, 1), dtype=bool), cfg=cfg,
                    npc_controller=npc_controller)
    sim.renderer.res = Resolution(args.res, args.res)
    sim.renderer.scale = 2.0 / 35

    policy = BirdviewCNNPolicy(action_size=4, features=(16, 32))
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, args.res, args.res)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    train_step = make_bc_train_step(sim, policy, tx, args.res,
                                    teacher_forcing=args.teacher_forcing)

    state0 = sim.state
    for step in range(args.steps):
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(params, opt_state, state0,
                                             expert_traj)
        loss = float(loss)
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step}: BC loss {loss:.4f}"
                  f" ({(time.perf_counter()-t0)*1000:.0f} ms)")
    print("done")


if __name__ == '__main__':
    main()
