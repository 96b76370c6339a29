"""
Gym-style single-agent driving environment
(counterpart of the reference `examples/gym_env.py`).

Self-contained Gymnasium-like API (``reset`` / ``step`` / ``render``) with no
dependency on the gym package (not available in this image); the class is
duck-type compatible with gymnasium's core loop. For massively parallel
on-device training use :class:`VectorizedGymEnv`, which keeps B environments
as one batched simulator and exposes pure functional transitions.
"""
import os
import sys
from dataclasses import dataclass
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import torchdrivesim_tpu.kinematic as K
from torchdrivesim_tpu.simulator import Simulator, TorchDriveConfig
from torchdrivesim_tpu.utils import Resolution


@dataclass
class GymEnvConfig:
    map_name: str = 'carla_Town02'
    agent_count: int = 6
    res: int = 64
    fov: float = 35.0
    max_steps: int = 200
    offroad_penalty: float = 1.0
    collision_penalty: float = 10.0
    wrong_way_penalty: float = 0.5
    speed_reward: float = 0.1
    use_background_texture: bool = True
    seed: int = 0


class GymEnv:
    """
    Single-ego environment over a shared multi-agent simulator: agent 0 is
    the ego; the rest follow their initial velocity. Reward shaping mirrors
    the reference RL example (`examples/gym_env.py:209-218`): forward speed
    minus infraction penalties.
    """
    def __init__(self, cfg: GymEnvConfig = GymEnvConfig()):
        self.cfg = cfg
        self._sim_template = self._build_sim()
        self.sim: Optional[Simulator] = None
        self.t = 0
        self.action_size = 2

    def _build_sim(self) -> Simulator:
        import random
        from torchdrivesim_tpu.behavior.heuristic import heuristic_initialize
        from torchdrivesim_tpu.benchmark import load_or_bake_texture
        from torchdrivesim_tpu.map import (
            find_map_config, traffic_controls_from_map_config)
        from torchdrivesim_tpu.rendering import JaxRendererConfig

        random.seed(self.cfg.seed)
        cfg_map = find_map_config(self.cfg.map_name)
        lanelet_map = cfg_map.lanelet_map
        attrs, states = heuristic_initialize(
            lanelet_map, self.cfg.agent_count, min_speed=1, max_speed=6)
        kin = K.BicycleNoReversing(
            dt=0.1, left_handed=bool(cfg_map.left_handed_coordinates))
        kin.set_params(lr=attrs[..., 2])
        kin.set_state(states)
        cfg = TorchDriveConfig(
            left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
        cfg.renderer = JaxRendererConfig(
            left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
        sim = Simulator(
            road_mesh=cfg_map.road_mesh, kinematic_model=kin,
            agent_size=attrs[..., :2],
            initial_present_mask=jnp.ones((1, self.cfg.agent_count), dtype=bool),
            cfg=cfg, traffic_controls=traffic_controls_from_map_config(cfg_map),
            map_grids=cfg_map.grids())
        sim.renderer.res = Resolution(self.cfg.res, self.cfg.res)
        sim.renderer.scale = 2.0 / self.cfg.fov
        if self.cfg.use_background_texture:
            sim.renderer.background_texture = load_or_bake_texture(
                cfg_map, sim.renderer.color_map, sim.renderer.rendering_levels)
        return sim

    def reset(self, seed: Optional[int] = None):
        """Snapshot-based reset, like the reference's `Simulator.copy()` use
        (`examples/gym_env.py:68-77`)."""
        self.sim = self._sim_template.copy()
        self.t = 0
        return self._observe(), {}

    def _observe(self) -> np.ndarray:
        img = self.sim.render_egocentric()
        return np.asarray(img[0, 0])  # ego view, CxHxW in [0, 255]

    def step(self, action):
        assert self.sim is not None, "call reset() first"
        full_action = jnp.zeros((1, self.cfg.agent_count, 2))
        full_action = full_action.at[0, 0].set(jnp.asarray(action))
        self.prev_action = jnp.asarray(action)
        self.sim.step(full_action)
        self.t += 1
        info = {'offroad': float(self.sim.compute_offroad()[0, 0]),
                'collision': float(self.sim.compute_collision()[0, 0]),
                'wrong_way': float(self.sim.compute_wrong_way()[0, 0]),
                'speed': float(self.sim.get_state()[0, 0, 3])}
        reward = self.get_reward(info)
        terminated = info['collision'] > 0
        truncated = self.t >= self.cfg.max_steps
        return self._observe(), reward, terminated, truncated, info

    def get_reward(self, info) -> float:
        """Reward hook (ref: `examples/gym_env.py:108-118`): forward speed
        minus infraction penalties."""
        return (self.cfg.speed_reward * info['speed']
                - self.cfg.offroad_penalty * info['offroad']
                - self.cfg.collision_penalty * info['collision']
                - self.cfg.wrong_way_penalty * info['wrong_way'])

    def render(self):
        return self._observe()

    def close(self):
        self.sim = None


class IAIGymEnv(GymEnv):
    """
    Driving environment with background traffic animated by the Inverted AI
    API (counterpart of the reference `examples/gym_env.py:153-219`): the
    ego is a kinematic-bicycle agent; every other vehicle is an NPC driven
    by the remote DRIVE endpoint between jitted segments
    (:class:`~torchdrivesim_tpu.behavior.iai.IAINPCController`). Resets
    reuse the same initial conditions with fresh NPC behaviors.
    """
    def __init__(self, cfg: GymEnvConfig = GymEnvConfig()):
        self.cfg = cfg
        self._sim_template = self._build_iai_sim()
        self.sim: Optional[Simulator] = None
        self.t = 0
        self.action_size = 2
        self.prev_action = jnp.zeros(2)

    def _build_iai_sim(self) -> Simulator:
        from torchdrivesim_tpu.behavior.iai import (
            IAINPCController, iai_initialize)
        from torchdrivesim_tpu.benchmark import load_or_bake_texture
        from torchdrivesim_tpu.map import find_map_config
        from torchdrivesim_tpu.rendering import JaxRendererConfig

        cfg_map = find_map_config(self.cfg.map_name)
        if cfg_map is None:
            raise RuntimeError(f"Map {self.cfg.map_name} not found")
        location = cfg_map.iai_location_name
        attrs, states, recurrent = iai_initialize(
            location=location, agent_count=self.cfg.agent_count,
            center=tuple(np.asarray(cfg_map.center)))
        # agent 0 is the ego; the rest are IAI-driven NPCs
        ego_attrs, npc_attrs = attrs[:, :1], attrs[:, 1:]
        ego_states, npc_states = states[:, :1], states[:, 1:]

        kin = K.KinematicBicycle(
            dt=0.1, left_handed=bool(cfg_map.left_handed_coordinates))
        kin.set_params(lr=ego_attrs[..., 2])
        kin.set_state(ego_states)
        npc = IAINPCController(
            npc_size=npc_attrs[..., :2], npc_state=npc_states,
            location=location, recurrent_states=recurrent,
            npc_present_mask=jnp.ones_like(npc_states[..., 0], dtype=bool),
            agent_type_names=['vehicle'])
        cfg = TorchDriveConfig(
            left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
        cfg.renderer = JaxRendererConfig(
            left_handed_coordinates=bool(cfg_map.left_handed_coordinates))
        sim = Simulator(
            road_mesh=cfg_map.road_mesh, kinematic_model=kin,
            agent_size=ego_attrs[..., :2],
            initial_present_mask=jnp.ones((1, 1), dtype=bool),
            cfg=cfg, npc_controller=npc, map_grids=cfg_map.grids())
        sim.renderer.res = Resolution(self.cfg.res, self.cfg.res)
        sim.renderer.scale = 2.0 / self.cfg.fov
        if self.cfg.use_background_texture:
            sim.renderer.background_texture = load_or_bake_texture(
                cfg_map, sim.renderer.color_map, sim.renderer.rendering_levels)
        return sim

    def step(self, action):
        # the ego is the single exposed agent
        assert self.sim is not None, "call reset() first"
        self.prev_action = jnp.asarray(action)
        self.sim.step(jnp.asarray(action).reshape(1, 1, 2))
        self.t += 1
        info = {'offroad': float(self.sim.compute_offroad()[0, 0]),
                'collision': float(self.sim.compute_collision()[0, 0]),
                'wrong_way': float(self.sim.compute_wrong_way()[0, 0]),
                'speed': float(self.sim.get_state()[0, 0, 3])}
        reward = self.get_reward(info)
        terminated = info['collision'] > 0
        truncated = self.t >= self.cfg.max_steps
        return self._observe(), reward, terminated, truncated, info

    def get_reward(self, info) -> float:
        """Reference IAIGymEnv reward (`examples/gym_env.py:209-218`):
        speed bonus minus offroad/collision/action-economy penalties,
        clamped to [-10, 10]."""
        r = (info['speed'] - info['offroad'] - info['collision']
             - float(jnp.linalg.norm(self.prev_action)))
        return float(np.clip(r, -10.0, 10.0))


class SingleAgentWrapper:
    """
    Removes the batch and agent dimensions from the environment interface
    (ref: `examples/gym_env.py:221-264`). Only safe when both are
    singletons. Duck-type compatible with gymnasium's Wrapper.
    """
    def __init__(self, env):
        self.env = env

    @staticmethod
    def _squeeze(x):
        """Drop the leading singleton batch and agent dims, matching the
        reference's ``transform_out`` = ``squeeze(0).squeeze(0)``
        (`examples/gym_env.py:240-247`): torch's squeeze(0) is a no-op on
        non-singleton dims, so only size-1 leading axes are removed."""
        if isinstance(x, dict):
            return {k: SingleAgentWrapper._squeeze(v) for k, v in x.items()}
        if isinstance(x, (np.ndarray, jnp.ndarray)):
            for _ in range(2):
                if x.ndim > 0 and x.shape[0] == 1:
                    x = x[0]
        return x

    def reset(self, seed: Optional[int] = None):
        obs, info = self.env.reset(seed)
        return self._squeeze(obs), self._squeeze(info)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(
            np.asarray(action).reshape(-1)[:2])
        return (self._squeeze(obs), float(reward), bool(terminated),
                bool(truncated), self._squeeze(info))

    def render(self, *args, **kwargs):
        return self.env.render(*args, **kwargs)

    def close(self):
        self.env.close()


class VectorizedGymEnv:
    """
    B environments as one batched simulator with a fully on-device, jittable
    transition: ``step_fn(state, action) -> (state, obs, reward, done)``.
    This is the shape the PPO example trains against
    (`examples/rl_example.py` spec: 1024 vectorized envs on-device).
    """
    def __init__(self, cfg: GymEnvConfig = GymEnvConfig(), batch_size: int = 16):
        self.cfg = cfg
        self.batch_size = batch_size
        base = GymEnv(cfg)._build_sim()
        self.sim = base.extend(batch_size, in_place=False)
        self.initial_state = self.sim.state
        self._step_fn = None

    def make_step_fn(self):
        """Pure transition closed over the simulator parameters."""
        sim = self.sim
        cfg = self.cfg
        res = cfg.res
        from torchdrivesim_tpu.map_grids import (
            offroad_loss_from_grid, wrong_way_loss_from_grid)
        from torchdrivesim_tpu.infractions import compute_collision_matrix
        from torchdrivesim_tpu.rendering.base import Cameras

        gen = sim.birdview_mesh_generator
        renderer = sim.renderer
        b = self.batch_size
        a = sim.agent_count
        sizes = sim.get_all_agent_size()

        def step_fn(state, ego_action):
            action = jnp.zeros((b, a, 2)).at[:, 0].set(ego_action)
            state = sim.functional_step(state, action)
            all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
            present = jnp.concatenate(
                [state.present_mask, state.npc_present_mask], -1)
            mesh = gen.generate(
                1, agent_state=all_state[:, None], present_mask=present[:, None],
                include_background=renderer.background_texture is None)
            ego = state.agent_state[:, 0]
            cam_xy = ego[:, :2]
            cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
            obs = renderer.render_rgb_mesh_chw(
                mesh, Resolution(res, res), Cameras(cam_xy, cam_sc,
                                                    2.0 / cfg.fov))
            boxes = jnp.concatenate(
                [all_state[..., :2], sizes, all_state[..., 2:3]], -1)
            collision = compute_collision_matrix(boxes, present)[:, 0]
            offroad = offroad_loss_from_grid(
                sim.map_grids, state.agent_state, sim.agent_size)[:, 0] \
                if sim.map_grids is not None else jnp.zeros(b)
            wrong_way = wrong_way_loss_from_grid(
                sim.map_grids, state.agent_state)[:, 0] \
                if sim.map_grids is not None else jnp.zeros(b)
            speed = state.agent_state[:, 0, 3]
            reward = (cfg.speed_reward * speed
                      - cfg.offroad_penalty * offroad
                      - cfg.collision_penalty * collision
                      - cfg.wrong_way_penalty * wrong_way)
            done = collision > 0
            return state, obs, reward, done

        return step_fn


def main(argv=None):
    """Run a short episode (ref main loop: `examples/gym_env.py:268-296`),
    with graceful SIGTERM shutdown (`examples/gym_env.py:270-273`)."""
    import argparse
    import contextlib
    import signal

    parser = argparse.ArgumentParser()
    parser.add_argument('--map', default='carla_Town02')
    parser.add_argument('--agents', type=int, default=6)
    parser.add_argument('--steps', type=int, default=20)
    parser.add_argument('--res', type=int, default=64)
    parser.add_argument('--iai', action='store_true',
                        help='drive NPCs with the Inverted AI API '
                             '(needs the invertedai package + IAI_API_KEY)')
    args = parser.parse_args(argv)

    def sigterm_handler(signum, frame):
        raise InterruptedError("SIGTERM received")

    signal.signal(signal.SIGTERM, sigterm_handler)

    cfg = GymEnvConfig(map_name=args.map, agent_count=args.agents,
                       res=args.res)
    env_cls = IAIGymEnv if args.iai else GymEnv
    with contextlib.closing(SingleAgentWrapper(env_cls(cfg))) as env:
        for episode in range(2):
            env.reset()
            action = np.asarray([1.0, 0.0], np.float32)  # accelerate straight
            for i in range(args.steps):
                obs, reward, terminated, truncated, info = env.step(action)
                if info['collision']:
                    print("collision")
                if info['offroad']:
                    print("offroad")
                if terminated or truncated:
                    break
            print(f"episode {episode}: {i + 1} steps, last reward {reward:.2f}")


if __name__ == '__main__':
    main()
