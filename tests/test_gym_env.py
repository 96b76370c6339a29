"""
Gym environment surface tests (reference: `examples/gym_env.py`), including
the IAI-driven env run against a MOCK invertedai client (the real API is a
network service; the reference's own tests mock it the same way).
"""
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples'))


class _Point:
    def __init__(self, x, y):
        self.x, self.y = x, y


class _AgentState:
    def __init__(self, center, orientation, speed):
        self.center, self.orientation, self.speed = center, orientation, speed


class _AgentAttributes:
    def __init__(self, length, width, rear_axis_offset):
        self.length, self.width = length, width
        self.rear_axis_offset = rear_axis_offset


def _mock_invertedai(n_agents=4, drift=0.5):
    """A stub invertedai module: INITIALIZE spawns a line of cars near the
    Town02 center; DRIVE advances every car forward by `drift` meters."""
    mod = types.ModuleType('invertedai_mock')
    mod.common = types.SimpleNamespace(
        Point=_Point, AgentState=_AgentState, AgentAttributes=_AgentAttributes)

    class _Err(Exception):
        pass

    mod.error = types.SimpleNamespace(InvertedAIError=_Err)

    def initialize(location, agent_count, location_of_interest=(0, 0),
                   traffic_light_state_history=None):
        cx, cy = location_of_interest
        resp = types.SimpleNamespace()
        resp.agent_attributes = [
            _AgentAttributes(4.6, 2.0, 1.4) for _ in range(agent_count)]
        resp.agent_states = [
            _AgentState(_Point(cx + 8.0 * i, cy), 0.0, 2.0)
            for i in range(agent_count)]
        resp.recurrent_states = ['rs0'] * agent_count
        return resp

    def drive(location, agent_states, agent_attributes, recurrent_states,
              traffic_lights_states=None):
        resp = types.SimpleNamespace()
        resp.agent_states = [
            _AgentState(_Point(s.center.x + drift, s.center.y),
                        s.orientation, s.speed) for s in agent_states]
        resp.recurrent_states = ['rs1'] * len(agent_states)
        return resp

    mod.api = types.SimpleNamespace(initialize=initialize, drive=drive)
    mod.large_drive = drive
    return mod


@pytest.fixture
def mock_iai(monkeypatch):
    import torchdrivesim_tpu.behavior.iai as iai
    mod = _mock_invertedai()
    monkeypatch.setattr(iai, 'invertedai', mod)
    monkeypatch.setattr(iai, 'is_available', True)
    return mod


def test_gym_env_episode():
    from gym_env import GymEnv, GymEnvConfig
    env = GymEnv(GymEnvConfig(agent_count=4, res=64, max_steps=3))
    obs, info = env.reset()
    assert obs.shape == (3, 64, 64)
    for _ in range(3):
        obs, reward, terminated, truncated, info = env.step(
            np.asarray([0.5, 0.0]))
    assert truncated and np.isfinite(reward)
    assert {'offroad', 'collision', 'wrong_way', 'speed'} <= set(info)
    env.close()


def test_iai_gym_env_with_mock_client(mock_iai):
    """IAIGymEnv builds from the mock INITIALIZE response and its NPCs move
    by the mock DRIVE predictions each step (ref: gym_env.py:153-219)."""
    from gym_env import IAIGymEnv, GymEnvConfig
    env = IAIGymEnv(GymEnvConfig(agent_count=4, res=64,
                                 use_background_texture=False))
    obs, _ = env.reset()
    assert obs.shape == (3, 64, 64)
    npcs_before = np.asarray(env.sim.state.npc_state).copy()
    obs, reward, terminated, truncated, info = env.step(
        np.asarray([0.2, 0.0]))
    npcs_after = np.asarray(env.sim.state.npc_state)
    # mock DRIVE moves every NPC +0.5 m in x
    np.testing.assert_allclose(npcs_after[0, :, 0] - npcs_before[0, :, 0],
                               0.5, atol=1e-5)
    np.testing.assert_allclose(npcs_after[0, :, 1], npcs_before[0, :, 1],
                               atol=1e-5)
    assert np.isfinite(reward)
    env.close()


def test_single_agent_wrapper(mock_iai):
    from gym_env import IAIGymEnv, GymEnvConfig, SingleAgentWrapper
    env = SingleAgentWrapper(IAIGymEnv(GymEnvConfig(
        agent_count=3, res=64, use_background_texture=False)))
    obs, info = env.reset()
    assert obs.shape == (3, 64, 64)
    obs, reward, terminated, truncated, info = env.step([1.0, 0.0])
    assert isinstance(reward, float)
    assert isinstance(terminated, bool) and isinstance(truncated, bool)
    assert isinstance(info['speed'], float)
    env.close()


def test_main_handles_sigterm():
    """The example main installs a SIGTERM handler that raises for a
    graceful shutdown (ref: gym_env.py:270-273)."""
    import signal
    import gym_env as ge

    calls = {}
    orig = signal.signal

    def capture(sig, handler):
        calls[sig] = handler
        return orig(sig, signal.SIG_DFL) if sig == signal.SIGTERM else \
            orig(sig, handler)

    old = signal.getsignal(signal.SIGTERM)
    try:
        signal.signal = capture
        # run a zero-step episode so main returns quickly
        ge.main(['--agents', '3', '--steps', '1', '--res', '64'])
    finally:
        signal.signal = orig
        orig(signal.SIGTERM, old)
    handler = calls.get(signal.SIGTERM)
    assert handler is not None, "main() must install a SIGTERM handler"
    with pytest.raises(InterruptedError):
        handler(signal.SIGTERM, None)


def test_single_agent_wrapper_squeezes_singleton_dims():
    """`_squeeze` matches the reference's transform_out =
    squeeze(0).squeeze(0) (`examples/gym_env.py:240-247`): leading
    singleton batch/agent dims are removed, others untouched."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'examples'))
    from gym_env import SingleAgentWrapper
    sq = SingleAgentWrapper._squeeze
    assert sq(np.zeros((1, 1, 3, 4))).shape == (3, 4)
    assert sq(np.zeros((1, 3, 4))).shape == (3, 4)
    assert sq(np.zeros((3, 64, 64))).shape == (3, 64, 64)   # CxHxW untouched
    assert sq({'a': np.zeros((1, 1, 2))})['a'].shape == (2,)
    assert sq(5) == 5
