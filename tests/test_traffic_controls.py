import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.traffic_controls import (
    BaseTrafficControl, StopSignControl, TrafficLightControl, YieldControl,
    replay_or_hold_state,
)


def _make_light(replay=None):
    pos = jnp.asarray([[[0., 0., 4., 1., 0.],     # stopline at origin, along x
                        [50., 50., 4., 1., 0.]]])
    return TrafficLightControl(pos, replay_states=replay)


def test_default_states_and_mask():
    tc = _make_light()
    assert tc.allowed_states == ['red', 'yellow', 'green']
    np.testing.assert_array_equal(np.asarray(tc.state), [[0, 0]])
    assert tc.corners.shape == (1, 2, 4, 2)


def test_masked_corners_far_away():
    pos = jnp.asarray([[[0., 0., 4., 1., 0.], [5., 5., 4., 1., 0.]]])
    mask = jnp.asarray([[True, False]])
    tc = TrafficLightControl(pos, mask=mask)
    assert float(jnp.max(jnp.abs(tc.corners[0, 1]))) >= 900


def test_replay_then_hold():
    replay = jnp.asarray([[[0, 1, 2], [2, 1, 0]]])  # BxNxT with T=3
    tc = _make_light(replay=replay)
    np.testing.assert_array_equal(np.asarray(tc.state), [[0, 2]])
    tc.step(1)
    np.testing.assert_array_equal(np.asarray(tc.state), [[1, 1]])
    tc.step(2)
    np.testing.assert_array_equal(np.asarray(tc.state), [[2, 0]])
    tc.step(3)  # past replay horizon: hold
    np.testing.assert_array_equal(np.asarray(tc.state), [[2, 0]])


def test_replay_is_jittable_with_traced_time():
    replay = jnp.asarray([[[0, 1, 2]]])
    state = jnp.asarray([[0]])
    f = jax.jit(lambda s, t: replay_or_hold_state(s, replay, t))
    assert int(f(state, 1)[0, 0]) == 1
    assert int(f(state, 5)[0, 0]) == 0  # holds input state


def test_red_light_violation():
    tc = _make_light()
    # agent sitting on the first stopline, facing +x
    agents = jnp.asarray([[[0., 0., 4., 2., 0.],      # on the line
                           [20., 0., 4., 2., 0.]]])   # far away
    tc.set_state(jnp.asarray([[0, 0]]))  # red
    v = np.asarray(tc.compute_violation(agents))
    assert v.tolist() == [[True, False]]
    tc.set_state(jnp.asarray([[2, 2]]))  # green
    v = np.asarray(tc.compute_violation(agents))
    assert v.tolist() == [[False, False]]


def test_rear_factor_semantics():
    tc = _make_light()
    tc.set_state(jnp.asarray([[0, 0]]))
    # agent whose rear 10% does NOT reach the stopline: front bumper barely
    # crosses -> rear portion is behind, so no violation yet
    agents = jnp.asarray([[[-2.5, 0., 4., 2., 0.]]])
    assert not bool(tc.compute_violation(agents)[0, 0])
    # agent fully on the stopline: violation
    agents2 = jnp.asarray([[[0., 0., 4., 2., 0.]]])
    assert bool(tc.compute_violation(agents2)[0, 0])


def test_extend_select_copy():
    tc = _make_light()
    tc2 = tc.extend(3, in_place=False)
    assert tc2.pos.shape == (3, 2, 5)
    tc3 = tc2.select_batch_elements(jnp.asarray([2, 0]), in_place=False)
    assert tc3.pos.shape == (2, 2, 5)
    c = tc.copy()
    assert c.allowed_states == tc.allowed_states
    assert c.pos.shape == tc.pos.shape


def test_base_and_sign_controls_report_no_violation():
    pos = jnp.asarray([[[0., 0., 4., 1., 0.]]])
    agents = jnp.asarray([[[0., 0., 4., 2., 0.]]])
    for cls in (BaseTrafficControl, YieldControl, StopSignControl):
        tc = cls(pos)
        assert not bool(tc.compute_violation(agents)[0, 0])


def test_custom_compute_state_same_in_step_and_functional_step():
    """VERDICT r1 item 7: a subclass overriding the pure compute_state hook
    must behave identically through the mutating facade (control.step /
    Simulator.step) and inside the jitted functional_step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchdrivesim_tpu.traffic_controls import BaseTrafficControl

    class BlinkerControl(BaseTrafficControl):
        """Alternates state every tick (ignores replay)."""
        @classmethod
        def _default_allowed_states(cls):
            return ['off', 'on']

        def compute_state(self, state, time):
            return jnp.broadcast_to(
                (jnp.asarray(time) % 2).astype(state.dtype), state.shape)

    pos = jnp.zeros((2, 3, 5))
    a = BlinkerControl(pos)
    b = BlinkerControl(pos)

    # facade path
    facade_states = []
    for t in range(1, 6):
        a.step(t)
        facade_states.append(np.asarray(a.state))

    # pure/jit path (what Simulator.functional_step does)
    advance = jax.jit(lambda s, t: b.advance(s, t))
    s = b.state
    for t in range(1, 6):
        s = advance(s, jnp.asarray(t))
        np.testing.assert_array_equal(np.asarray(s), facade_states[t - 1])


def test_replay_beats_compute_state():
    """Replay horizon overrides the subclass hook (ref semantics:
    traffic_controls.py:127-136 replay-first)."""
    import jax.numpy as jnp
    import numpy as np
    from torchdrivesim_tpu.traffic_controls import TrafficLightControl

    pos = jnp.zeros((1, 2, 5))
    replay = jnp.full((1, 2, 4), 2, jnp.int32)
    c = TrafficLightControl(pos, replay_states=replay)
    s = c.state
    s = c.advance(s, 1)
    np.testing.assert_array_equal(np.asarray(s), 2)
    s = c.advance(s, 10)  # past the horizon: hold
    np.testing.assert_array_equal(np.asarray(s), 2)
