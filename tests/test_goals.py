import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.goals import (
    WaypointGoal, gather_current, init_waypoint_state, step_waypoints,
)


def _setup():
    # B=1, A=2, N=3 collections, M=2 waypoints each
    waypoints = jnp.asarray([[
        [[[0., 0.], [1., 0.]], [[5., 0.], [6., 0.]], [[9., 0.], [10., 0.]]],
        [[[0., 5.], [0., 6.]], [[0., 9.], [0., 0.]], [[0., 0.], [0., 0.]]],
    ]])
    mask = jnp.asarray([[
        [[True, True], [True, True], [True, True]],
        [[True, True], [True, False], [False, False]],
    ]])
    return waypoints, mask


def test_gather_current_initial():
    wps, mask = _setup()
    st = init_waypoint_state(wps, mask)
    w, m = gather_current(wps, st)
    assert w.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(w[0, 0]), [[0., 0.], [1., 0.]])
    assert np.asarray(m).all()


def test_gather_multiple_collections():
    wps, mask = _setup()
    st = init_waypoint_state(wps, mask)
    w, m = gather_current(wps, st, count=2)
    assert w.shape == (1, 2, 4, 2)
    # agent 1 collection 1 has one padded waypoint
    assert np.asarray(m)[0, 1].tolist() == [True, True, True, False]
    # advancing to the last collection: count=2 overruns -> masked out
    st2 = st.replace(state=jnp.full_like(st.state, 2))
    w2, m2 = gather_current(wps, st2, count=2)
    assert np.asarray(m2)[0, 0].tolist() == [True, True, False, False]
    np.testing.assert_allclose(np.asarray(w2)[0, 0, 2:], 0.0)


def test_step_advances_on_arrival():
    wps, mask = _setup()
    st = init_waypoint_state(wps, mask)
    # agent 0 at the first waypoint; agent 1 far from anything
    agents = jnp.asarray([[[0., 0., 0., 0.], [50., 50., 0., 0.]]])
    st1 = step_waypoints(wps, st, agents, threshold=2.0)
    assert np.asarray(st1.state)[0, :, 0].tolist() == [1, 0]
    # the achieved collection's mask is cleared
    assert not np.asarray(st1.mask)[0, 0, 0].any()
    assert np.asarray(st1.mask)[0, 0, 1].all()
    # padding never reactivates
    assert not np.asarray(st1.mask)[0, 1, 1, 1]


def test_state_clamps_at_last_collection():
    wps, mask = _setup()
    st = init_waypoint_state(wps, mask).replace(state=jnp.full((1, 2, 1), 2))
    agents = jnp.asarray([[[9., 0., 0., 0.], [0., 0., 0., 0.]]])
    st1 = step_waypoints(wps, st, agents, threshold=2.0)
    assert np.asarray(st1.state).max() == 2


def test_step_is_jittable():
    wps, mask = _setup()
    st = init_waypoint_state(wps, mask)
    agents = jnp.asarray([[[0., 0., 0., 0.], [50., 50., 0., 0.]]])
    f = jax.jit(lambda s, a: step_waypoints(wps, s, a))
    st1 = f(st, agents)
    assert np.asarray(st1.state)[0, 0, 0] == 1


def test_waypoint_goal_facade():
    wps, mask = _setup()
    goal = WaypointGoal(wps, mask)
    assert goal.get_waypoints().shape == (1, 2, 2, 2)
    goal.step(jnp.asarray([[[0., 0., 0., 0.], [50., 50., 0., 0.]]]))
    assert np.asarray(goal.state)[0, :, 0].tolist() == [1, 0]
    g2 = goal.extend(2, in_place=False)
    assert g2.waypoints.shape[0] == 2
    g3 = g2.select_batch_elements(jnp.asarray([1]), in_place=False)
    assert g3.waypoints.shape[0] == 1
    c = goal.copy()
    assert np.asarray(c.state).tolist() == np.asarray(goal.state).tolist()
