import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdrivesim_tpu.kinematic as K


def _state(*rows):
    return jnp.asarray(rows, dtype=jnp.float32)[None]  # add batch dim


def test_teleport():
    m = K.TeleportingKinematicModel()
    m.set_state(_state([0, 0, 0, 0]))
    m.step(_state([1, 2, 3, 4]))
    np.testing.assert_allclose(np.asarray(m.get_state()), [[[1, 2, 3, 4]]])


def test_simple_step_and_fit_roundtrip():
    m = K.SimpleKinematicModel(dt=0.1)
    s0 = _state([1.0, 2.0, 0.5, 3.0])
    s1 = _state([1.5, 2.5, 0.7, 3.5])
    m.set_state(s0)
    action = m.fit_action(s1)
    m.step(action)
    np.testing.assert_allclose(np.asarray(m.get_state()), np.asarray(s1), atol=1e-5)


def test_oriented_roundtrip():
    m = K.OrientedKinematicModel(dt=0.1)
    s0 = _state([1.0, 2.0, 1.2, 3.0])
    s1 = _state([0.4, 2.5, 1.0, 3.5])
    m.set_state(s0)
    action = m.fit_action(s1)
    m.step(action)
    np.testing.assert_allclose(np.asarray(m.get_state()), np.asarray(s1), atol=1e-5)


def test_bicycle_step_matches_reference_math():
    # Hand-computed bicycle update per `kinematic.py:462-477` of the reference
    dt, lr = 0.1, 1.5
    m = K.KinematicBicycle(dt=dt)
    m.set_params(lr=jnp.full((1, 1), lr))
    x, y, psi, v = 1.0, -2.0, 0.3, 4.0
    m.set_state(_state([x, y, psi, v]))
    a_raw, beta_raw = 2.0, 0.2
    action = m.normalize_action(jnp.asarray([[[a_raw, beta_raw]]]))
    m.step(action)
    v1 = v + a_raw * dt
    x1 = x + v1 * np.cos(psi + beta_raw) * dt
    y1 = y + v1 * np.sin(psi + beta_raw) * dt
    psi1 = psi + (v1 / lr) * np.sin(beta_raw) * dt
    np.testing.assert_allclose(
        np.asarray(m.get_state())[0, 0], [x1, y1, psi1, v1], rtol=1e-6)


def test_bicycle_fit_action_roundtrip():
    dt = 0.1
    m = K.KinematicBicycle(dt=dt)
    m.set_params(lr=jnp.full((1, 1), 1.2))
    s0 = _state([0.0, 0.0, 0.2, 5.0])
    m.set_state(s0)
    action = m.normalize_action(jnp.asarray([[[1.0, 0.1]]]))
    m.step(action)
    s1 = m.get_state()
    # fit_action from s0 should recover an action that reproduces s1 x,y
    m2 = K.KinematicBicycle(dt=dt)
    m2.set_params(lr=jnp.full((1, 1), 1.2))
    m2.set_state(s0)
    fitted = m2.fit_action(s1)
    m2.step(fitted)
    np.testing.assert_allclose(
        np.asarray(m2.get_state())[..., :2], np.asarray(s1)[..., :2], atol=1e-4)


def test_bicycle_fit_action_reversing():
    dt = 0.1
    m = K.KinematicBicycle(dt=dt)
    m.set_params(lr=jnp.full((1, 1), 1.0))
    # target directly behind the agent -> reversing, v negative
    s0 = _state([0.0, 0.0, 0.0, 0.0])
    s1 = _state([-1.0, 0.0, 0.0, 0.0])
    m.set_state(s0)
    action = np.asarray(m.fit_action(s1))
    denorm = np.asarray(m.denormalize_action(jnp.asarray(action)))
    a, beta = denorm[0, 0]
    assert a < 0          # decelerating into reverse
    assert abs(beta) < 1e-4  # steering straight


def test_bicycle_no_reversing_stops():
    dt = 0.1
    m = K.BicycleNoReversing(dt=dt)
    m.set_params(lr=jnp.full((1, 1), 1.0))
    m.set_state(_state([0.0, 0.0, 0.0, 0.2]))
    # hard braking that would reverse
    action = m.normalize_action(jnp.asarray([[[-5.0, 0.0]]]))
    m.step(action)
    assert abs(float(m.get_state()[0, 0, 3])) < 1e-6


def test_bicycle_by_displacement():
    dt = 0.1
    m = K.BicycleByDisplacement(dt=dt)
    m.set_params(lr=jnp.full((1, 1), 1.0))
    m.set_state(_state([0.0, 0.0, 0.0, 0.0]))
    # move straight ahead 1 m in one step: velocity (10, 0)
    action = jnp.asarray([[[10.0 / 20.0, 0.0]]])  # normalized by max_dx=20
    m.step(action)
    s = np.asarray(m.get_state())[0, 0]
    np.testing.assert_allclose(s[0], 1.0, atol=1e-4)
    np.testing.assert_allclose(s[1], 0.0, atol=1e-4)


def test_step_from_xy_matches_step():
    """`step_from_xy` (ref: `kinematic.py:550-558,577-580`) is `step` with the
    action sliced to its first two channels, for both displacement models."""
    dt = 0.1
    for cls in (K.BicycleByDisplacement, K.BicycleByOrientedDisplacement):
        a = cls(dt=dt)
        b = cls(dt=dt)
        for m in (a, b):
            m.set_params(lr=jnp.full((1, 1), 1.0))
            m.set_state(_state([0.0, 0.0, 0.5, 1.0]))
        action = jnp.asarray([[[0.3, -0.2]]])
        a.step(action)
        b.step_from_xy(action)
        np.testing.assert_allclose(np.asarray(a.get_state()),
                                   np.asarray(b.get_state()), atol=1e-6)


def test_compound_dispatch_matches_individual():
    dt = 0.1
    B, A = 2, 3
    rng = np.random.RandomState(1)
    state = jnp.asarray(rng.randn(B, A, 4).astype(np.float32))
    action = jnp.asarray(rng.uniform(-0.5, 0.5, (B, A, 4)).astype(np.float32))
    lr = jnp.asarray(rng.uniform(1.0, 2.0, (B, A)).astype(np.float32))
    params = K.KinematicParams(lr=lr, dt=dt)
    ids = jnp.asarray([[K.BICYCLE, K.SIMPLE, K.BICYCLE],
                       [K.SIMPLE, K.BICYCLE, K.SIMPLE]])
    out = K.step(state, action, params, model_ids=ids)
    bike = K.step(state, action, params, single_model=K.BICYCLE)
    simple = K.step(state, action, params, single_model=K.SIMPLE)
    expected = jnp.where((ids == K.BICYCLE)[..., None], bike, simple)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_step_is_jittable_and_differentiable():
    params = K.KinematicParams(lr=jnp.ones((1, 2)), dt=0.1)
    state = jnp.asarray([[[0., 0., 0., 1.], [1., 1., 0.5, 2.]]])
    action = jnp.asarray([[[0.2, 0.1], [0.1, -0.1]]])

    @jax.jit
    def rollout(state, action):
        def body(s, _):
            s = K.step(s, action, params, single_model=K.BICYCLE)
            return s, s
        final, traj = jax.lax.scan(body, state, None, length=10)
        return jnp.sum(final[..., :2] ** 2)

    g = jax.grad(rollout, argnums=1)(state, action)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one action component
    eps = 1e-3
    a_p = action.at[0, 0, 0].add(eps)
    a_m = action.at[0, 0, 0].add(-eps)
    fd = (rollout(state, a_p) - rollout(state, a_m)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0]), float(fd), rtol=2e-2)


def test_extend_and_select():
    m = K.KinematicBicycle()
    m.set_params(lr=jnp.asarray([[1.0], [2.0]]))
    m.set_state(jnp.asarray([[[0., 0., 0., 1.]], [[1., 1., 1., 1.]]]))
    m.extend(2)
    assert m.get_state().shape == (4, 1, 4)
    # extend repeats contiguously: [a, a, b, b]
    np.testing.assert_allclose(np.asarray(m.params.lr)[:, 0], [1., 1., 2., 2.])
    m.select_batch_elements(jnp.asarray([3, 0]))
    np.testing.assert_allclose(np.asarray(m.params.lr)[:, 0], [2., 1.])


def test_nan_lr_does_not_poison_selected_gradients():
    """Compound dispatch evaluates EVERY model on every agent; a pedestrian's
    NaN lr (ref: `behavior/iai.py:113`) flows through the bicycle branch, and
    without the lr sanitization in `_bicycle_core` the NaN would poison the
    other branch's gradients through jnp.where (a real bug caught by map-scale
    probing)."""
    dt = 0.1
    lr = jnp.asarray([[1.5, jnp.nan]])      # agent 1 is a pedestrian
    params = K.KinematicParams(lr=lr, dt=dt)
    ids = jnp.asarray([[K.BICYCLE, K.SIMPLE]])
    state = jnp.asarray([[[0., 0., 0., 2.], [5., 5., 1., 1.]]])

    def loss(action):
        out = K.step(state, action, params, model_ids=ids)
        return jnp.sum(out ** 2)

    action = jnp.asarray([[[0.2, 0.1, 0., 0.], [0.1, -0.1, 0.05, 0.02]]])
    g = jax.grad(loss)(action)
    assert np.isfinite(np.asarray(g)).all(), np.asarray(g)
    out = K.step(state, action, params, model_ids=ids)
    assert np.isfinite(np.asarray(out)).all()


def test_step_with_zero_agents():
    """A=0 must trace and run (degenerate scenes appear when batching maps
    with no NPCs)."""
    state = jnp.zeros((2, 0, 4))
    action = jnp.zeros((2, 0, 2))
    params = K.KinematicParams(lr=jnp.ones((2, 0)), dt=0.1)
    out = K.step(state, action, params, single_model=K.BICYCLE)
    assert out.shape == (2, 0, 4)
    out2 = K.step(state, jnp.zeros((2, 0, 4)), params,
                  model_ids=jnp.zeros((2, 0), jnp.int32))
    assert out2.shape == (2, 0, 4)


def test_set_params_rejects_unknown_names():
    """Unknown parameter names raise instead of being silently dropped
    (hardening over the reference's silent `pass`, ref `kinematic.py:99`)."""
    base = K.KinematicModel()
    with pytest.raises(ValueError, match='unknown_param'):
        base.set_params(unknown_param=1.0)
    assert base.get_params() == {}

    bike = K.KinematicBicycle()
    with pytest.raises(ValueError, match='not_a_param'):
        bike.set_params(lr=jnp.ones((1, 1)), not_a_param=2.0)
    bike.set_params(lr=jnp.full((1, 1), 1.3))   # known param still works
    np.testing.assert_allclose(np.asarray(bike.get_params()['lr']), 1.3)

    compound = K.CompoundKinematicModel(
        model_assignments=jnp.asarray([[K.BICYCLE, K.SIMPLE]]))
    with pytest.raises(ValueError):
        compound.set_params(bogus=3.0)
    compound.set_params(lr=jnp.asarray([[1.5, 2.5]]))
    np.testing.assert_allclose(np.asarray(compound.get_params()['lr']),
                               [[1.5, 2.5]])
