import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.validation import (
    check_finite_state, checked, validate_state_shapes,
)


def test_checked_catches_nan():
    from tests.test_simulator import _build_simulator
    sim = _build_simulator()

    def step_with_guard(state, action):
        state = sim.functional_step(state, action)
        check_finite_state(state)
        return state

    guarded = checked(step_with_guard)
    out = guarded(sim.state, jnp.zeros((2, 2, 2)))
    assert np.all(np.isfinite(np.asarray(out.agent_state)))

    bad_action = jnp.full((2, 2, 2), jnp.nan)
    with pytest.raises(Exception):
        guarded(sim.state, bad_action)


def test_validate_state_shapes():
    from tests.test_simulator import _build_simulator
    sim = _build_simulator()
    validate_state_shapes(sim.state, agent_count=2, batch_size=2)
    with pytest.raises(AssertionError):
        validate_state_shapes(sim.state, agent_count=3, batch_size=2)
