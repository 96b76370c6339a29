import os

import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.checkpoint import (
    restore_checkpoint, restore_simulator, save_checkpoint, save_simulator,
)


def test_pytree_roundtrip(tmp_path):
    tree = {'a': jnp.arange(12).reshape(3, 4), 'b': {'c': jnp.ones(5)},
            'scalar': jnp.asarray(3)}
    p = os.path.join(tmp_path, 'ckpt')
    save_checkpoint(p, tree)
    restored = restore_checkpoint(p, tree)
    np.testing.assert_array_equal(np.asarray(restored['a']), np.asarray(tree['a']))
    np.testing.assert_array_equal(np.asarray(restored['b']['c']),
                                  np.asarray(tree['b']['c']))


def test_simulator_state_roundtrip(tmp_path):
    from tests.test_simulator import _build_simulator
    sim = _build_simulator()
    for _ in range(3):
        sim.step(jnp.zeros((2, 2, 2)))
    p = os.path.join(tmp_path, 'sim_ckpt')
    save_simulator(p, sim)
    want = np.asarray(sim.get_state())
    want_time = sim.internal_time
    # keep stepping, then restore
    for _ in range(4):
        sim.step(jnp.zeros((2, 2, 2)))
    assert sim.internal_time == want_time + 4
    restore_simulator(p, sim)
    np.testing.assert_allclose(np.asarray(sim.get_state()), want)
    assert sim.internal_time == want_time
    # simulation continues cleanly from the restored state
    sim.step(jnp.zeros((2, 2, 2)))
    assert sim.internal_time == want_time + 1
